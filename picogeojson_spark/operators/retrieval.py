"""Corpus retrieval ranking: BM25 top-k search over the documents table.

The missing piece between the term-frequency analytics (``textstats.top_terms``)
and the embedding ANN family (``similarity``): lexical ranked retrieval, the
standard first stage of a data-curation search/inspection stack (and of
retrieval-augmented pipelines).

Scale shape: the query term list is tiny and becomes an ``isin`` filter pushed
into the token explode, so the corpus-sized work is one narrow
explode+filter+aggregate per doc; document frequencies (``<= |terms|`` rows)
and the corpus-size scalar broadcast back onto the per-doc rows. No corpus
self-join, no window wider than the final global top-k
(``TakeOrderedAndProject``).

Determinism contract (hash-exact vs the DuckDB oracle): per-term partial
scores are floor-scaled to x1e6 integers BEFORE the per-doc sum, so the only
cross-engine float sensitivity is a single identically-associated scalar
expression over integer inputs (tf, df, dl, sum_dl, n_docs) — never a
float accumulation whose order could differ between engines.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._util import attach_scalar


def bm25_score_expr_sql(k1: float = 1.2, b: float = 0.75) -> str:
    """The per-term BM25 partial score as ONE SQL scalar expression over the
    integer columns ``(tf, df, dl, n_docs, sum_dl)`` — shared VERBATIM
    between the Spark operator and the DuckDB oracle so both engines
    evaluate byte-identical arithmetic. Compound constants (``k1+1``,
    ``1-b``) are pre-folded in Python: the engines' decimal-literal
    promotion rules never get to combine two inexact literals differently.
    """
    return (
        "CAST(floor("
        "ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)"
        " / (CAST(df AS DOUBLE) + 0.5))"
        " * ((CAST(tf AS DOUBLE) * {k1p1})"
        " / (CAST(tf AS DOUBLE) + {k1} * ({omb}"
        " + ({b} * CAST(dl AS DOUBLE))"
        " / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
        " * 1000000.0) AS BIGINT)"
    ).format(
        k1=repr(float(k1)),
        k1p1=repr(float(k1) + 1.0),
        b=repr(float(b)),
        omb=repr(1.0 - float(b)),
    )


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25
    (Robertson et al.; Lucene's non-negative ``ln(1 + (N-df+0.5)/(df+0.5))``
    idf variant).

    Tokenization matches ``textstats.top_terms`` exactly (lower, trim,
    whitespace split, drop empties) so retrieval and frequency analytics
    agree on what a term is.

    Output: ``(rank, doc_id, n_hit, score_x1e6)`` — rank by score desc with
    doc-id ascending tie-break; ``n_hit`` = how many query terms the doc
    contains; score is the x1e6 floor-scaled integer BM25 sum.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    term_list = sorted(set(t.lower() for t in terms))

    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("word"),
    ).filter(F.col("word") != "")

    # Per-doc length over ALL tokens (BM25's dl), plus the corpus scalars.
    dl = words.groupBy("doc_id").agg(F.count("*").alias("dl"))
    scalars = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )

    hits = words.filter(F.col("word").isin(term_list))
    tf = hits.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    return _bm25_rank_from_parts(tf, dl, scalars, k=k, k1=k1, b=b)


def _bm25_rank_from_parts(tf: DataFrame, dl: DataFrame, scalars: DataFrame,
                          k: int = 20, k1: float = 1.2,
                          b: float = 0.75) -> DataFrame:
    """Score + rank from the decomposed inputs — shared by the ad-hoc
    operator above and the persisted-index query path
    (``text_index.bm25_query_indexed``): ``tf`` = (doc_id, word, tf) for
    the query terms only, ``dl`` = (doc_id, dl), ``scalars`` = the 1-row
    (n_docs, sum_dl). Document frequencies derive from ``tf`` (one row
    per matching doc per term, so a plain count is the df)."""
    df_ = tf.groupBy("word").agg(F.count("*").alias("df"))

    # One identically-associated scalar expression over integer inputs;
    # floor-scale each per-term score to an integer BEFORE summing (see
    # module docstring). Mirrored verbatim in the SQL oracle.
    score_sql = (
        "CAST(floor("
        "ln(1.0d + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5d)"
        " / (CAST(df AS DOUBLE) + 0.5d))"
        " * ((CAST(tf AS DOUBLE) * ({k1} + 1.0d))"
        " / (CAST(tf AS DOUBLE) + {k1} * (1.0d - {b}"
        " + ({b} * CAST(dl AS DOUBLE))"
        " / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
        " * 1000000.0d) AS BIGINT)"
    ).format(k1=repr(float(k1)), b=repr(float(b)))

    scored = (
        attach_scalar(
            tf.join(F.broadcast(df_), "word").join(dl, "doc_id"), scalars)
        .withColumn("term_score_x1e6", F.expr(score_sql))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_hit"),
        F.sum("term_score_x1e6").alias("score_x1e6"),
    )
    from pyspark.sql import Window

    # Global top-k FIRST (TakeOrderedAndProject — per-partition partial
    # top-k, never a full-corpus single-task window), then rank the k
    # surviving rows with a trivially small window.
    topk = per_doc.orderBy(
        F.col("score_x1e6").desc(), F.col("doc_id").asc()
    ).limit(k)
    w = Window.orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "n_hit", "score_x1e6"
    )


def phrase_search(
    docs: DataFrame,
    phrase: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search over a positional index built on the fly:
    ``(doc_id, n_matches, first_pos)`` for every document containing the
    token sequence ``phrase`` contiguously (0-based token positions;
    overlapping matches count — "b b b" matches "b b" twice).

    Tokenization matches bm25_topk / top_terms (lower, trim, whitespace
    split, drop empties — empties dropped BEFORE positions are assigned,
    so positions index the token sequence, not the raw string).

    Plan: posexplode -> isin filter on the phrase's token set (pushed to
    the scan; the corpus never shuffles untokenized), then ONE
    groupBy(doc) building the per-offset position sets as collect_set
    arrays shifted by -k, intersected with array_intersect — a k-way
    positional merge with no self-joins at all (the classic SQL phrase
    query is k-1 positional self-joins; the set-intersection form does
    one shuffle regardless of phrase length).
    """
    phrase = [t.lower() for t in phrase]
    if not phrase or any(not t for t in phrase):
        raise ValueError("phrase_search needs non-empty tokens")

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                     lambda w: w != "")
        ).alias("pos", "word"),
    )
    hits = toks.filter(F.col("word").isin(sorted(set(phrase))))
    aggs = [
        F.collect_set(
            F.when(F.col("word") == F.lit(t), F.col("pos") - F.lit(k))
        ).alias("p{}".format(k))
        for k, t in enumerate(phrase)
    ]
    per_doc = hits.groupBy("doc_id").agg(*aggs)
    inter = F.col("p0")
    for k in range(1, len(phrase)):
        inter = F.array_intersect(inter, F.col("p{}".format(k)))
    return (
        per_doc.select("doc_id", inter.alias("m"))
        .filter(F.size("m") > 0)
        .select(
            "doc_id",
            F.size("m").cast("long").alias("n_matches"),
            F.array_min("m").cast("long").alias("first_pos"),
        )
    )


def tf_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Raw term-frequency top-``k`` — the boolean/tf baseline ranking
    (and the determinism-safe stand-in for a vector arm in hybrid-search
    fusion): rank by total query-term occurrences, doc-id tie-break.
    Same tokenizer as :func:`bm25_topk`.  Output: ``(rank, doc_id,
    tf_sum)``."""
    if not terms:
        raise ValueError("tf_topk needs at least one query term")
    term_list = sorted(set(t.lower() for t in terms))
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("word"),
    ).filter(F.col("word").isin(term_list))
    agg = words.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("tf_sum"))
    w = Window.orderBy(F.desc("tf_sum"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
        .select("rank", "doc_id", "tf_sum")
    )


def rrf_fuse(
    rankings,
    k_rrf: int = 60,
    top_k: int = 20,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — how hybrid search
    combines BM25 with a vector arm: each system contributes
    ``1e6 // (k_rrf + rank)`` ppm-points per doc (integer division, so
    both engines round identically); docs absent from a system get 0.

    ``rankings`` is ``[(name, df), ...]`` where each df carries
    ``id_col`` and ``rank_col``.  Output: ``(rank_fused, doc_id,
    rrf_ppm, rank_<name>...)`` top-``top_k`` by (score desc, doc_id).

    Scale shape: the inputs are top-k-sized by construction, so the
    (len-1) full-outer joins and the final sort are all on tiny tables —
    the corpus was already reduced by each arm's own plan."""
    if len(rankings) < 2:
        raise ValueError("rrf_fuse needs at least two rankings")
    parts = []
    for name, df in rankings:
        parts.append(df.select(
            F.col(id_col).alias("doc_id"),
            F.col(rank_col).cast("long").alias("rank_" + name)))
    out = parts[0]
    for p in parts[1:]:
        out = out.join(p, on="doc_id", how="full")
    score = None
    for name, _ in rankings:
        c = F.when(
            F.col("rank_" + name).isNotNull(),
            F.expr("div(1000000L, {} + rank_{})".format(int(k_rrf), name)),
        ).otherwise(F.lit(0)).cast("long")
        score = c if score is None else (score + c)
    w = Window.orderBy(F.desc("rrf_ppm"), F.asc("doc_id"))
    return (
        out.withColumn("rrf_ppm", score.cast("long"))
        .withColumn("rank_fused", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_fused") <= int(top_k))
        .select("rank_fused", "doc_id", "rrf_ppm",
                *["rank_" + name for name, _ in rankings])
    )
