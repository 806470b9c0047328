"""Text analysis operators: language-ID, quality scoring, token counting.

Everything is expression-level (no UDFs): substring-count arithmetic
``(len(text) - len(replace(text, marker, ''))) / len(marker)`` is portable
verbatim to the SQL oracle and stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._util import attach_scalar

# marker words per language (space-padded substring counts; matches the
# oracle's replace() arithmetic exactly)
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " les "],
    "es": [" el ", " que ", " los "],
    "pt": [" o ", " de ", " que "],
    "ja": ["の", "は", "を"],
}


def _count_sub(col, sub: str):
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(sub), F.lit(""))))
        / F.lit(len(sub))
    ).cast("long")


def token_count(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish proxy (words + digits + punct runs)."""
    t = F.trim(F.col(text_col))
    ws_tokens = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )
    subword = F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
        )
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws_tokens.cast("long").alias("ws_tokens"),
        subword.cast("long").alias("subword_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword heuristics (integer-exact outputs)."""
    col = F.col(text_col)
    n_chars = F.length(col).cast("long")
    n_space = _count_sub(col, " ")
    n_period = _count_sub(col, ".")
    n_comma = _count_sub(col, ",")
    n_stop = _count_sub(col, " the ") + _count_sub(col, " and ") + _count_sub(
        col, " of "
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_space.alias("n_spaces"),
        (n_period + n_comma).alias("n_punct"),
        n_stop.alias("n_stopwords"),
        # scaled integer ratio; explicit floor — double->int casts round in
        # DuckDB but truncate in Spark, so the floor keeps engines aligned
        F.when(n_chars > 0, F.floor((n_space * 1000000) / n_chars))
        .otherwise(F.lit(0)).cast("long").alias("space_ratio_x1e6"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Marker-word-vote language ID; argmax with fixed lang-order tie-break."""
    col = F.lower(F.col(text_col))
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    scores = []
    for lang, markers in LANG_MARKERS.items():
        s = None
        for m in markers:
            c = _count_sub(padded, m)
            s = c if s is None else s + c
        scores.append((lang, s))
    # argmax via greatest + chained when (first lang in dict order wins ties)
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("unknown")
    for lang, s in reversed(scores):
        pred = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(pred)
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        *[s.alias("score_{}".format(lang)) for lang, s in scores],
    )
    return out.withColumn("pred_lang", _pred_from_scores(out))


def _pred_from_scores(df_with_scores: DataFrame):
    langs = list(LANG_MARKERS.keys())
    best = F.greatest(*[F.col("score_{}".format(l)) for l in langs])
    pred = F.lit("unknown")
    for lang in reversed(langs):
        pred = F.when(
            (best > 0) & (F.col("score_{}".format(lang)) == best), F.lit(lang)
        ).otherwise(pred)
    return pred


def gopher_quality_flags(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         min_words: int = 5, max_words: int = 100000,
                         min_mean_word_len: int = 2, max_mean_word_len: int = 12,
                         max_dup_2gram_x1e6: int = 400000) -> DataFrame:
    """Gopher-style document quality filters (Rae et al. 2021 §A1.1 family):
    word-count bounds, mean word length bounds, duplicate-2-gram fraction —
    the standard pre-training corpus gates, as pure Spark expressions.

    All metrics are exact integers (counts, and x1e6 fractions via integer
    division), so the DuckDB oracle reproduces them bit-for-bit; the boolean
    ``keep`` column applies the thresholds. Whole-stage codegen end to end
    except the per-doc 2-gram array construction (transform over a sequence
    — one pass per document, not per pair).
    """
    t = F.trim(F.col(text_col))
    words = F.split(t, r"\s+")
    n_words = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(words))
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    # adjacent-pair 2-grams via zip_with(words, words[2:]) — NOT an indexed
    # transform: element_at(words, i) inside a lambda makes Catalyst inline
    # and re-evaluate the split(text) ONCE PER ELEMENT (interpreted HOF, no
    # codegen), an O(words^2) regex blowup per document. zip_with evaluates
    # both array arguments a single time; the shorter shifted slice pads the
    # last element with null, dropped by slice() below.
    grams = F.slice(
        F.zip_with(
            words,
            F.slice(words, 2, F.greatest(n_words - 1, F.lit(1))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        1,
        F.greatest(n_words - 1, F.lit(1)),
    )
    total_2g = F.when(n_words >= 2, n_words - 1).otherwise(F.lit(0)).cast("long")
    distinct_2g = F.when(
        n_words >= 2, F.size(F.array_distinct(grams))
    ).otherwise(F.lit(0)).cast("long")

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        word_chars.alias("word_chars"),
        total_2g.alias("total_2grams"),
        distinct_2g.alias("distinct_2grams"),
    )
    # exact integer division (div) on both engines — no double rounding
    out = base.select(
        "doc_id", "n_words", "total_2grams", "distinct_2grams",
        F.expr("CASE WHEN n_words > 0 THEN (word_chars * 1000000) div n_words "
               "ELSE 0 END").cast("long").alias("mean_word_len_x1e6"),
        F.expr("CASE WHEN total_2grams > 0 THEN "
               "((total_2grams - distinct_2grams) * 1000000) div total_2grams "
               "ELSE 0 END").cast("long").alias("dup_2gram_frac_x1e6"),
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len_x1e6") >= min_mean_word_len * 1000000)
        & (F.col("mean_word_len_x1e6") <= max_mean_word_len * 1000000)
        & (F.col("dup_2gram_frac_x1e6") <= max_dup_2gram_x1e6)
    )
    return out.withColumn("keep", keep)


def repetition_top_ngram(docs: DataFrame, n: int = 2, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Gopher repetition filter (Rae et al. 2021 §A1.1, "fraction of
    characters in the most frequent n-gram"): per document, find the most
    frequent word ``n``-gram and report how much of the document's word
    characters its occurrences cover. High values mean looping / boilerplate
    text that the duplicate-2-gram *count* gate misses (one gram repeated
    many times keeps distinct-2-gram low but is exactly the pathology).

    Output: ``(doc_id, top_gram, top_n, rep_frac_x1e6)`` for every doc with
    at least ``n`` tokens. Tie-break: highest count, then lexicographically
    smallest gram — deterministic, so the SQL oracle reproduces the pick.
    ``rep_frac_x1e6`` = occurrences x gram chars (separators excluded) as a
    millionths fraction of total word chars, exact integer arithmetic.

    Scale shape: explode n-gram occurrences -> per-(doc, gram) count (one
    hash shuffle with map-side partial agg) -> per-doc top-1 via a window
    whose partial ranks prune map-side (WindowGroupLimit), same plan family
    as ``top_terms``. No pairwise work, no driver collection.
    """
    from pyspark.sql import Window

    from .dedup import _raw_shingles

    occ = _raw_shingles(docs, n, id_col, text_col)
    counts = occ.groupBy("doc_id", "shingle").agg(
        F.count("*").cast("long").alias("cnt")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.col("shingle").asc()
    )
    top = (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )
    t = F.trim(F.lower(F.col(text_col)))
    words = F.split(t, r"\s+")
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, wd: acc + F.length(wd)
    )
    wc = docs.select(F.col(id_col).alias("doc_id"),
                     word_chars.alias("word_chars"))
    return (
        top.join(wc, on="doc_id")
        .select(
            "doc_id",
            F.col("shingle").alias("top_gram"),
            F.col("cnt").alias("top_n"),
            F.expr(
                "CAST(CASE WHEN word_chars > 0 THEN "
                "(cnt * {gc} * 1000000) div word_chars ELSE 0 END AS BIGINT)"
                .format(gc="length(replace(shingle, ' ', ''))")
            ).alias("rep_frac_x1e6"),
        )
    )


def top_terms(docs: DataFrame, k: int = 10, by: str = "lang",
              text_col: str = "text") -> DataFrame:
    """Top-k whitespace terms per group (corpus frequency analysis):
    (group, rnk, word, n). One shuffle for the count, one for the window;
    ties broken lexicographically so output is deterministic."""
    from pyspark.sql import Window

    words = docs.select(
        F.col(by),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    counts = words.groupBy(by, "word").count().withColumnRenamed("count", "n")
    w = Window.partitionBy(by).orderBy(F.col("n").desc(), F.col("word").asc())
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(by, "rnk", "word", "n")
    )


def hashed_linear_weights(n_buckets: int = 64, salt: str = "w0",
                          span: int = 2001) -> list:
    """Deterministic weight vector for ``linear_quality``: bucket ``b``
    gets ``md5int(salt ':' b) % span - span // 2`` (md5int = first 8 hex
    chars as an integer, the repo-wide hash convention). Centered so the
    expected token score is ~0. Computed driver-side with hashlib and
    embedded as a LITERAL array — never as md5 *expressions*, which
    Catalyst will not constant-fold inside downstream operators (see
    CLAUDE.md). The DuckDB oracle recomputes the same formula inline.
    """
    import hashlib

    return [
        int(hashlib.md5(("%s:%d" % (salt, b)).encode()).hexdigest()[:8], 16)
        % span - span // 2
        for b in range(n_buckets)
    ]


def linear_quality(docs: DataFrame, n_buckets: int = 64, salt: str = "w0",
                   span: int = 2001, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Hashed-feature linear quality classifier (the fastText-style scorer
    every production curation stack runs between heuristic gates and
    expensive model scoring): each lowercased token hashes into one of
    ``n_buckets`` feature buckets; the document score is the sum of the
    buckets' weights over token OCCURRENCES; ``keep`` is score >= 0.

    The weights here are hash-derived stand-ins (the sandbox has no
    trained model) — the *engine contract* is what matters: given any
    integer weight table, scoring is exact, deterministic, and identical
    in the oracle. Swapping in real exported fastText weights is a
    one-list change.

    Scale shape: explode tokens (narrow) -> bucket via md5 (codegen) ->
    weight via ``element_at`` on a broadcast literal array (no join!) ->
    one groupBy(doc) sum with map-side partial agg. Token-less documents
    are restored by a left join against the doc spine with score 0.
    All-integer arithmetic end to end.
    """
    weights = hashed_linear_weights(n_buckets, salt, span)
    warr = F.array(*[F.lit(int(w)) for w in weights])
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    bucket = F.pmod(
        F.conv(F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(":"), F.col("tok"))), 1, 8
        ), 16, 10).cast("long"),
        F.lit(int(n_buckets)),
    )
    scored = (
        toks.select("doc_id", F.element_at(warr, (bucket + 1).cast("int"))
                    .alias("w"))
        .groupBy("doc_id")
        .agg(
            F.sum("w").cast("long").alias("score"),
            F.count("*").cast("long").alias("n_tokens"),
        )
    )
    spine = docs.select(F.col(id_col).alias("doc_id"))
    return (
        spine.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("score", F.lit(0).cast("long")).alias("score"),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            (F.coalesce("score", F.lit(0).cast("long")) >= 0).alias("keep"),
        )
    )


def unigram_surprisal(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Per-document mean unigram surprisal against the corpus's own
    unigram model — the integer-exact cousin of the n-gram-LM perplexity
    filters used in corpus curation (e.g. CCNet): rare-token-heavy
    documents score high, boilerplate scores low.

    Surprisal of one token occurrence is approximated in whole bits as
    ``bitlen(total_tokens) - bitlen(count(token))`` (= ``floor(log2)``
    difference, within 1 bit of -log2 p per term) — computed as
    ``length(bin(x))`` string arithmetic, so the score is pure integer and
    the DuckDB oracle replays it bit-for-bit; no float ln ever runs.

    Returns ``(doc_id, n_tokens, surprisal_sum, mean_surprisal_x1000)``
    for every input document (tokenless docs score 0).

    Scale shape: tokens are pre-aggregated to per-(doc, token)
    multiplicities before touching the vocabulary, so the vocab join's
    skew is bounded at one row per document per hot token and the join
    never explodes; the corpus-total scalar is a 1-row broadcast attached
    to the vocab (vocab-sized, not corpus-sized). Two aggregates + one
    equi-join — no UDFs, no collect.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+", -1),
                     lambda x: F.length(x) > 0)
        ).alias("tok"),
    )
    mult = toks.groupBy("doc_id", "tok").agg(
        F.count("*").cast("long").alias("m"))
    vocab = mult.groupBy("tok").agg(F.sum("m").cast("long").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("long").alias("total"))
    vocab_s = attach_scalar(vocab, total).select(
        "tok",
        (F.length(F.bin(F.col("total")))
         - F.length(F.bin(F.col("cnt")))).cast("long").alias("surp"),
    )
    scored = (
        mult.join(vocab_s, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_tokens"),
            F.sum(F.col("m") * F.col("surp")).cast("long")
            .alias("surprisal_sum"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("surprisal_sum", F.lit(0).cast("long"))
            .alias("surprisal_sum"),
            F.when(
                F.coalesce(F.col("n_tokens"), F.lit(0)) > 0,
                F.expr("surprisal_sum * 1000 div n_tokens"),
            ).otherwise(F.lit(0)).cast("long").alias("mean_surprisal_x1000"),
        )
    )


def unigram_surprisal_oracle_sql(source_sql: str) -> str:
    """DuckDB replay of ``unigram_surprisal`` (same integer bit
    arithmetic), ordered by doc_id."""
    return f"""
WITH src AS ({source_sql}),
toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'),
                            t -> len(t) > 0)) AS tok
  FROM src),
mult AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS m
  FROM toks GROUP BY doc_id, tok),
vocab AS (
  SELECT tok, CAST(SUM(m) AS BIGINT) AS cnt FROM mult GROUP BY tok),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
vs AS (
  SELECT tok,
         CAST(length(bin(tot.total)) - length(bin(cnt)) AS BIGINT) AS surp
  FROM vocab CROSS JOIN tot),
scored AS (
  SELECT mult.doc_id,
         CAST(SUM(m) AS BIGINT) AS n_tokens,
         CAST(SUM(m * surp) AS BIGINT) AS surprisal_sum
  FROM mult JOIN vs USING (tok) GROUP BY mult.doc_id)
SELECT s.doc_id,
       CAST(COALESCE(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(sc.surprisal_sum, 0) AS BIGINT) AS surprisal_sum,
       CAST(CASE WHEN COALESCE(sc.n_tokens, 0) > 0
                 THEN (sc.surprisal_sum * 1000) // sc.n_tokens
                 ELSE 0 END AS BIGINT) AS mean_surprisal_x1000
FROM (SELECT doc_id FROM src) s
LEFT JOIN scored sc USING (doc_id)
ORDER BY doc_id
"""


def quality_percentile_flags(docs: DataFrame, keep_pct: int = 30,
                             group_col: str = "lang",
                             id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """Adaptive quality thresholding: keep the top ``keep_pct`` percent of
    documents per group by stopword-density score, with the cutoff LEARNED
    from each group's own score distribution (CCNet-style per-language
    quantile filtering) instead of a global constant.

    Exact semantics: cutoff(group) = the discrete (100-keep_pct)-th
    percentile of the group's scores (same ``(p*n+99) div 100`` rank
    arithmetic as ``group_quantiles``); keep = score >= cutoff, cutoff
    ties all kept — a pure integer function of the corpus.

    Scale shape: the score is a BOUNDED integer (density x1e6, so at most
    1e6+1 distinct values), which turns the exact percentile into a
    score-HISTOGRAM problem: one map-side-combined count per (group,
    score) and a prefix scan over <= 1e6 rows per group. The corpus is
    never sorted — the window partitions are histogram-sized, not
    group-sized, so a group holding 80%% of a 100 TB corpus costs the
    same as any other. Cutoffs broadcast back onto the docs (no second
    corpus shuffle).
    """
    if not 1 <= int(keep_pct) <= 100:
        raise ValueError("keep_pct must be in 1..100")
    from pyspark.sql import Window

    col = F.col(text_col)
    n_stop = (_count_sub(col, " the ") + _count_sub(col, " and ")
              + _count_sub(col, " of "))
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        n_stop.alias("__stop"),
        F.length(col).alias("__len"),
    ).select(
        "doc_id", "grp",
        F.expr("(__stop * 1000000) div greatest(__len, 1)")
        .cast("long").alias("score"),
    )
    hist = scored.groupBy("grp", "score").agg(
        F.count("*").cast("long").alias("cnt"))
    w_cum = (Window.partitionBy("grp").orderBy("score")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy("grp")
    p = 100 - int(keep_pct)
    cum = hist.select(
        "grp", "score",
        F.sum("cnt").over(w_cum).alias("cume"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    cutoffs = (
        cum.filter(F.col("cume") >= F.expr("({p} * n + 99) div 100"
                                           .format(p=p)))
        .groupBy("grp")
        .agg(F.min("score").alias("cutoff"))
    )
    return (
        scored.join(F.broadcast(cutoffs), "grp")
        .select(
            "doc_id",
            F.col("grp").alias(group_col),
            "score", "cutoff",
            (F.col("score") >= F.col("cutoff")).alias("keep"),
        )
    )


def quality_percentile_oracle_sql(source_sql: str, keep_pct: int = 30,
                                  group_col: str = "lang") -> str:
    """DuckDB replay of ``quality_percentile_flags`` — same histogram +
    rank arithmetic; source must yield (doc_id, {group_col}, text)."""
    p = 100 - int(keep_pct)
    return f"""
WITH src AS ({source_sql}),
scored AS (
  -- the stopword sum must become BIGINT BEFORE the // so the division is
  -- true integer floor: on DOUBLE operands DuckDB's // does not floor and
  -- the final BIGINT cast ROUNDS (the documented Spark-truncates /
  -- DuckDB-rounds trap)
  SELECT doc_id, {group_col} AS grp,
         CAST((length(text) - length(replace(text, ' the ', ''))) / 5
              + (length(text) - length(replace(text, ' and ', ''))) / 5
              + (length(text) - length(replace(text, ' of ', ''))) / 4
              AS BIGINT)
           * 1000000 // GREATEST(length(text), 1) AS score
  FROM src),
hist AS (
  SELECT grp, score, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM scored GROUP BY grp, score),
cum AS (
  SELECT grp, score,
         SUM(cnt) OVER (PARTITION BY grp ORDER BY score
                        ROWS UNBOUNDED PRECEDING) AS cume,
         SUM(cnt) OVER (PARTITION BY grp) AS n
  FROM hist),
cutoffs AS (
  SELECT grp, MIN(score) AS cutoff
  FROM cum WHERE cume >= ({p} * n + 99) // 100
  GROUP BY grp)
SELECT s.doc_id, s.grp AS {group_col}, s.score,
       CAST(c.cutoff AS BIGINT) AS cutoff,
       s.score >= c.cutoff AS keep
FROM scored s JOIN cutoffs c USING (grp)
ORDER BY doc_id
"""


def token_drift(corpus_a: DataFrame, corpus_b: DataFrame, k: int = 50,
                text_col: str = "text") -> DataFrame:
    """Corpus drift monitor: the ``k`` tokens whose frequency shifted most
    between two corpus snapshots — the distribution check a production
    crawl pipeline runs between ingests before retraining on new data.

    Integer-exact statistic: each token's rate in parts-per-million per
    snapshot (``cnt * 1e6 div total``), then a chi-square-flavored score
    ``(rate_a - rate_b)^2 div (rate_a + rate_b + 1)`` — scale-free (a
    10x-bigger snapshot B does not drown A) and a pure function of the
    two token multisets, replayed bit-for-bit by the oracle. Ranked score
    desc / token asc (total order).

    Scale shape: one map-side-combined count aggregate per snapshot, a
    full-outer token join (vocab-sized, not corpus-sized), two 1-row
    total scalars broadcast on, and a global top-k
    (``TakeOrderedAndProject``). Missing tokens count as rate 0.
    """
    if k <= 0:
        raise ValueError("k must be positive")

    def counts(df, side):
        toks = df.select(
            F.explode(
                F.filter(F.split(F.col(text_col), r"\s+", -1),
                         lambda x: F.length(x) > 0)
            ).alias("tok")
        )
        return toks.groupBy("tok").agg(
            F.count("*").cast("long").alias("cnt_" + side))

    ca = counts(corpus_a, "a")
    cb = counts(corpus_b, "b")
    tot_a = ca.agg(F.sum("cnt_a").alias("tot_a"))
    tot_b = cb.agg(F.sum("cnt_b").alias("tot_b"))
    joined = (
        attach_scalar(attach_scalar(
            ca.join(cb, "tok", "full_outer"), tot_a), tot_b)
        .select(
            "tok",
            F.coalesce("cnt_a", F.lit(0).cast("long")).alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0).cast("long")).alias("cnt_b"),
            F.expr("coalesce(cnt_a, 0L) * 1000000 div greatest(tot_a, 1L)")
            .cast("long").alias("rate_a_ppm"),
            F.expr("coalesce(cnt_b, 0L) * 1000000 div greatest(tot_b, 1L)")
            .cast("long").alias("rate_b_ppm"),
        )
        .withColumn(
            "drift_score",
            F.expr("(rate_a_ppm - rate_b_ppm) * (rate_a_ppm - rate_b_ppm)"
                   " div (rate_a_ppm + rate_b_ppm + 1)").cast("long"),
        )
    )
    from pyspark.sql import Window

    topk = joined.orderBy(
        F.desc("drift_score"), F.asc("tok")).limit(k)
    w = Window.orderBy(F.desc("drift_score"), F.asc("tok"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "tok", "cnt_a", "cnt_b", "rate_a_ppm", "rate_b_ppm",
        "drift_score",
    )


def token_drift_oracle_sql(a_sql: str, b_sql: str, k: int = 50) -> str:
    """DuckDB replay of ``token_drift``; each side must yield (text)."""
    return f"""
WITH ta AS (
  SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                            t -> len(t) > 0)) AS tok
  FROM ({a_sql})),
tb AS (
  SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                            t -> len(t) > 0)) AS tok
  FROM ({b_sql})),
ca AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt_a FROM ta GROUP BY tok),
cb AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt_b FROM tb GROUP BY tok),
tots AS (
  SELECT (SELECT COALESCE(SUM(cnt_a), 0) FROM ca) AS tot_a,
         (SELECT COALESCE(SUM(cnt_b), 0) FROM cb) AS tot_b),
j AS (
  SELECT COALESCE(ca.tok, cb.tok) AS tok,
         CAST(COALESCE(cnt_a, 0) AS BIGINT) AS cnt_a,
         CAST(COALESCE(cnt_b, 0) AS BIGINT) AS cnt_b,
         CAST(COALESCE(cnt_a, 0) * 1000000 // GREATEST(tot_a, 1)
              AS BIGINT) AS rate_a_ppm,
         CAST(COALESCE(cnt_b, 0) * 1000000 // GREATEST(tot_b, 1)
              AS BIGINT) AS rate_b_ppm
  FROM ca FULL OUTER JOIN cb USING (tok) CROSS JOIN tots),
s AS (
  SELECT tok, cnt_a, cnt_b, rate_a_ppm, rate_b_ppm,
         CAST((rate_a_ppm - rate_b_ppm) * (rate_a_ppm - rate_b_ppm)
              // (rate_a_ppm + rate_b_ppm + 1) AS BIGINT) AS drift_score
  FROM j)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY drift_score DESC, tok ASC) AS INT)
         AS rank,
       tok, cnt_a, cnt_b, rate_a_ppm, rate_b_ppm, drift_score
FROM s
ORDER BY drift_score DESC, tok ASC
LIMIT {int(k)}
"""


def bigram_surprisal(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document mean BIGRAM surprisal against the corpus's own bigram
    model — the order-2 companion of :func:`unigram_surprisal` and the
    closest integer-exact analogue of the KenLM-perplexity filters used in
    corpus curation (CCNet, Gopher): p(w2 | w1) = c(w1 w2) / c(w1 ·), so a
    document full of unusual word TRANSITIONS scores high even when every
    individual word is common (the signal unigram surprisal can't see).

    Surprisal of one bigram occurrence, in whole bits:
    ``bitlen(c(w1 ·)) - bitlen(c(w1 w2))`` via ``length(bin(x))`` — pure
    integer, replayed bit-for-bit by the DuckDB oracle. Self-scoring means
    every bigram has corpus count >= 1: no backoff arm is ever taken.

    Returns ``(doc_id, n_bigrams, surprisal_sum, mean_surprisal_x1000)``
    for every input document (docs with < 2 tokens score 0).

    Scale shape (same as unigram): occurrences pre-aggregate to per-(doc,
    bigram) multiplicities before touching the model, bounding join skew
    at one row per doc per hot bigram; the prefix-count table is another
    vocab-sized aggregate of the bigram table (no second corpus pass);
    everything is equi-joins + map-side-combined aggregates, no UDF.
    """
    words = F.filter(F.split(F.col(text_col), r"\s+", -1),
                     lambda x: F.length(x) > 0)
    d = docs.select(F.col(id_col).alias("doc_id"), words.alias("w")).filter(
        F.size("w") >= 2)
    pairs = F.expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),"
        " (a, b) -> concat(a, ' ', b))")
    big = d.select("doc_id", F.explode(pairs).alias("gram"))
    mult = big.groupBy("doc_id", "gram").agg(
        F.count("*").cast("long").alias("m"))
    bcnt = mult.groupBy("gram").agg(F.sum("m").cast("long").alias("cnt"))
    pref = bcnt.groupBy(
        F.split_part(F.col("gram"), F.lit(" "), F.lit(1)).alias("w1")
    ).agg(F.sum("cnt").cast("long").alias("pcnt"))
    vs = bcnt.withColumn(
        "w1", F.split_part(F.col("gram"), F.lit(" "), F.lit(1))
    ).join(pref, "w1").select(
        "gram",
        (F.length(F.bin(F.col("pcnt")))
         - F.length(F.bin(F.col("cnt")))).cast("long").alias("surp"),
    )
    scored = (
        mult.join(vs, "gram")
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_bigrams"),
            F.sum(F.col("m") * F.col("surp")).cast("long")
            .alias("surprisal_sum"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.coalesce("surprisal_sum", F.lit(0).cast("long"))
            .alias("surprisal_sum"),
            F.when(
                F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
                F.expr("surprisal_sum * 1000 div n_bigrams"),
            ).otherwise(F.lit(0)).cast("long")
            .alias("mean_surprisal_x1000"),
        )
    )


def bigram_surprisal_oracle_sql(source_sql: str) -> str:
    """DuckDB replay of :func:`bigram_surprisal` (same integer bit
    arithmetic), ordered by doc_id."""
    return f"""
WITH src AS ({source_sql}),
toked AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'),
                     t -> len(t) > 0) AS w
  FROM src),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                j -> w[j] || ' ' || w[j + 1])) AS gram
  FROM toked WHERE len(w) >= 2),
mult AS (
  SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS m
  FROM big GROUP BY doc_id, gram),
bcnt AS (
  SELECT gram, CAST(SUM(m) AS BIGINT) AS cnt FROM mult GROUP BY gram),
pref AS (
  SELECT split_part(gram, ' ', 1) AS w1, CAST(SUM(cnt) AS BIGINT) AS pcnt
  FROM bcnt GROUP BY 1),
vs AS (
  SELECT gram,
         CAST(length(bin(pcnt)) - length(bin(cnt)) AS BIGINT) AS surp
  FROM bcnt JOIN pref ON split_part(bcnt.gram, ' ', 1) = pref.w1),
scored AS (
  SELECT mult.doc_id,
         CAST(SUM(m) AS BIGINT) AS n_bigrams,
         CAST(SUM(m * surp) AS BIGINT) AS surprisal_sum
  FROM mult JOIN vs USING (gram) GROUP BY mult.doc_id)
SELECT s.doc_id,
       CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(sc.surprisal_sum, 0) AS BIGINT) AS surprisal_sum,
       CAST(CASE WHEN COALESCE(sc.n_bigrams, 0) > 0
                 THEN (sc.surprisal_sum * 1000) // sc.n_bigrams
                 ELSE 0 END AS BIGINT) AS mean_surprisal_x1000
FROM (SELECT doc_id FROM src) s
LEFT JOIN scored sc USING (doc_id)
ORDER BY doc_id
"""


def compression_ratio(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", level: int = 6,
                      flag_below_ppm: int = 300_000) -> DataFrame:
    """DEFLATE compression ratio per document — the classic cheap
    redundancy signal (used alongside the Gopher gates in Dolma/RedPajama
    cleaning): machine-generated and template text compresses far better
    than natural prose, so a LOW ratio flags it.

    Returns ``(doc_id, raw_len, comp_len, ratio_ppm, low_entropy)`` with
    ``ratio_ppm = comp_len * 1e6 div raw_len`` (integer) and
    ``low_entropy = ratio_ppm < flag_below_ppm`` (as int). Empty docs get
    ratio 1e6 and flag 0.

    Scale shape: one Arrow-batched ``mapInPandas`` pass, no shuffle —
    zlib at a fixed level is deterministic for a given zlib build, and the
    downstream signal (the integer ratio) is robust to library revisions.
    DuckDB has no DEFLATE, so the contract query is rows-only by
    necessity; exactness is pinned by the pure-Python replay test.
    """
    import pandas as pd
    import zlib

    lvl = int(level)
    thr = int(flag_below_ppm)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw = [(t or "").encode("utf-8") for t in pdf[text_col]]
            comp = [len(zlib.compress(b, lvl)) for b in raw]
            rl = [len(b) for b in raw]
            ratio = [((c * 1_000_000) // r) if r > 0 else 1_000_000
                     for c, r in zip(comp, rl)]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "raw_len": rl,
                    "comp_len": comp,
                    "ratio_ppm": ratio,
                    "low_entropy": [int(x < thr) for x in ratio],
                }
            )

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run,
        schema=("doc_id long, raw_len long, comp_len long,"
                " ratio_ppm long, low_entropy int"),
    )


def readability(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade as exact integer
    fixed-point (milli-units) — the classic web-text quality signal
    pipelines gate on before expensive model scoring.

    Heuristic contract (documented, cross-engine exact): words =
    whitespace tokens; sentences = [.!?]+ runs (min 1); syllables =
    [aeiouy]+ vowel groups in the lowercased text (min 1).  All three
    ride the scan as pure codegen regex counts; both ratios use
    non-negative integer division (div == // when everything is
    positive, so the repo's truncate-vs-floor rule is moot by
    construction):

      fre_milli = 206835 - (1015000*words) div (1000*sentences)
                         - (84600*syllables) div words
      fkg_milli = (390000*words) div (1000*sentences)
                  + (11800*syllables) div words - 15590

    Zero shuffles, zero UDFs, zero joins."""
    t = F.trim(F.col(text_col))
    words = F.greatest(
        F.when(F.length(t) == 0, F.lit(0)).otherwise(
            F.size(F.split(t, r"\s+"))).cast("long"),
        F.lit(1).cast("long"))
    sentences = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")).cast("long"),
        F.lit(1).cast("long"))
    syllables = F.greatest(
        F.regexp_count(F.lower(F.col(text_col)),
                       F.lit(r"[aeiouy]+")).cast("long"),
        F.lit(1).cast("long"))
    d = (docs.select(F.col(id_col).alias("doc_id"),
                     words.alias("n_words"),
                     sentences.alias("n_sentences"),
                     syllables.alias("n_syllables")))
    wps = F.expr("(1015000 * n_words) div (1000 * n_sentences)")
    spw = F.expr("(84600 * n_syllables) div n_words")
    return d.select(
        "doc_id", "n_words", "n_sentences", "n_syllables",
        (F.lit(206835).cast("long") - wps - spw).cast("long")
        .alias("fre_milli"),
        (F.expr("(390000 * n_words) div (1000 * n_sentences)")
         + F.expr("(11800 * n_syllables) div n_words")
         - F.lit(15590)).cast("long").alias("fkg_milli"),
    )


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k collocations (statistically glued bigrams) by integer
    pointwise-lift: ``lift_ppm = c_xy * N * 1e6 div (c_x * c_y)`` — the
    exp of PMI, a monotone transform, so the ranking IS the PMI ranking
    without a single runtime logarithm.  ``min_count`` kills the
    hapax-pair noise PMI is notorious for.

    Output: ``(rnk, gram, c_xy, c_x, c_y, lift_ppm)``, rank ties broken
    lexicographically.

    Tokenization matches :func:`bigram_surprisal` (whitespace split,
    empties dropped); bigrams come from ``zip_with`` of the array with
    its shifted slice — the documented safe HOF shape (a lambda indexing
    the OUTER array re-runs the split per element; see CLAUDE.md).

    Scale shape: two vocabulary-sized aggregates (unigrams, bigrams) off
    ONE tokenized scan; the ``min_count`` filter prunes the bigram table
    BEFORE its two unigram joins (AQE handles hot-word skew); the corpus
    token total attaches via the sanctioned 1-row scalar join; top-k is
    a WindowGroupLimit-pruned global rank over the surviving bigrams.
    The lift product runs in decimal(38,0) — exact while
    ``N * 1e6 div min_count`` fits int64, i.e. corpora to ~4.6e13 tokens
    at min_count=5 (document larger corpora by raising min_count).
    """
    from ._util import attach_scalar

    words = F.filter(F.split(F.col(text_col), r"\s+", -1),
                     lambda x: F.length(x) > 0)
    toked = docs.select(words.alias("w"))
    uni = (
        toked.select(F.explode("w").alias("word"))
        .groupBy("word").agg(F.count("*").cast("long").alias("c"))
    )
    total = uni.agg(F.sum("c").cast("long").alias("n_tokens"))
    pairs = F.expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),"
        " (a, b) -> concat(a, ' ', b))")
    bcnt = (
        toked.filter(F.size("w") >= 2)
        .select(F.explode(pairs).alias("gram"))
        .groupBy("gram").agg(F.count("*").cast("long").alias("c_xy"))
        .filter(F.col("c_xy") >= F.lit(int(min_count)))
    )
    u1 = uni.select(F.col("word").alias("w1"), F.col("c").alias("c_x"))
    u2 = uni.select(F.col("word").alias("w2"), F.col("c").alias("c_y"))
    j = (
        bcnt
        .withColumn("w1", F.split_part(F.col("gram"), F.lit(" "), F.lit(1)))
        .withColumn("w2", F.split_part(F.col("gram"), F.lit(" "), F.lit(2)))
        .join(u1, "w1").join(u2, "w2")
    )
    scored = attach_scalar(j, total).select(
        "gram", "c_xy", "c_x", "c_y",
        F.expr("div(cast(c_xy as decimal(38,0)) * n_tokens * 1000000,"
               " cast(c_x as decimal(38,0)) * c_y)")
        .cast("long").alias("lift_ppm"),
    )
    w_top = Window.orderBy(F.desc("lift_ppm"), F.asc("gram"))
    return (
        scored.withColumn("rnk", F.row_number().over(w_top))
        .filter(F.col("rnk") <= int(k))
        .select("rnk", "gram", "c_xy", "c_x", "c_y", "lift_ppm")
    )


def vocab_stats(docs: DataFrame, by: str = "source",
                text_col: str = "text") -> DataFrame:
    """Per-group vocabulary profile — the Heaps-law / lexical-diversity
    corpus read (is a source natural text, boilerplate, or spam?):

        n_docs        documents in the group
        n_tokens      total tokens (whitespace tokenization, repo-standard)
        vocab         distinct tokens
        hapax         tokens occurring exactly once (Zipf tail mass)
        ttr_ppm       floor(1e6 * vocab / n_tokens)   type-token ratio
        hapax_ppm     floor(1e6 * hapax / vocab)      hapax share

    Natural text sits near hapax_ppm ~ 400-600k (Zipf); templated/
    boilerplate sources collapse toward 0; random-ish spam pushes both
    ratios toward 1e6.  All outputs deterministic integers.

    Scale shape: one tokenized explode feeds ONE map-side-combined
    (group, word) aggregate — the corpus collapses to the vocab-bounded
    frequency table; per-group doc counts aggregate separately and join
    on the group key (broadcast-sized: one row per group).  The ratio
    arithmetic is pure codegen on the bounded rollup.  Never a distinct
    over raw token rows (countDistinct would shuffle every token
    occurrence; the (group, word) pre-aggregate combines map-side).
    """
    t = F.lower(F.trim(F.col(text_col)))
    words = (
        docs.select(F.col(by).alias("grp"),
                    F.explode(F.split(t, r"\s+")).alias("word"))
        .filter(F.col("word") != "")
    )
    freq = words.groupBy("grp", "word").agg(
        F.count("*").cast("long").alias("n"))
    voc = freq.groupBy("grp").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("vocab"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("long").alias("hapax"),
    )
    nd = docs.groupBy(F.col(by).alias("grp")).agg(
        F.count("*").cast("long").alias("n_docs"))
    return nd.join(voc, on="grp", how="left").select(
        "grp", "n_docs",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("vocab", F.lit(0)).cast("long").alias("vocab"),
        F.coalesce("hapax", F.lit(0)).cast("long").alias("hapax"),
        F.when(F.coalesce("n_tokens", F.lit(0)) > 0,
               F.expr("div(vocab * cast(1000000 as bigint), n_tokens)"))
        .cast("long").alias("ttr_ppm"),
        F.when(F.coalesce("vocab", F.lit(0)) > 0,
               F.expr("div(hapax * cast(1000000 as bigint), vocab)"))
        .cast("long").alias("hapax_ppm"),
    )


#: characters whose density separates code from prose (brace languages,
#: markup, config) — counted exactly via translate-stripping.
CODE_CHARS = ";{}()=<>[]"


def code_signals(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 sym_threshold_ppm: int = 20_000) -> DataFrame:
    """Code-vs-prose routing signals per document — the corpus-curation
    filter that keeps source code out of a prose corpus (or routes it
    to a code corpus): ``(doc_id, n_chars, sym_ppm, digit_ppm,
    is_code)`` with

        sym_ppm   = 1e6 * count(chars in CODE_CHARS) div n_chars
        digit_ppm = 1e6 * count('0'-'9')             div n_chars
        is_code   = sym_ppm >= sym_threshold_ppm     (default 2%)

    Counting is ``length(x) - length(translate(x, set, ''))`` — exact,
    locale-free, and byte-identical across engines (no regex engine
    differences; ``translate`` strips every occurrence of every listed
    character).  Zero-length documents report 0/0/false.

    Scale shape: a pure narrow codegen projection — zero shuffles, zero
    joins, zero python; the filter pushes to the scan.
    """
    t = F.col(text_col)
    n = F.length(t).cast("long")
    sym = (F.length(t)
           - F.length(F.translate(t, CODE_CHARS, ""))).cast("long")
    dig = (F.length(t)
           - F.length(F.translate(t, "0123456789", ""))).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_chars"), sym.alias("n_sym"), dig.alias("n_digit"))
    sym_ppm = F.when(F.col("n_chars") > 0, F.expr(
        "div(n_sym * cast(1000000 as bigint), n_chars)")) \
        .otherwise(0).cast("long")
    dig_ppm = F.when(F.col("n_chars") > 0, F.expr(
        "div(n_digit * cast(1000000 as bigint), n_chars)")) \
        .otherwise(0).cast("long")
    return base.select(
        "doc_id", "n_chars", "n_sym", "n_digit",
        sym_ppm.alias("sym_ppm"),
        dig_ppm.alias("digit_ppm"),
        (sym_ppm >= F.lit(int(sym_threshold_ppm))).alias("is_code"),
    )


def zipf_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Rank-frequency (Zipf) profile of the corpus vocabulary in
    doubling rank buckets — the log-free power-law read: bucket b holds
    the words with frequency rank in ``[2^b, 2^(b+1))`` (rank by
    frequency DESC, word ASC for determinism), and under Zipf's law
    with exponent ~1 each bucket carries roughly constant token mass.
    A corpus whose head buckets dwarf the tail is boilerplate/templated;
    a flat-by-types profile is random-ish spam.  Output, one row per
    non-empty bucket:

        bucket        floor(log2(rank))  (0, 1, 2, ...)
        rank_lo       smallest rank in the bucket (= 2^bucket)
        n_types       distinct words in the bucket
        tokens        total occurrences of those words
        share_ppm     floor(1e6 * tokens / corpus tokens)
        cum_share_ppm floor(1e6 * cumulative tokens / corpus tokens)

    ``floor(log2(rank))`` is computed exactly as ``length(bin(rank))-1``
    — binary digit count, no float log (both engines print minimal
    binary, probed).

    Scale shape: the vocab_stats discipline — one tokenized explode
    feeds ONE map-side-combined word aggregate; the rank window, bucket
    rollup, and total/cumulative windows all run over the VOCAB-bounded
    frequency table (documented contract: vocabularies are bounded;
    corpus-cardinality keys do not belong here).  Never a global sort
    of token occurrences.
    """
    t = F.lower(F.trim(F.col(text_col)))
    words = (
        docs.select(F.explode(F.split(t, r"\s+")).alias("word"))
        .filter(F.col("word") != "")
    )
    freq = words.groupBy("word").agg(F.count("*").cast("long").alias("n"))
    wr = Window.orderBy(F.col("n").desc(), F.col("word").asc())
    ranked = freq.select(
        "n",
        F.row_number().over(wr).cast("long").alias("rank"),
    ).select(
        "n", "rank",
        (F.length(F.bin(F.col("rank"))) - 1).cast("int").alias("bucket"),
    )
    g = ranked.groupBy("bucket").agg(
        F.min("rank").cast("long").alias("rank_lo"),
        F.count("*").cast("long").alias("n_types"),
        F.sum("n").cast("long").alias("tokens"),
    )
    wall = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    wcum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0)
    return g.select(
        "bucket", "rank_lo", "n_types", "tokens",
        F.sum("tokens").over(wall).cast("long").alias("_tot"),
        F.sum("tokens").over(wcum).cast("long").alias("_cum"),
    ).select(
        "bucket", "rank_lo", "n_types", "tokens",
        F.expr("cast(div(cast(tokens as decimal(38,0)) * 1000000, _tot)"
               " as bigint)").alias("share_ppm"),
        F.expr("cast(div(cast(_cum as decimal(38,0)) * 1000000, _tot)"
               " as bigint)").alias("cum_share_ppm"),
    )


def ngram_overlap(
    df: DataFrame,
    cand_col: str = "cand",
    ref_col: str = "ref",
    id_col: str = "doc_id",
) -> DataFrame:
    """BLEU-style clipped n-gram precision (1- and 2-gram, no brevity
    float) of candidate texts against per-document references — the
    generation / distillation / paraphrase-quality eval read.  Per doc
    and n, every candidate n-gram counts at most ``min(count in cand,
    count in ref)`` (the BLEU clip); output is ONE corpus row:

        n_docs
        p1_num, p1_den, p1_ppm     clipped / total unigrams, floor ppm
        p2_num, p2_den, p2_ppm     same for bigrams

    Tokenization is repo-standard (lower, trim, whitespace split);
    everything integer, both dens NULL-safe (empty corpus -> ppm NULL).

    Scale shape: two tokenized explodes feed map-side-combined
    (doc, gram) count aggregates; the clip is ONE left equi-join of
    cand counts against ref counts per n; bigram formation is a
    positional self-join on (doc, pos+1) — per-doc bounded, exactly
    the collocations shape.  Final rollup is ONE global aggregate.
    """
    def toks(col):
        t = F.split(F.lower(F.trim(F.col(col))), r"\s+")
        return (
            df.select(F.col(id_col).alias("doc"), t.alias("_t"))
            .select("doc", F.posexplode("_t").alias("pos", "tok"))
            .filter(F.col("tok") != "")
            .select("doc", F.col("pos").cast("long").alias("pos"), "tok")
        )

    cand_t = toks(cand_col)
    ref_t = toks(ref_col)

    def grams(t, n):
        if n == 1:
            g = t.select("doc", F.col("tok").alias("gram"))
        else:
            nxt = t.select("doc",
                           (F.col("pos") - 1).alias("pos"),
                           F.col("tok").alias("_tok2"))
            g = (t.join(nxt, on=["doc", "pos"])
                 .select("doc", F.concat_ws(" ", "tok", "_tok2")
                         .alias("gram")))
        return g.groupBy("doc", "gram").agg(
            F.count("*").cast("long").alias("n"))

    parts = []
    for n in (1, 2):
        c = grams(cand_t, n)
        r = grams(ref_t, n).withColumnRenamed("n", "n_ref")
        j = c.join(r, on=["doc", "gram"], how="left").select(
            F.col("n").alias("den"),
            F.least(F.col("n"), F.coalesce("n_ref", F.lit(0)))
            .alias("num"),
        )
        parts.append(j.agg(
            F.coalesce(F.sum("num"), F.lit(0)).cast("long")
            .alias("p{}_num".format(n)),
            F.coalesce(F.sum("den"), F.lit(0)).cast("long")
            .alias("p{}_den".format(n)),
        ))
    nd = df.agg(F.count("*").cast("long").alias("n_docs"))
    from ._util import attach_scalar

    out = attach_scalar(attach_scalar(nd, parts[0]), parts[1])
    return out.select(
        "n_docs",
        "p1_num", "p1_den",
        F.when(F.col("p1_den") > 0,
               F.expr("cast(div(cast(p1_num as decimal(38,0)) * 1000000,"
                      " p1_den) as bigint)")).alias("p1_ppm"),
        "p2_num", "p2_den",
        F.when(F.col("p2_den") > 0,
               F.expr("cast(div(cast(p2_num as decimal(38,0)) * 1000000,"
                      " p2_den) as bigint)")).alias("p2_ppm"),
    )


#: C0 control characters EXCEPT tab/newline/carriage-return (legitimate
#: in text) — the mojibake/binary-leak tell.
CONTROL_CHARS = "".join(
    chr(c) for c in list(range(1, 9)) + [11, 12] + list(range(14, 32)))


def garbage_signals(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    multibyte_threshold_ppm: int = 300_000) -> DataFrame:
    """Encoding-garbage / mojibake screen per document — the curation
    filter that catches binary leakage, double-decoded text, and
    replacement-char damage before it poisons a corpus:

        n_chars, n_bytes      exact char / utf-8 byte lengths
        multibyte_bytes       n_bytes - n_chars (0 for pure ASCII)
        control_n             C0 control chars except \\t \\n \\r
        repl_n                U+FFFD replacement characters
        is_garbage            control_n > 0 OR repl_n > 0 OR
                              multibyte_bytes * 1e6 >
                              threshold_ppm * n_bytes

    Counting is the code_signals discipline — ``length`` /
    ``octet_length`` / ``translate``-strip / ``replace``-strip: exact,
    locale-free, regex-free, byte-identical across engines.  The
    multibyte share is a *density* signal (legitimate non-Latin text
    also scores high — the threshold is a routing knob, not a verdict;
    pair with text_langid).  Empty documents report zeros / false.

    Scale shape: pure narrow codegen projection — zero shuffles, zero
    joins, zero python.
    """
    t = F.col(text_col)
    n = F.length(t).cast("long")
    nb = F.octet_length(t).cast("long")
    ctrl = (F.length(t)
            - F.length(F.translate(t, CONTROL_CHARS, ""))).cast("long")
    repl = (F.length(t)
            - F.length(F.replace(t, F.lit("�"), F.lit("")))
            ).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_chars"), nb.alias("n_bytes"),
        (nb - n).alias("multibyte_bytes"),
        ctrl.alias("control_n"), repl.alias("repl_n"),
    )
    return base.select(
        "doc_id", "n_chars", "n_bytes", "multibyte_bytes", "control_n",
        "repl_n",
        ((F.col("control_n") > 0) | (F.col("repl_n") > 0)
         | (F.col("multibyte_bytes") * 1000000
            > F.lit(int(multibyte_threshold_ppm)) * F.col("n_bytes")))
        .alias("is_garbage"),
    )


def lexicon_score(
    docs: DataFrame,
    positive,
    negative,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rule-based lexicon scoring per document — the weak-labeling /
    Snorkel-style annotation stage that bootstraps classifier training
    data before any model exists: count occurrences of two (bounded,
    broadcast-literal) word lists and emit an exact polarity score:

        doc_id, n_tokens, pos_n, neg_n
        net_ppm = floor_signed(1e6 * (pos_n - neg_n) / n_tokens)
                  (explicit floor — negative when negatives dominate)
        label   = 'pos' / 'neg' / 'neutral' (sign of pos_n - neg_n)

    Matching is exact lower-cased whitespace tokens (the repo-standard
    tokenization — no substring false hits), so both engines count
    identically.  NULL ppm for empty documents.

    Scale shape: one tokenized explode + ONE map-side-combined per-doc
    aggregate with two literal-``isin`` conditional sums (whole-stage
    codegen; the lexicons are expression literals, never a join); a
    LEFT join back to the doc spine charges zero-token docs.
    """
    pos = sorted({w.lower() for w in positive})
    neg = sorted({w.lower() for w in negative})
    if not pos or not neg:
        raise ValueError("need non-empty positive and negative lexicons")
    if set(pos) & set(neg):
        raise ValueError("lexicons overlap")
    t = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    toks = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(t).alias("w"))
        .filter(F.col("w") != "")
    )
    agg = toks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("w").isin(pos), 1).otherwise(0)).cast("long")
        .alias("pos_n"),
        F.sum(F.when(F.col("w").isin(neg), 1).otherwise(0)).cast("long")
        .alias("neg_n"),
    )
    spine = docs.select(F.col(id_col).alias("doc_id"))
    j = spine.join(agg, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("pos_n", F.lit(0)).cast("long").alias("pos_n"),
        F.coalesce("neg_n", F.lit(0)).cast("long").alias("neg_n"),
    )
    num = "(cast(1000000 as bigint) * (pos_n - neg_n))"
    den = "n_tokens"
    return j.select(
        "doc_id", "n_tokens", "pos_n", "neg_n",
        F.when(F.col("n_tokens") > 0,
               F.expr("cast(div({v} - pmod({v}, {m}), {m}) as bigint)"
                      .format(v=num, m=den))).alias("net_ppm"),
        F.when(F.col("pos_n") > F.col("neg_n"), F.lit("pos"))
        .when(F.col("pos_n") < F.col("neg_n"), F.lit("neg"))
        .otherwise(F.lit("neutral")).alias("label"),
    )
