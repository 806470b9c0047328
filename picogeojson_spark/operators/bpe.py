"""Distributed BPE tokenizer trainer: merge-rule induction over a corpus.

Tokenizer induction is a first-class training-data-pipeline step (Sennrich
et al. 2016): learn the ``n_merges`` most frequent symbol pairs over the
corpus vocabulary, merging as you go. The classic trainer's shape ports
cleanly to Spark: ONE corpus-sized shuffle builds the word-frequency table,
and every merge round after that touches only the (much smaller, cached)
vocabulary — pair counting is a vocab-sized aggregate and the argmax is a
1-row driver collect per round, exactly the k-means-quantizer precedent.

Merge semantics (deterministic, engine-identical): a word's symbol sequence
is a single-space-joined, space-padded string (``" l o w "``); merging pair
(a, b) is ONE leftmost-non-overlapping ``replace(sym, " a b ", " ab ")``
pass. Both Spark and DuckDB scan left to right and resume after each
replacement, so the two engines agree bit-for-bit. This differs from
textbook BPE only on runs of a repeated symbol (the shared separator space
is consumed, so ``a a a a`` merges once per pass, not twice) — a documented
divergence that never changes which pair is learned on natural text, and
determinism, not textbook purity, is the contract here.

Tie-break: pair count DESC, then left symbol ASC, right symbol ASC — total
order, replayed by the oracle's ``ORDER BY ... LIMIT 1``.

Tokens are restricted to ``[a-z]+`` runs of the lowercased text so the
character segmentation (``regexp_extract_all(w, '.')``) is trivially
identical across engines and merged symbols can be embedded verbatim in
replace patterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WORD_RE = "[a-z]+"

_PAIRS_EXPR = (
    "explode(zip_with("
    "  slice(split(trim(sym), ' '), 1, size(split(trim(sym), ' ')) - 1),"
    "  slice(split(trim(sym), ' '), 2, size(split(trim(sym), ' ')) - 1),"
    "  (x, y) -> struct(x AS l, y AS r))) AS pr"
)


def _local_train_merges(vocab, n_merges):
    """Exact serial BPE over a collected ``[(sym, freq), ...]`` vocabulary.

    Bit-identical to the distributed per-round loop (same pair counting,
    same (count DESC, l ASC, r ASC) argmax, same leftmost-non-overlapping
    replace — Python ``str.replace`` scans the original string left to
    right and resumes after each match, exactly like Spark/DuckDB
    ``replace``), pinned by a parity test. Incremental implementation:
    pair counts live in a dict, only words containing the merged pair are
    reprocessed (inverted pair->word index), and the argmax is a lazy
    min-heap on ``(-count, l, r)`` with stale entries skipped — the
    textbook fast trainer, O(changed words) per round instead of a full
    recount.
    """
    import heapq
    from collections import Counter, defaultdict

    syms = [s for s, _ in vocab]
    freqs = [f for _, f in vocab]

    def pairs_of(sym):
        toks = sym.strip().split(" ")
        return list(zip(toks, toks[1:]))

    pair_counts = Counter()
    index = defaultdict(set)
    for wid, s in enumerate(syms):
        f = freqs[wid]
        for pr in pairs_of(s):
            pair_counts[pr] += f
            index[pr].add(wid)
    heap = [(-c, l, r) for (l, r), c in pair_counts.items()]
    heapq.heapify(heap)

    merges = []
    for i in range(n_merges):
        best = None
        while heap:
            negc, l, r = heap[0]
            if -negc > 0 and pair_counts.get((l, r), 0) == -negc:
                best = (l, r, -negc)
                break
            heapq.heappop(heap)  # stale (count changed) or zeroed
        if best is None:
            break
        l, r, cnt = best
        merges.append((i + 1, l, r, cnt))
        pat = " {} {} ".format(l, r)
        rep = " {} ".format(l + r)
        for wid in list(index.get((l, r), ())):
            s = syms[wid]
            if pat not in s:
                index[(l, r)].discard(wid)  # stale from an earlier merge
                continue
            f = freqs[wid]
            old = Counter(pairs_of(s))
            new_s = s.replace(pat, rep)
            new = Counter(pairs_of(new_s))
            for pr in set(old) | set(new):
                d = new.get(pr, 0) - old.get(pr, 0)
                if d:
                    c2 = pair_counts[pr] + d * f
                    pair_counts[pr] = c2
                    heapq.heappush(heap, (-c2, pr[0], pr[1]))
                if new.get(pr, 0) > 0:
                    index[pr].add(wid)
            syms[wid] = new_s
    return merges


def bpe_train(docs: DataFrame, n_merges: int = 8,
              text_col: str = "text",
              local_vocab_budget: int = 2_000_000) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules; returns
    ``(merge_idx, left_sym, right_sym, pair_count)`` ordered by merge_idx.

    Stops early (fewer rows) if the vocabulary runs out of pairs. The
    returned table is driver-built — n_merges rows, the learned artifact a
    tokenizer ships.

    Scale shape: the only corpus-sized work is ONE shuffle building the
    word-frequency table; everything after is lexicon-sized. When the
    distinct-word count fits ``local_vocab_budget`` the merge loop runs as
    an exact local trainer over the collected vocabulary (the standard
    practice of production tokenizer trainers — SentencePiece and the like
    train over word counts, not the corpus), so ``n_merges=32000`` costs
    O(1) Spark jobs instead of one driver round-trip per merge. Vocabularies
    over budget fall back to the distributed per-round loop (one vocab-sized
    aggregate + 1-row collect per merge). Exact multi-merge batching inside
    one job is NOT possible in general: serial BPE chains — merging (t, h)
    immediately creates (th, e), which typically wins the very next round,
    so any batch of independently-chosen pairs diverges from the serial
    contract; the two paths here are both exactly serial and are pinned
    equal by a parity test.
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    spark = docs.sparkSession
    words = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(_WORD_RE), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    vocab = words.select(
        "freq",
        F.concat(
            F.lit(" "),
            F.array_join(
                F.regexp_extract_all(F.col("w"), F.lit("."), 0), " "),
            F.lit(" "),
        ).alias("sym"),
    ).persist()
    n_vocab = vocab.count()

    if n_vocab <= local_vocab_budget:
        try:
            rows = vocab.select("sym", "freq").collect()
        finally:
            vocab.unpersist()
        merges = _local_train_merges(
            [(r["sym"], int(r["freq"])) for r in rows], n_merges)
        return spark.createDataFrame(
            merges,
            "merge_idx int, left_sym string, right_sym string, "
            "pair_count long",
        ).orderBy("merge_idx")

    merges = []
    prev = vocab
    # One job per round: the argmax collect both reads and (on its first
    # touch) populates the current vocab's cache, so the previous round's
    # vocab is released one round LATE (after its successor has
    # materialized) instead of paying a dedicated count() job per round
    # just to make an eager hand-off safe.
    pending = None
    try:
        for i in range(n_merges):
            best = (
                prev.selectExpr("freq", _PAIRS_EXPR)
                .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
                .agg(F.sum("freq").cast("long").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if pending is not None:
                pending.unpersist()
                pending = None
            if not best:
                break
            l, r, cnt = best[0]["l"], best[0]["r"], best[0]["cnt"]
            merges.append((i + 1, l, r, cnt))
            if i + 1 < n_merges:
                nxt = prev.withColumn(
                    "sym",
                    F.expr(
                        "replace(sym, ' {l} {r} ', ' {lr} ')".format(
                            l=l, r=r, lr=l + r)
                    ),
                ).persist()
                pending, prev = prev, nxt
    finally:
        if pending is not None:
            pending.unpersist()
        prev.unpersist()

    return spark.createDataFrame(
        merges,
        "merge_idx int, left_sym string, right_sym string, pair_count long",
    ).orderBy("merge_idx")


def bpe_apply(docs: DataFrame, merges, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Apply learned merge rules to every document: per-doc subword
    statistics ``(doc_id, n_words, n_subwords)``.

    ``merges`` is the collected rule list ``[(left, right), ...]`` in learn
    order (or the DataFrame from ``bpe_train``). The merge chain compiles
    to nested ``replace`` expressions over the padded symbol string — pure
    whole-stage codegen, no UDF, no join: the rules ride the plan the way
    a broadcast tokenizer model would.
    """
    if isinstance(merges, DataFrame):
        merges = [(r["left_sym"], r["right_sym"])
                  for r in merges.orderBy("merge_idx").collect()]
    sym = ("concat(' ', array_join(regexp_extract_all(w, '.', 0), ' '), ' ')")
    for l, r in merges:
        sym = "replace({s}, ' {l} {r} ', ' {lr} ')".format(
            s=sym, l=l, r=r, lr=l + r)
    per_word = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(_WORD_RE), 0)
            ).alias("w"),
        )
        .selectExpr(
            "doc_id",
            "size(split(trim({s}), ' ')) AS n_sub".format(s=sym),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(
            per_word.groupBy("doc_id").agg(
                F.count("*").cast("long").alias("n_words"),
                F.sum("n_sub").cast("long").alias("n_subwords"),
            ),
            "doc_id", "left",
        )
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0).cast("long")).alias("n_words"),
            F.coalesce("n_subwords", F.lit(0).cast("long"))
            .alias("n_subwords"),
        )
    )


def bpe_train_oracle_sql(source_sql: str, n_merges: int = 8) -> str:
    """DuckDB replay of ``bpe_train``: the n_merges rounds unrolled as a
    CTE chain (pair counts -> ORDER BY/LIMIT-1 argmax -> replace), same
    construction as the pagerank oracle."""
    parts = [f"""
WITH src AS ({source_sql}),
words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(regexp_extract_all(lower(text), '{_WORD_RE}')) AS w
        FROM src)
  GROUP BY w),
v0 AS (
  SELECT freq,
         ' ' || array_to_string(regexp_extract_all(w, '.'), ' ') || ' '
           AS sym
  FROM words)"""]
    for i in range(1, n_merges + 1):
        parts.append(f""",
px{i} AS (
  SELECT freq,
         unnest(list_transform(range(1, len(toks)),
                j -> struct_pack(l := toks[j], r := toks[j + 1]))) AS pr
  FROM (SELECT freq, string_split(trim(sym), ' ') AS toks
        FROM v{i - 1})),
b{i} AS (
  SELECT pr.l AS l, pr.r AS r, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM px{i} GROUP BY pr.l, pr.r
  ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
v{i} AS (
  SELECT freq,
         replace(sym, ' ' || b{i}.l || ' ' || b{i}.r || ' ',
                 ' ' || b{i}.l || b{i}.r || ' ') AS sym
  FROM v{i - 1} CROSS JOIN b{i})""")
    sel = "\nUNION ALL\n".join(
        "SELECT {i} AS merge_idx, l AS left_sym, r AS right_sym, "
        "cnt AS pair_count FROM b{i}".format(i=i)
        for i in range(1, n_merges + 1)
    ) or "SELECT 1 AS merge_idx, '' AS left_sym, '' AS right_sym, " \
         "CAST(0 AS BIGINT) AS pair_count WHERE FALSE"
    parts.append("\nSELECT * FROM (\n{}\n) ORDER BY merge_idx".format(sel))
    return "".join(parts)
