"""Deduplication operators for large text corpora.

All hash functions are expression-level (``sha2``/``md5`` — identical
built-ins exist in DuckDB), so every operator here is deterministic,
SQL-checkable, and runs entirely JVM-side until the final (small) pair set.

Scale notes:

- exact dedup: one hash-shuffle on a 64-hex digest;
- n-gram Jaccard: shingle-explode + self-equi-join on the shingle — the
  classic scalable plan; pass ``max_df`` to drop ubiquitous shingles (bounds
  the join blowup at corpus scale; disabled by default so output matches the
  exact SQL oracle);
- MinHash/LSH: one groupBy computes the whole signature (num_hashes mins in a
  single shuffle), band keys bucket candidates, exact Jaccard verifies — the
  verify step makes the *output* exact while LSH only gates the work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


from ._util import spread_small_scans as _spread


def _raw_shingles(docs: DataFrame, n: int, id_col: str,
                  text_col: str, spread: bool = False) -> DataFrame:
    """All word n-gram shingle occurrences per document (duplicates kept).

    ``spread=True`` lifts tiny scan inputs onto all cores BEFORE the
    explode — worth it only when heavy per-shingle compute (minhash's
    num_hashes x md5) runs pre-shuffle; the plain jaccard path is
    shuffle-bound (its distinct/self-join exchanges already redistribute)
    and measured faster without the extra repartition."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    src = _spread(docs) if spread else docs
    d = src.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    d = d.withColumn("n_toks", F.size("toks")).filter(F.col("n_toks") >= n)
    idx = F.sequence(F.lit(0), F.col("n_toks") - n)
    shingle = F.array_join(
        F.slice(F.col("toks"), F.col("i") + 1, n), " "
    )
    return (
        d.withColumn("i", F.explode(idx))
        .select("doc_id", shingle.alias("shingle"))
    )


def shingles_df(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per document (lower-cased, whitespace
    tokenized — same normalization the SQL oracle applies)."""
    return _raw_shingles(docs, n, id_col, text_col).distinct()


def shingle_arrays(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, shingles array<string>, sz): per-doc DISTINCT word n-grams.

    Built as explode -> ``collect_set`` (one shuffle of the shingle rows)
    rather than an in-row ``transform(...)`` lambda. The in-row shape looks
    shuffle-free, but Catalyst's CollapseProject inlines the ``split(text)``
    tokenization INTO the lambda, and higher-order functions evaluate
    interpreted — the split then re-runs once per shingle element, an
    O(tokens^2) regex blowup per document (caught by stack-sampling: all
    time in ArrayTransform.nullSafeEval -> StringSplit). The exploded
    formulation stays in whole-stage codegen end to end; element ORDER in
    ``shingles`` is not defined (callers use it only for set intersection /
    size, both order-independent)."""
    sh = _raw_shingles(docs, n, id_col, text_col)
    return sh.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("shingles")
    ).withColumn("sz", F.size("shingles"))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents -> (rep_id, dup_id) pairs.

    Window formulation — the representative id is carried to each member
    row, never materializing a group as one array: a pathologically hot
    hash (e.g. millions of empty documents in a web crawl) streams through
    like any other window partition instead of building a single
    multi-million-element collect_list row."""
    from pyspark.sql import Window

    h = docs.select(
        F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("h")
    )
    w = Window.partitionBy("h")
    return (
        h.withColumn("rep_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("rep_id"))
        .select("rep_id", F.col("doc_id").alias("dup_id"))
    )


def duplicate_clusters(pairs: DataFrame, src: str = "doc_a",
                       dst: str = "doc_b", max_iters: int = 100) -> DataFrame:
    """Transitive duplicate clusters: connected components over an
    undirected pair graph -> one ``(doc_id, rep_id)`` row per graph node,
    ``rep_id`` = the smallest id in the node's component (representatives
    map to themselves; documents with no duplicate pair never enter the
    graph and are implicitly their own representative).

    Pair emitters (``minhash_lsh_pairs``, ``ngram_jaccard_pairs``,
    ``exact_duplicates``) are not a dedup policy by themselves — similarity
    is not transitive, so a corpus-level "keep one per group" needs the
    components of the pair graph, not the pairs.

    Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond") — O(log n) rounds on
    any graph, and each round is TWO passes of groupBy-min + equi-join.
    The per-node minimum is an aggregate and neighbors re-attach by join,
    so no adjacency list is ever materialized: a component with millions
    of members streams through like any other key instead of building one
    giant collect_list row. Every round's edge set is localCheckpointed —
    iterative lineage otherwise grows unboundedly and re-executes from the
    source on every convergence probe.
    """
    # lazy checkpoints throughout: the count() that every round needs for
    # the convergence probe doubles as the materializer, so each round is
    # ONE job instead of an eager-checkpoint job plus a count job.
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def large_star(e):
        # for every node u: attach all LARGER neighbors to m(u) = min of
        # the closed neighborhood. Symmetrize so each endpoint plays u.
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        m = F.least(F.col("u"), F.col("mv")).alias("m")
        return (
            sym.join(mins, on="u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e):
        # key every edge by its larger endpoint; attach the smaller
        # neighbors AND the node itself to the minimum of that set
        t = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = t.groupBy("u").agg(F.min("v").alias("mv"))
        attach_self = mins.select(F.col("u").alias("u"), F.col("mv").alias("v"))
        attach_nbrs = (
            t.join(mins, on="u")
            .select(F.col("v").alias("u"), F.col("mv").alias("v"))
        )
        return (
            attach_nbrs.union(attach_self)
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    n_edges = edges.count()
    for _ in range(max_iters):
        nxt = small_star(large_star(edges)).localCheckpoint(eager=False)
        # converged when the (distinct) edge sets are identical — at that
        # point the edges ARE the component stars (child -> component min).
        # One count job per round (the previous round's count is carried);
        # the exact exceptAll probe only runs when the counts match, which
        # for this monotone iteration is the convergence round itself.
        n_nxt = nxt.count()
        if n_nxt == n_edges and nxt.exceptAll(edges).isEmpty():
            edges = nxt
            break
        edges, n_edges = nxt, n_nxt
    else:
        raise RuntimeError(
            "duplicate_clusters did not converge in {} rounds".format(max_iters)
        )

    nodes = (
        pairs.select(F.col(src).alias("doc_id"))
        .union(pairs.select(F.col(dst).alias("doc_id")))
        .distinct()
    )
    stars = edges.select(F.col("u").alias("doc_id"), F.col("v").alias("rep"))
    return (
        nodes.join(stars, on="doc_id", how="left")
        .select(
            "doc_id", F.coalesce(F.col("rep"), F.col("doc_id")).alias("rep_id")
        )
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        max_df: int = None,
                        cache: str = "none") -> DataFrame:
    """Exact n-gram Jaccard similar pairs (doc_a < doc_b, jaccard >= t).

    Emits jaccard scaled to an exact rational check: output columns are the
    integer intersection / union sizes (floats avoided entirely).

    The distinct shingle table feeds THREE consumers (both self-join sides
    and the per-doc sizes). ``cache="none"`` (default) recomputes the
    tokenize-explode-distinct subtree per consumer — measured FASTER than
    materializing, because the shingle table is several times the corpus
    size (unlike minhash's tiny signatures) and recompute from a columnar
    scan is cheap. Pass ``cache="checkpoint"`` when the input itself is an
    expensive derived pipeline worth computing only once.
    """
    sh = shingles_df(docs, n)
    if max_df is not None:
        keep = sh.groupBy("shingle").agg(F.count("*").alias("df")).filter(
            F.col("df") <= max_df
        )
        sh = sh.join(keep.select("shingle"), on="shingle")
    if cache == "checkpoint":
        sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter_sz"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("sz", "sz_a"), on="doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sz", "sz_b"), on="doc_b")
        .withColumn("union_sz", F.col("sz_a") + F.col("sz_b") - F.col("inter_sz"))
    )
    # jaccard >= t  <=>  inter >= t * union  (kept integral: inter/union emitted)
    return out.filter(
        F.col("inter_sz") >= F.lit(threshold) * F.col("union_sz")
    ).select("doc_a", "doc_b", "inter_sz", "union_sz")


def minhash_signatures(docs: DataFrame, n: int = 3,
                       num_hashes: int = 16) -> DataFrame:
    """MinHash signature per doc: sig_i = min(md5(i || ':' || shingle)).

    One shuffle computes all ``num_hashes`` components (agg list), and md5 is
    available verbatim in the SQL oracle. Shingle duplicates are NOT
    deduplicated first: ``min()`` over a multiset equals ``min()`` over its
    set, so the values are identical and the distinct()'s full shuffle of
    every shingle row is skipped — the only exchange left is the per-doc
    partial-min shuffle (``num_hashes`` hex digests per doc per map task).
    """
    sh = _raw_shingles(docs, n, "doc_id", "text", spread=True)
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(i)), F.lit(":"), F.col("shingle")))).alias(
            "sig_{}".format(i)
        )
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, num_hashes: int = 16,
                      bands: int = 4, threshold: float = 0.5,
                      cache: str = "checkpoint") -> DataFrame:
    """LSH-bucketed candidate pairs, exact-verified by n-gram Jaccard.

    Output == { (a,b) : LSH band collision } ∩ { jaccard >= t }, both sides
    deterministic, so the SQL oracle reproduces it exactly.

    ``cache`` controls the signature table: the band self-join consumes it
    on BOTH sides, and without materialization Spark recomputes the whole
    shingle-explode + num_hashes x md5 subtree twice (exchange reuse does
    not survive AQE's per-side re-optimization here). "checkpoint"
    (default) eagerly localCheckpoints the signatures — num_hashes hex
    digests per doc, orders of magnitude smaller than the corpus, so the
    materialization is cheap at any scale; "none" keeps the plan fully lazy
    (lineage-preserving, for resume-from-checkpoint pipelines that manage
    their own persistence)."""
    sigs = minhash_signatures(docs, n, num_hashes)
    if cache == "checkpoint":
        sigs = sigs.localCheckpoint(eager=True)
    banded = minhash_band_keys(sigs, num_hashes, bands)
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), on=["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    if cache == "checkpoint":
        # the pair table is consumed three times below (id extraction + the
        # two verify joins); materializing it also hands AQE its exact size,
        # so the verify joins broadcast whenever candidates are few
        cand = cand.localCheckpoint(eager=True)
    # exact verify on CANDIDATES ONLY: join each pair to its two (distinct)
    # shingle arrays and intersect JVM-side. The naive alternative — the
    # full ngram_jaccard_pairs self-join — scores every co-shingled pair in
    # the corpus, which is exactly the quadratic work LSH exists to avoid;
    # this path's cost is O(candidates), and the LSH sketch only ever
    # GATES work (output still exactly { band collision } ∩ { jaccard>=t }).
    # Shingle arrays are built ONLY for docs that appear in some candidate
    # pair (semi-join first): after LSH gating that is a small fraction of
    # the corpus, so the in-row shingle-array construction — the priciest
    # per-row expression here — never touches the non-candidate majority.
    cand_ids = cand.select(
        F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    ).distinct()
    arrs = shingle_arrays(docs.join(cand_ids, on="doc_id", how="semi"), n)
    a = arrs.select(F.col("doc_id").alias("doc_a"),
                    F.col("shingles").alias("sh_a"), F.col("sz").alias("sz_a"))
    b = arrs.select(F.col("doc_id").alias("doc_b"),
                    F.col("shingles").alias("sh_b"), F.col("sz").alias("sz_b"))
    scored = (
        cand.join(a, on="doc_a")
        .join(b, on="doc_b")
        .withColumn("inter_sz",
                    F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
                    .cast("long"))
        .withColumn("union_sz", F.col("sz_a").cast("long")
                    + F.col("sz_b").cast("long") - F.col("inter_sz"))
    )
    return scored.filter(
        F.col("inter_sz") >= F.lit(threshold) * F.col("union_sz")
    ).select("doc_a", "doc_b", "inter_sz", "union_sz")


def simhash(docs: DataFrame, bits: int = 32, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Per-document SimHash over lower-cased whitespace tokens.

    Token hash = first 8 hex chars of md5 as an integer (``conv``), giving a
    32-bit hash whose bits vote ±1; the sign vector packs into ``simhash``.
    """
    toks = F.explode(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ).alias("tok")
    t = docs.select(F.col(id_col).alias("doc_id"), toks)
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    t = t.withColumn("h", h)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), k).bitwiseAND(F.lit(1)) == 1, 1
                   ).otherwise(-1)
        ).alias("v{}".format(k))
        for k in range(bits)
    ]
    agg = t.groupBy("doc_id").agg(*votes)
    sim = F.lit(0).cast("long")
    for k in range(bits):
        sim = sim + F.when(F.col("v{}".format(k)) > 0,
                           F.lit(2**k).cast("long")).otherwise(F.lit(0))
    return agg.select("doc_id", sim.alias("simhash"))


def fingerprint(docs: DataFrame, n: int = 5) -> DataFrame:
    """Document fingerprint: lexicographic min/max of n-gram md5s — a stable
    content signature that survives reordering-free edits."""
    sh = shingles_df(docs, n)
    return sh.groupBy("doc_id").agg(
        F.min(F.md5("shingle")).alias("fp_min"),
        F.max(F.md5("shingle")).alias("fp_max"),
        F.count("*").alias("n_shingles"),
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 3, bits: int = 16,
                  bands: int = 4, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Near-dup pairs by SimHash: (doc_a < doc_b, hamming) with hamming
    distance between the two ``bits``-bit simhashes at most ``max_hamming``.

    Pigeonhole bucketing makes this EXACT, not approximate: the hash splits
    into ``bands`` contiguous bit blocks, and two hashes within distance d
    differ in at most d blocks — with ``bands >= d+1`` they therefore agree
    on at least one whole block, so the block equi-join surfaces every
    qualifying pair (zero recall loss) and ``bit_count(xor)`` verifies
    exactly. All JVM expressions end to end (simhash itself is one
    explode + groupBy); candidates << all pairs because a block match needs
    ``bits/bands`` identical bits, so the verify stays cheap at scale.
    """
    if bands <= max_hamming:
        raise ValueError(
            "bands must exceed max_hamming or the block join loses pairs"
        )
    w = bits // bands
    sh = simhash(docs, bits, id_col, text_col)
    blocks = []
    for b in range(bands):
        lo = b * w
        width = bits - lo if b == bands - 1 else w  # last block: remainder
        mask = (1 << width) - 1
        blocks.append(F.struct(
            F.lit(b).alias("blk"),
            F.shiftright(F.col("simhash"), lo).bitwiseAND(
                F.lit(mask)).alias("val"),
        ))
    banded = sh.select(
        "doc_id", "simhash", F.explode(F.array(*blocks)).alias("bk")
    ).select(
        "doc_id", "simhash",
        F.col("bk.blk").alias("blk"), F.col("bk.val").alias("val"),
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), on=["blk", "val"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def ngram_span_stats(docs: DataFrame, n: int = 8, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Cross-document duplicated-span statistics — the n-gram-granular form
    of substring deduplication (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): for every document, how many of
    its word ``n``-gram occurrences also appear in at least one OTHER
    document. Docs with a high ``dup_frac`` are boilerplate / templated /
    copied content even when no whole-document near-dup pair exists.

    Output: ``(doc_id, total_ngrams, dup_ngrams, dup_frac_x1e6)`` — one row
    per document with at least one n-gram (>= n tokens). Fractions are
    exact integers (x1e6 via integer division), so the SQL oracle matches
    bit-for-bit.

    Scale shape: this is the standard distributed formulation — explode
    n-gram occurrences, aggregate by gram (map-side partial agg), semi-join
    the duplicated-gram set back. No pairwise comparison ever happens: cost
    is O(corpus tokens) rows through two hash shuffles, and the duplicated
    gram set (usually a small fraction) broadcasts when small. The suffix
    array the single-node reference approach builds is replaced by gram
    hashing, the same trade the original paper's MapReduce variant makes.
    """
    occ = _raw_shingles(docs, n, id_col, text_col)
    per_doc = occ.groupBy("doc_id", "shingle").agg(
        F.count("*").alias("occ")
    )
    # a gram is "duplicated" when it appears in >= 2 distinct docs; per_doc
    # already has one row per (doc, gram) so a plain count is the doc count
    dup = per_doc.groupBy("shingle").agg(F.count("*").alias("ndocs")).filter(
        F.col("ndocs") >= 2
    ).select("shingle")
    tot = per_doc.groupBy("doc_id").agg(
        F.sum("occ").cast("long").alias("total_ngrams")
    )
    dup_occ = (
        per_doc.join(dup, on="shingle", how="semi")
        .groupBy("doc_id")
        .agg(F.sum("occ").cast("long").alias("dup_ngrams"))
    )
    return (
        tot.join(dup_occ, on="doc_id", how="left")
        .select(
            "doc_id",
            "total_ngrams",
            F.coalesce(F.col("dup_ngrams"), F.lit(0)).cast("long")
            .alias("dup_ngrams"),
            F.expr(
                "CAST((COALESCE(dup_ngrams, 0) * 1000000) div total_ngrams "
                "AS BIGINT)"
            ).alias("dup_frac_x1e6"),
        )
    )


def contamination_flags(train: DataFrame, benchmark: DataFrame, n: int = 8,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any word
    ``n``-gram with a held-out benchmark/eval set — the standard n-gram
    overlap decontamination check (GPT-3 appendix C / PaLM-style) run as a
    distributed semi-join instead of a bloom filter on one machine.

    Output: ``(doc_id, n_hits, contaminated)`` for EVERY train doc with at
    least one n-gram; ``n_hits`` counts the train doc's distinct n-grams
    that occur anywhere in the benchmark set.

    Scale shape: the benchmark gram set is tiny next to the corpus (eval
    suites are MBs, corpora are TBs) — Spark broadcasts it after the
    distinct, so the training side streams through map-side with no
    corpus-wide shuffle beyond the per-doc count aggregation.
    """
    t_grams = _raw_shingles(train, n, id_col, text_col).distinct()
    b_grams = (
        _raw_shingles(benchmark, n, id_col, text_col)
        .select("shingle").distinct()
    )
    hits = (
        t_grams.join(b_grams, on="shingle", how="semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    base = t_grams.groupBy("doc_id").agg(F.count("*").alias("_g")).select("doc_id")
    return (
        base.join(hits, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        )
        .withColumn("contaminated", F.col("n_hits") > 0)
    )


def hash_split(docs: DataFrame, fractions, id_col: str = "doc_id",
               buckets: int = 1000):
    """Deterministic dataset split (train/val/test) by content-independent
    id hash — the standard leakage-safe split for training corpora: a row's
    split depends only on its id, so re-running over a grown corpus never
    moves old rows between splits.

    ``fractions``: {"train": 0.9, "val": 0.05, "test": 0.05} (must sum to
    <= 1; the remainder is dropped). Buckets come from the md5 of the id —
    portable arithmetic, so the SQL oracle reproduces the assignment
    exactly. Returns the input plus a ``split`` column.
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError("fractions sum to {} > 1".format(total))
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % buckets
    )
    expr = F.lit(None).cast("string")
    hi = 0
    for name, frac in fractions.items():
        lo, hi = hi, hi + int(round(frac * buckets))
        expr = F.when((bucket >= lo) & (bucket < hi), F.lit(name)).otherwise(expr)
    return docs.withColumn("split", expr)


def minhash_band_keys(sigs: DataFrame, num_hashes: int = 16,
                      bands: int = 4) -> DataFrame:
    """(doc_id, band, key) LSH band table from a ``minhash_signatures``
    output — the banding step of ``minhash_lsh_pairs``, exposed so
    cross-corpus consumers (incremental dedup, streaming candidates) share
    one construction."""
    rows = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col("sig_{}".format(b * rows + r)) for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.concat(*parts).alias("key"))
        )
    return sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))


def dedup_against(existing: DataFrame, incoming: DataFrame, n: int = 3,
                  num_hashes: int = 16, bands: int = 4,
                  threshold: float = 0.5) -> DataFrame:
    """Incremental near-dup flagging: which INCOMING documents duplicate
    the EXISTING corpus — the nightly-crawl production flow, where the
    corpus is never re-self-joined; only the (small) increment probes it.

    Returns one row per flagged incoming doc:
    ``(doc_id, dup_of, inter_sz, union_sz)`` with ``dup_of`` the SMALLEST
    matching existing id (deterministic representative) and the sizes of
    that verified pair. Match = LSH band collision AND exact n-gram
    Jaccard >= threshold, the same candidates->verify contract as
    ``minhash_lsh_pairs`` (the sketch only gates work, never decides).

    Scale shape: the existing side's band keys are num_hashes hex digests
    per doc (build once, persist as a table in production — see
    ``build_ivf_index`` for the persistent-index pattern); the join is
    increment x corpus on (band, key) — an equi-join AQE can broadcast
    when the increment is small. Shingle arrays are built only for docs
    on either side of a surviving candidate (semi-join), so the exact
    verify never touches the non-candidate majority of the corpus.
    """
    ex_sigs = minhash_signatures(existing, n, num_hashes)
    in_sigs = minhash_signatures(incoming, n, num_hashes)
    ex_band = minhash_band_keys(ex_sigs, num_hashes, bands)
    in_band = minhash_band_keys(in_sigs, num_hashes, bands)
    cand = (
        in_band.select(F.col("doc_id").alias("inc_id"), "band", "key")
        .join(ex_band.select(F.col("doc_id").alias("ex_id"), "band", "key"),
              ["band", "key"])
        .select("inc_id", "ex_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    inc_ids = cand.select(F.col("inc_id").alias("doc_id")).distinct()
    ex_ids = cand.select(F.col("ex_id").alias("doc_id")).distinct()
    a = shingle_arrays(incoming.join(inc_ids, "doc_id", "semi"), n).select(
        F.col("doc_id").alias("inc_id"),
        F.col("shingles").alias("sh_i"), F.col("sz").alias("sz_i"))
    b = shingle_arrays(existing.join(ex_ids, "doc_id", "semi"), n).select(
        F.col("doc_id").alias("ex_id"),
        F.col("shingles").alias("sh_e"), F.col("sz").alias("sz_e"))
    scored = (
        cand.join(a, "inc_id").join(b, "ex_id")
        .withColumn("inter_sz",
                    F.size(F.array_intersect(F.col("sh_i"), F.col("sh_e")))
                    .cast("long"))
        .withColumn("union_sz", F.col("sz_i").cast("long")
                    + F.col("sz_e").cast("long") - F.col("inter_sz"))
        .filter(F.col("inter_sz") >= F.lit(threshold) * F.col("union_sz"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("inc_id").orderBy(F.asc("ex_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("inc_id").alias("doc_id"),
            F.col("ex_id").alias("dup_of"),
            "inter_sz", "union_sz",
        )
    )


def prefix_jaccard_pairs(docs: DataFrame, n: int = 3,
                         t_num: int = 4, t_den: int = 5,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Exact n-gram Jaccard pairs via AllPairs/PPJoin prefix filtering.

    Same output contract as :func:`ngram_jaccard_pairs` — every pair with
    ``jaccard >= t_num/t_den`` (doc_a < doc_b, integer inter/union emitted) —
    but candidate generation joins only each document's PREFIX shingles
    instead of self-joining the full shingle table.

    Prefix theorem (Bayardo et al. AllPairs / Xiao et al. PPJoin): order all
    shingles by a global total order (ascending document frequency, shingle
    string as tie-break).  With prefix length ``p_X = |X| - ceil(t*|X|) + 1``,
    any pair with ``J(A,B) >= t`` shares its smallest common shingle inside
    BOTH prefixes: ``J >= t`` implies ``|A∩B| >= ceil(t*max(|A|,|B|))``, so
    the minimum element of ``A∩B`` has rank ``<= |X| - ceil(t*|X|) + 1`` in
    each side.  Candidates are therefore complete, and the exact
    ``array_intersect`` verify makes the output identical to the brute plan.

    Scale shape (the reason this exists next to ``ngram_jaccard_pairs``): at
    ``t = 0.8`` the prefix is ~20% of each document's shingles, and —
    because the global order is df-ASCENDING — those are its RAREST
    shingles, so the equi-join fan-out collapses.  The classic plan's
    worst-case blowup (a stop-shingle shared by every document) never enters
    the join.  A symmetric length filter (``t*max(sz) <= min(sz)``) prunes
    candidates before the verify.  All threshold math is integer rational
    (``t_num/t_den``) on both engines — no float boundary ambiguity.

    Shuffles: shingle distinct, df aggregate (vocab-sized), df join-back,
    one per-doc window (rank by rarity), prefix self-join, candidate
    distinct, two array joins — every post-prefix stage is bounded by the
    candidate count, never by |corpus|^2.
    """
    from pyspark.sql import Window

    if not (0 < t_num <= t_den):
        raise ValueError("threshold must satisfy 0 < t_num/t_den <= 1")
    sh = shingles_df(docs, n, id_col, text_col)
    df_tab = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked_w = Window.partitionBy("doc_id").orderBy(
        F.asc("df"), F.asc("shingle")
    )
    size_w = Window.partitionBy("doc_id")
    ranked = (
        sh.join(df_tab, on="shingle")
        .withColumn("rank", F.row_number().over(ranked_w))
        .withColumn("sz", F.count("*").over(size_w))
    )
    # ceil(t*sz) in exact integer arithmetic: floor((t_num*sz + t_den-1)/t_den)
    ceil_t_sz = (F.col("sz") * t_num + (t_den - 1)).cast("long") / F.lit(t_den)
    prefix_len = F.col("sz") - F.floor(ceil_t_sz) + 1
    prefix = ranked.filter(F.col("rank") <= prefix_len).select(
        "doc_id", "shingle", "sz"
    )
    a = prefix.select(F.col("doc_id").alias("doc_a"), "shingle",
                      F.col("sz").alias("sz_a"))
    b = prefix.select(F.col("doc_id").alias("doc_b"), "shingle",
                      F.col("sz").alias("sz_b"))
    cand = (
        a.join(b, on="shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        # length filter: J >= t forces t*max(sz) <= min(sz)
        .filter(
            F.greatest("sz_a", "sz_b") * t_num
            <= F.least("sz_a", "sz_b") * t_den
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    arrs = shingle_arrays(docs, n, id_col, text_col)
    out = (
        cand.join(
            arrs.select(F.col("doc_id").alias("doc_a"),
                        F.col("shingles").alias("sh_a"),
                        F.col("sz").alias("sz_a")),
            on="doc_a",
        )
        .join(
            arrs.select(F.col("doc_id").alias("doc_b"),
                        F.col("shingles").alias("sh_b"),
                        F.col("sz").alias("sz_b")),
            on="doc_b",
        )
        .withColumn("inter_sz", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("union_sz",
                    F.col("sz_a") + F.col("sz_b") - F.col("inter_sz"))
        .filter(F.col("inter_sz") * t_den >= F.col("union_sz") * t_num)
    )
    return out.select("doc_a", "doc_b", "inter_sz", "union_sz")


def ed1_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "name",
) -> DataFrame:
    """Fuzzy entity-resolution join at edit distance <= 1 via the
    SymSpell deletion-neighborhood block: every string explodes to
    itself plus its len(s) single-character deletions; two strings
    within Levenshtein distance 1 PROVABLY share a variant (equal ->
    trivially; substitution at i -> delete i from both; insert/delete
    -> delete the extra char from the longer side), so the block is
    complete — never an all-pairs comparison.  Candidates sharing a
    variant key are refine-verified with the exact built-in
    ``levenshtein`` (JVM-side).  Returns ``(id_a, id_b, ed)`` with
    ``id_a < id_b`` and ``ed`` in {0, 1}.

    Scale shape: the explode is len(s)+1 rows per string (names are
    short — bounded); the ONE shuffle is the variant-key self equi-join,
    whose fan-out is quadratic only in per-key collision counts (the
    colocation/basket bound); dedup to distinct id pairs BEFORE the
    levenshtein refine so each candidate pair is scored once.  Higher
    d generalizes via d-fold deletion neighborhoods (not implemented —
    the block grows len^d).
    """
    s = docs.select(F.col(id_col).alias("id"),
                    F.col(text_col).alias("name"))
    keys = s.select(
        "id", "name",
        # sequence(1, 0) DESCENDS in Spark — guard zero-length names.
        F.explode(F.expr(
            "CASE WHEN length(name) = 0 THEN array(name) ELSE"
            " array_union(array(name), transform(sequence(1, length(name)),"
            " i -> concat(substring(name, 1, i - 1),"
            " substring(name, i + 1, length(name))))) END")).alias("k"),
    )
    a = keys.select(F.col("id").alias("id_a"),
                    F.col("name").alias("name_a"), "k")
    b = keys.select(F.col("id").alias("id_b"),
                    F.col("name").alias("name_b"), "k")
    cand = (
        a.join(b, on="k")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
    )
    return (
        cand.select(
            "id_a", "id_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("ed"))
        .filter(F.col("ed") <= 1)
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    t_num: int = 9,
    t_den: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Asymmetric near-SUPERSET detection — shingle containment
    ``C(src -> dst) = |src ∩ dst| / |src| >= t`` — the syndication /
    quotation / aggregator read that Jaccard misses (a short article
    fully embedded in a long page has high containment but LOW
    Jaccard).  Output: ``(src, dst, inter_sz, src_sz,
    containment_ppm)`` for every ORDERED pair with ``src != dst`` and
    exact integer containment ``>= t_num/t_den`` (the threshold test
    cross-multiplies: ``inter * t_den >= t_num * src_sz`` — no
    floats).

    Completeness (prefix-filter argument, one-sided): if C >= t, dst
    misses at most ``src_sz - ceil(t*src_sz)`` of src's shingles, so
    dst must share at least one of src's ``src_sz - ceil(t*src_sz)+1``
    RAREST shingles (df ASC, shingle ASC rank — the prefix_jaccard
    ordering).  Unlike the symmetric join, the DST side must index all
    its shingles (containment has no dst-side prefix); candidate
    volume per prefix occurrence is that shingle's df — the prefix
    prefers the rarest shingles, which is what bounds it (documented:
    a df cap with a recall contract is the knob if a corpus's rare
    tail is still hot; kept exact here).

    Shuffles: shingle distinct, df aggregate, join-back + one per-doc
    rank window, prefix ⋈ postings equi-join, candidate distinct, one
    array-intersect verify join — every post-prefix stage is
    candidate-bounded.
    """
    from pyspark.sql import Window

    if not (0 < t_num <= t_den):
        raise ValueError("threshold must satisfy 0 < t_num/t_den <= 1")
    sh = shingles_df(docs, n, id_col, text_col)
    df_tab = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked_w = Window.partitionBy("doc_id").orderBy(
        F.asc("df"), F.asc("shingle"))
    size_w = Window.partitionBy("doc_id")
    ranked = (
        sh.join(df_tab, on="shingle")
        .withColumn("rank", F.row_number().over(ranked_w))
        .withColumn("sz", F.count("*").over(size_w))
    )
    # prefix length = sz - ceil(t*sz) + 1, exact integers
    ceil_t_sz = F.expr(
        "div(sz * {tn} + {tdm1}, {td})".format(
            tn=int(t_num), tdm1=int(t_den) - 1, td=int(t_den)))
    prefix = ranked.filter(
        F.col("rank") <= F.col("sz") - ceil_t_sz + 1
    ).select(F.col("doc_id").alias("src"), "shingle")
    postings = sh.select(F.col("doc_id").alias("dst"), "shingle")
    cand = (
        prefix.join(postings, on="shingle")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    arr = shingle_arrays(docs, n, id_col, text_col)
    a = arr.select(F.col("doc_id").alias("src"),
                   F.col("shingles").alias("_sa"),
                   F.col("sz").alias("src_sz"))
    b = arr.select(F.col("doc_id").alias("dst"),
                   F.col("shingles").alias("_sb"))
    out = (
        cand.join(a, on="src").join(b, on="dst")
        .withColumn("inter_sz",
                    F.size(F.array_intersect("_sa", "_sb")).cast("long"))
        .filter(F.col("inter_sz") * t_den >= t_num * F.col("src_sz"))
    )
    return out.select(
        "src", "dst", "inter_sz", F.col("src_sz").cast("long").alias(
            "src_sz"),
        F.expr("cast(div(cast(inter_sz as decimal(38,0)) * 1000000,"
               " src_sz) as bigint)").alias("containment_ppm"),
    )


def cluster_size_histogram(clusters: DataFrame,
                           cluster_col: str = "rep_id") -> DataFrame:
    """Duplicate-cluster size distribution — the dedup-audit read (how
    much duplication mass does the corpus carry, and is it pairs or
    giant mirror blobs?): from a ``(member, cluster)`` assignment
    (:func:`duplicate_clusters` output), one row per observed cluster
    size: ``(size, n_clusters, docs)`` with ``docs = size *
    n_clusters`` (the removable mass at that size is ``docs -
    n_clusters``).  Only non-trivial clusters appear (singletons never
    enter the pair graph — documented).

    Scale shape: two map-side-combined aggregates (cluster -> size,
    size -> count); the histogram is size-bounded.  No joins, no
    windows, no python.
    """
    sizes = clusters.groupBy(cluster_col).agg(
        F.count("*").cast("long").alias("size"))
    return (
        sizes.groupBy("size")
        .agg(F.count("*").cast("long").alias("n_clusters"))
        .select("size", "n_clusters",
                (F.col("size") * F.col("n_clusters")).cast("long")
                .alias("docs"))
    )
