"""Deterministic sampling operators for training-data pipelines.

Random sampling (``df.sample``) is the wrong tool for corpus curation at
scale: membership changes across runs, across cluster sizes, and whenever
partitioning shifts, so an experiment can never be re-cut from the raw
corpus. Every operator here derives membership from a hash of the row's
OWN id (plus a salt), which buys three properties the pipeline needs:

- **reproducible**: same ids + same salt -> same sample, on any cluster,
  at any parallelism, in any engine (md5 is the same everywhere — the
  DuckDB oracle replays every assignment bit-for-bit);
- **growth-stable**: appending new documents never changes the membership
  of existing ones (critical for incremental crawls — the eval set cut
  last month is still exactly inside the sample cut today);
- **composable**: different salts give independent samples; the same salt
  on two tables gives a CONSISTENT sample (joinable slices).

Scale shape: ``hash_sample`` is a pure narrow filter (whole-stage codegen,
evaluated in the scan stage — zero shuffles, zero driver actions).
``stratified_sample`` shuffles once on the stratum key; its rank<=n filter
is recognized by Spark's WindowGroupLimit rule, which pre-prunes each map
partition to n rows before the exchange, so a pathologically hot stratum
ships at most n rows per upstream partition instead of its full mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: bucket count for fraction quantization — fractions resolve to 1e-6 steps
BUCKETS = 1_000_000


def hash_bucket(col, salt: str = "s0", buckets: int = BUCKETS):
    """Deterministic bucket in [0, buckets) from md5(salt ':' value).

    First 8 hex chars -> 32-bit integer (``conv``), mod buckets — the exact
    construction the SQL oracle replays with
    ``CAST(('0x' || substring(md5(...), 1, 8)) AS BIGINT) % buckets``.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    return F.pmod(h, F.lit(buckets))


def hash_sample(df: DataFrame, fraction: float, id_col: str = "doc_id",
                salt: str = "s0", buckets: int = BUCKETS) -> DataFrame:
    """Deterministic Bernoulli-by-hash sample: keeps a row iff its id's
    hash bucket falls below ``fraction * buckets``.

    ``fraction`` is quantized to 1/buckets steps (exactness over surprise:
    the kept set is a pure function of ids, never of row order or count).
    A pure narrow filter — no shuffle, no RNG state, no driver action.
    """
    threshold = int(round(fraction * buckets))
    return df.filter(hash_bucket(id_col, salt, buckets) < F.lit(threshold))


def stratified_sample(df: DataFrame, n_per_key: int, key_col: str = "lang",
                      id_col: str = "doc_id", salt: str = "s0",
                      buckets: int = BUCKETS) -> DataFrame:
    """Fixed-size deterministic sample per stratum: the ``n_per_key`` rows
    of each ``key_col`` group that rank first by (hash(id), id).

    Statistically a per-stratum uniform sample (hash order is unrelated to
    any data attribute), operationally a reservoir sample whose reservoir
    never reshuffles: a stratum that grows only ever EVICTS the
    highest-hash members, it never churns the rest. One exchange on the
    stratum key; the rank<=n predicate triggers WindowGroupLimit so every
    map partition pre-prunes to n rows before shuffling — a hot stratum
    (half the corpus in one language) costs n rows per upstream partition,
    not its full mass.
    """
    w = Window.partitionBy(key_col).orderBy(
        hash_bucket(id_col, salt, buckets).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_key)
        .drop("_rk")
    )


def mixture_sample(df: DataFrame, cap: int, source_col: str = "source",
                   id_col: str = "doc_id", salt: str = "mix0",
                   buckets: int = BUCKETS) -> DataFrame:
    """Rate-based source balancing: downsample every source to an
    EXPECTED ``cap`` documents, keeping small sources whole.

    The mixture-rebalancing step of a multi-source training pipeline
    (web + wiki + books + code): oversized sources are thinned by a
    per-source keep rate ``min(1, cap / n_source)`` so no single crawl
    dominates the token budget, while membership stays a pure function of
    (salt, id) -- the same document survives every re-cut, at any
    parallelism, and appending MORE documents to a source only thins that
    source further without churning other sources' members.

    The keep threshold is integer-exact (``floor(buckets * cap / n)``) so
    the DuckDB oracle replays it with ``//`` -- no float rates anywhere.

    Scale shape: one partial-agg count per source (tiny result, broadcast
    back), then a narrow hash filter -- the corpus itself never shuffles.
    Unlike ``stratified_sample`` (exact n, one window exchange) this is
    approximate-size but exchange-free on the data path; at 100 TB the
    broadcast side is #sources rows.
    """
    counts = df.groupBy(source_col).agg(F.count("*").alias("_n_src"))
    # `div` (integral division) rather than floor(a / b): the double
    # round-trip can misfloor near-integer quotients at large magnitudes,
    # and the oracle's `//` is exact.
    thresholds = counts.select(
        source_col,
        F.least(
            F.lit(int(buckets)).cast("long"),
            F.expr(
                "cast({b} as bigint) * {c} div _n_src".format(
                    b=int(buckets), c=int(cap)
                )
            ),
        ).cast("long").alias("_thr"),
    )
    return (
        df.join(F.broadcast(thresholds), source_col)
        .filter(hash_bucket(id_col, salt, buckets) < F.col("_thr"))
        .drop("_thr")
    )


def temperature_sample(df: DataFrame, source_col: str = "source",
                       id_col: str = "doc_id", salt: str = "temp0",
                       buckets: int = BUCKETS) -> DataFrame:
    """Temperature-scaled source balancing at alpha = 0.5 — the
    multilingual-mixture sampler (mT5/XLM-R style): sampling a source
    proportionally to ``n_source^alpha`` instead of ``n_source`` flattens
    the head without nuking the tail. Realized as a per-doc Bernoulli
    keep with rate ``sqrt(n_min / n_source)`` (the smallest source keeps
    everything; a source 100x bigger keeps 10x the docs of the smallest,
    not 100x).

    alpha is FIXED at 0.5 because that is the exactness sweet spot: the
    keep threshold is ``floor(sqrt(n_min * buckets^2 div n_source))`` —
    an integer radicand, and IEEE 754 requires sqrt to be correctly
    rounded, so Spark's java.lang.Math and DuckDB's libm return the
    bit-identical double and the oracle replays the threshold exactly
    (general alpha needs pow(), which carries no such guarantee).

    Scale shape — same as :func:`mixture_sample`: one partial-agg count
    per source broadcast back, then a narrow hash filter; the corpus
    never shuffles and membership is a pure function of (salt, id).

    64-bit bound: the radicand is ``n_min * buckets^2``, so with the
    default 1e6 buckets the SMALLEST source must stay under ~9.2e6 docs —
    for corpora beyond that pass ``buckets=10_000`` (keep-rate precision
    1e-4, ample for balancing).
    """
    from pyspark.sql import Window

    counts = df.groupBy(source_col).agg(
        F.count("*").cast("long").alias("_n_src"))
    # n_min via an unpartitioned window over the SOURCES-sized count table
    # (bounded by construction) — a 1-row aggregate join would plan as the
    # cross-join shape the repo's plan invariant forbids
    b2 = int(buckets) * int(buckets)
    thresholds = counts.withColumn(
        "_n_min", F.min("_n_src").over(Window.partitionBy())
    ).select(
        source_col,
        F.floor(F.sqrt(
            F.expr("cast(_n_min as bigint) * cast({b2} as bigint)"
                   " div _n_src".format(b2=b2)).cast("double")
        )).cast("long").alias("_thr"),
    )
    return (
        df.join(F.broadcast(thresholds), source_col)
        .filter(hash_bucket(id_col, salt, buckets) < F.col("_thr"))
        .drop("_thr")
    )


def rendezvous_assign(
    df: DataFrame,
    shards,
    key_col: str = "doc_id",
    salt: str = "hrw",
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous / highest-random-weight shard assignment (Thaler &
    Ravishankar 1996) — the consistent-routing primitive: each key goes
    to the shard with the greatest ``md5(salt:shard:key)`` score, so
    REMOVING a shard remaps ONLY that shard's keys (~1/n of the table)
    and ADDING one steals ~1/(n+1) from each — no global reshuffle, the
    property hash-mod sharding lacks (pinned by the minimal-disruption
    test).

    Determinism: scores are the repo-standard 60-bit md5 construction
    (15 hex chars -> BIGINT) — identical in both engines; ties (never
    observed at 60 bits, but defined) break to the lexicographically
    larger shard name via (score, shard) struct-max.

    Scale shape: the shard list is a LITERAL array folded per row —
    pure codegen, NO explode, NO join, NO shuffle; the k-way score
    fan-out rides the scan.  At 100 TB this is a free column.
    """
    shards = [str(s) for s in shards]
    if not shards:
        raise ValueError("need at least one shard")
    key = F.col(key_col).cast("string")
    scored = [
        F.struct(
            F.conv(F.substring(
                F.md5(F.concat(F.lit(salt + ":" + s + ":"), key)),
                1, 15), 16, 10).cast("long").alias("score"),
            F.lit(s).alias("name"),
        )
        for s in shards
    ]
    return df.withColumn(out_col, F.array_max(F.array(*scored))["name"])


def balanced_sample(df: DataFrame, key_col: str = "label",
                    id_col: str = "vec_id", salt: str = "s0") -> DataFrame:
    """Class-balanced downsample: every class keeps exactly ``n_min``
    rows (the size of the SMALLEST class), chosen as the first by
    ``(hash(id), id)`` — i.e. a per-class uniform sample that equalizes
    the label distribution for classifier training without RNG state.

    Deterministic and append-stable in the hash order (a grown class
    keeps a superset-ordering prefix; only ``n_min`` shifts).

    Scale shape: one map-side-combined class-count aggregate reduced to
    a 1-row global min (the sanctioned scalar attach), one per-class
    rank window (WindowGroupLimit cannot pre-prune here because the
    cutoff is dynamic — at petabyte scale feed the known n_min as a
    literal recut, same semantics) — then a codegen filter.
    """
    from pyspark.sql import Window

    from ._util import attach_scalar

    n_min = (
        df.groupBy(key_col).agg(F.count("*").alias("_n"))
        .agg(F.min("_n").cast("long").alias("n_min"))
    )
    w = Window.partitionBy(key_col).orderBy(
        hash_bucket(id_col, salt), F.asc(id_col))
    ranked = df.withColumn("_rk", F.row_number().over(w))
    return (
        attach_scalar(ranked, n_min)
        .filter(F.col("_rk") <= F.col("n_min"))
        .drop("_rk", "n_min")
    )
