"""Table profiling — the ANALYZE-TABLE stats collector, sketch-backed.

What a lakehouse optimizer (CBO join ordering, file skipping, AQE hints)
needs per column: row count, null count, min/max, and a distinct-count
estimate. At 100 TB the exact distinct table is itself TB-sized, so ndv
comes from the repo's integer-exact HyperLogLog (`sketches.hll_distinct`)
— constant-size mergeable registers, shuffle volume independent of row
count.

Two single-pass scans total, both shapes that survive any scale:

1. ONE aggregation node computes the row count plus every column's
   null count and native-typed min/max together (map-side combined; the
   result is a single row regardless of input size).
2. ONE narrow melt (column-name, value-string) explode feeding the HLL
   register aggregate — per-task shuffle output bounded at
   ``n_columns x 2^p`` rows.

min/max are emitted as strings for a uniform schema, computed on the
NATIVE type first (a lexicographic string min would order "10" < "9").
Cross-engine string casts are exact for integer and string columns —
profile double columns at your own formatting risk (documented; the
contract query sticks to bigint/varchar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketches import hll_distinct


def table_profile(df: DataFrame, columns, p: int = 6,
                  salt: str = "prof") -> DataFrame:
    """Per-column profile: ``(column, n_rows, n_nulls, min_s, max_s,
    v_zero, ndv_est)``, one row per requested column, ordered by name."""
    columns = list(columns)
    if not columns:
        raise ValueError("columns must be non-empty")

    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).cast("long")
                    .alias("_nulls_" + c))
        aggs.append(F.min(F.col(c)).cast("string").alias("_min_" + c))
        aggs.append(F.max(F.col(c)).cast("string").alias("_max_" + c))
    row1 = df.agg(*aggs)
    stack_args = ", ".join(
        "'{c}', _nulls_{c}, _min_{c}, _max_{c}".format(c=c) for c in columns
    )
    stats = row1.select(
        F.col("_n").alias("n_rows"),
        F.expr("stack({n}, {a}) AS (column, n_nulls, min_s, max_s)".format(
            n=len(columns), a=stack_args)),
    ).select("column", "n_rows", "n_nulls", "min_s", "max_s")

    melted = df.select(
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("column"),
                     F.col(c).cast("string").alias("val"))
            for c in columns
        ])).alias("kv")
    ).select("kv.column", "kv.val").filter(F.col("val").isNotNull())
    ndv = hll_distinct(melted, ["column"], "val", p=p, salt=salt)

    return (
        stats.join(ndv, "column", "left")
        .select(
            "column", "n_rows", "n_nulls", "min_s", "max_s",
            F.coalesce("v_zero", F.lit((1 << p))).cast("long")
            .alias("v_zero"),
            F.coalesce("est", F.lit(0)).cast("long").alias("ndv_est"),
        )
        .orderBy("column")
    )


#: floor(1e6 * log10(1 + 1/d)) for d = 1..9 — Benford's first-digit law as
#: exact integer literals (every value sits >= 0.01 ppm from an integer
#: boundary, so the floor is stable; the same table is embedded verbatim
#: in the SQL oracle).  Precomputed in python: Catalyst does not
#: constant-fold inside higher-order-function lambdas (CLAUDE.md).
BENFORD_PPM = (301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152,
               45757)


def benford_deviation(df: DataFrame, value_col: str = "v",
                      group_col: str = "grp") -> DataFrame:
    """Benford's-law first-digit screen per group — the classic
    fabricated-numbers / data-quality read over any positive integer
    measure (amounts in cents, counts, populations): ``(grp, n,
    tv_ppm)`` where ``tv_ppm`` is the total-variation distance between
    the observed first-significant-digit distribution and Benford's law,
    in ppm:

        tv_ppm = floor( sum_d |1e6*cnt_d - ben_d*n|  /  (2*n) )

    The first significant digit of a positive integer is its leading
    decimal character — pure string arithmetic, identical in both
    engines (no float log10 anywhere; the Benford masses are the
    :data:`BENFORD_PPM` integer literals).  Non-positive values are
    ignored (Benford is defined on positive magnitudes).

    Scale shape: ONE map-side-combined (grp, digit) aggregate collapses
    the corpus to <= 9 rows per group; the digit frame then EXPLODES a
    9-literal array per group row (zero-count digits still contribute
    ben_d*n) and LEFT-joins the observed counts — an equi-join on
    (grp, digit), never a cartesian.  Everything after the first
    aggregate is group-cardinality-bounded codegen.
    """
    pos = df.filter(F.col(value_col) > 0).select(
        F.col(group_col).alias("grp"),
        F.substring(F.col(value_col).cast("long").cast("string"), 1, 1)
        .cast("int").alias("digit"),
    )
    hist = pos.groupBy("grp", "digit").agg(
        F.count("*").cast("long").alias("cnt"))
    tot = hist.groupBy("grp").agg(F.sum("cnt").cast("long").alias("n"))
    ben = F.array(*[
        F.struct(F.lit(d + 1).cast("int").alias("digit"),
                 F.lit(p).cast("long").alias("ben_ppm"))
        for d, p in enumerate(BENFORD_PPM)
    ])
    expand = tot.select(
        "grp", "n", F.explode(ben).alias("b")
    ).select("grp", "n", F.col("b.digit").alias("digit"),
             F.col("b.ben_ppm").alias("ben_ppm"))
    j = expand.join(hist, on=["grp", "digit"], how="left").select(
        "grp", "n",
        F.abs(F.coalesce("cnt", F.lit(0)) * F.lit(1000000).cast("long")
              - F.col("ben_ppm") * F.col("n")).alias("dev"),
    )
    return j.groupBy("grp").agg(
        F.max("n").cast("long").alias("n"),
        F.expr("cast(div(sum(dev), 2 * max(n)) as bigint)")
        .alias("tv_ppm"),
    )


def equi_width_histogram(df: DataFrame, key_col: str = "key",
                         value_col: str = "v",
                         n_bins: int = 16) -> DataFrame:
    """Exact per-key equi-width histogram of an integer measure — the
    distribution-shape profiling read next to `group_quantiles` (which
    answers point quantiles; this answers "what does the whole shape
    look like?"): sparse ``(key, bin, bin_lo, bin_hi, cnt)`` rows,
    empty bins omitted.

    Binning is pure integer arithmetic on the per-key closed range
    ``[vmin, vmax]`` with ``span = vmax - vmin + 1``:

        bin    = min(n_bins-1, ((v - vmin) * n_bins) div span)
        bin_lo = vmin + (bin * span) div n_bins   (bin covers
        bin_hi = vmin + ((bin+1) * span) div n_bins - 1    [lo, hi])

    with ``bin_hi`` clamped to ``>= bin_lo`` (when span < n_bins some
    nominal bins are empty and the raw edge arithmetic inverts on the
    occupied one — single-valued keys hit this).

    — deterministic in both engines (all operands non-negative after
    the ``- vmin`` shift), and every value lands in exactly one bin.

    Scale shape: ONE map-side-combined (key, value) aggregate collapses
    the corpus to the value histogram (the integer-scaled-measure
    contract, same as `value_cdf`); per-key min/max aggregate over that
    bounded table and rejoin by KEY (an equi-join on the bounded
    tables — no scalar broadcast needed, unlike a global histogram);
    binning and the final (key, bin) rollup are codegen on bounded
    rows.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    hist = (
        df.groupBy(F.col(key_col).alias("key"),
                   F.col(value_col).cast("long").alias("v"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    rng = hist.groupBy("key").agg(
        F.min("v").cast("long").alias("vmin"),
        F.max("v").cast("long").alias("vmax"))
    j = hist.join(rng, on="key").select(
        "key", "v", "cnt", "vmin",
        (F.col("vmax") - F.col("vmin") + 1).alias("span"),
    ).select(
        "key", "cnt", "vmin", "span",
        F.least(F.lit(int(n_bins) - 1),
                F.expr("div((v - vmin) * {nb}, span)".format(
                    nb=int(n_bins))))
        .cast("long").alias("bin"),
    )
    return j.groupBy("key", "bin", "vmin", "span").agg(
        F.sum("cnt").cast("long").alias("cnt")
    ).select(
        "key", "bin",
        (F.col("vmin") + F.expr("div(bin * span, {nb})".format(
            nb=int(n_bins)))).cast("long").alias("bin_lo"),
        F.greatest(
            F.col("vmin") + F.expr("div(bin * span, {nb})".format(
                nb=int(n_bins))),
            F.col("vmin") + F.expr("div((bin + 1) * span, {nb})".format(
                nb=int(n_bins))) - 1,
        ).cast("long").alias("bin_hi"),
        "cnt",
    )


def fd_profile(df: DataFrame, candidates) -> DataFrame:
    """Functional-dependency discovery over candidate column pairs —
    the schema-inference / data-quality read ("is url -> host exact?
    how dirty is custkey -> nation?"): for each candidate ``(det, dep)``
    report whether ``det`` functionally determines ``dep`` and the g3
    error (the minimum number of rows to delete to make the FD hold —
    Kivinen & Mannila's measure).  One output row per candidate:

        det, dep           the candidate pair (column names)
        n_groups           distinct det values
        violating_groups   det values mapping to >1 distinct dep
        g3_rows            sum over groups of (group rows - plurality)
        n_rows             total rows scanned
        error_ppm          floor(1e6 * g3_rows / n_rows)
        holds              violating_groups == 0

    NULL semantics: a NULL det is its own group and a NULL dep is a
    value (both engines' GROUP BY equality) — documented, matching the
    expectations-module convention.

    Scale shape: per candidate, the corpus collapses in ONE map-side
    combined (det, dep) aggregate; the per-det rollup and the 1-row
    final aggregate run on the (det x dep)-bounded table.  Candidates
    are a bounded config list; their result rows union lazily.  No
    windows, no joins, no python.
    """
    if not candidates:
        raise ValueError("need at least one (det, dep) candidate")
    outs = []
    for det, dep in candidates:
        cells = (
            df.groupBy(F.col(det).alias("_d"), F.col(dep).alias("_v"))
            .agg(F.count("*").cast("long").alias("_n"))
        )
        per_det = cells.groupBy("_d").agg(
            F.sum("_n").cast("long").alias("_rows"),
            F.count("*").cast("long").alias("_ndep"),
            F.max("_n").cast("long").alias("_plur"),
        )
        outs.append(per_det.agg(
            F.lit(det).alias("det"),
            F.lit(dep).alias("dep"),
            F.count("*").cast("long").alias("n_groups"),
            F.coalesce(
                F.sum(F.when(F.col("_ndep") > 1, 1).otherwise(0)),
                F.lit(0)).cast("long").alias("violating_groups"),
            F.coalesce(F.sum(F.col("_rows") - F.col("_plur")),
                       F.lit(0)).cast("long").alias("g3_rows"),
            F.coalesce(F.sum("_rows"), F.lit(0)).cast("long")
            .alias("n_rows"),
        ).select(
            "det", "dep", "n_groups", "violating_groups", "g3_rows",
            "n_rows",
            F.when(F.col("n_rows") > 0,
                   F.expr("cast(div(cast(g3_rows as decimal(38,0))"
                          " * 1000000, n_rows) as bigint)"))
            .alias("error_ppm"),
            (F.col("violating_groups") == 0).alias("holds"),
        ))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def key_uniqueness(df: DataFrame, columns) -> DataFrame:
    """Candidate-key uniqueness profile — the schema-inference read
    before choosing partition/join keys: for each candidate column,
    one row ``(col, n_rows, n_nonnull, n_distinct, uniq_ppm,
    is_unique)`` with ``uniq_ppm = floor(1e6 * n_distinct /
    n_nonnull)`` (NULLs excluded from the key space — report them via
    ``n_rows - n_nonnull``; a column is a candidate key iff every
    non-null value is distinct AND there is at most one NULL is NOT
    asserted here — ``is_unique`` means distinct == nonnull, the
    fd_profile NULL convention's uniqueness face).

    Scale shape: per column ONE map-side-combined value histogram
    (never countDistinct over raw rows) + a 1-row rollup; candidates
    union lazily.  No joins, no windows, no python.
    """
    if not columns:
        raise ValueError("need at least one candidate column")
    outs = []
    for c in columns:
        hist = df.groupBy(F.col(c).alias("_v")).agg(
            F.count("*").cast("long").alias("_n"))
        outs.append(hist.agg(
            F.lit(c).alias("col"),
            F.coalesce(F.sum("_n"), F.lit(0)).cast("long")
            .alias("n_rows"),
            F.coalesce(F.sum(F.when(F.col("_v").isNotNull(),
                                    F.col("_n"))), F.lit(0))
            .cast("long").alias("n_nonnull"),
            F.coalesce(F.sum(F.when(F.col("_v").isNotNull(), 1)
                             .otherwise(0)), F.lit(0)).cast("long")
            .alias("n_distinct"),
        ).select(
            "col", "n_rows", "n_nonnull", "n_distinct",
            F.when(F.col("n_nonnull") > 0,
                   F.expr("cast(div(cast(n_distinct as decimal(38,0))"
                          " * 1000000, n_nonnull) as bigint)"))
            .alias("uniq_ppm"),
            (F.col("n_distinct") == F.col("n_nonnull")).alias(
                "is_unique"),
        ))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
