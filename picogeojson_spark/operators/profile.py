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
