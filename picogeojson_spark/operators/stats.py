"""Exact grouped quantiles: percentile_disc semantics, engine-portable.

Corpus curation reads length/quality distributions constantly (p50/p90/p99
document length per source decides truncation budgets and filter knobs).
Spark's ``percentile_approx`` is neither exact nor cross-engine
reproducible, and both engines' native exact percentile functions disagree
on interpolation defaults — so this operator implements the discrete
percentile (``percentile_disc``: the smallest value whose rank covers the
requested fraction) from first principles, in pure integer arithmetic:

    pos_p = ceil(p * n / 100) = (p*n + 99) div 100        (p in 1..100)
    result = the value at 1-based position pos_p in the group's sort order

Every quantity is an integer, so the result is a pure function of the
multiset of values — identical across engines, partitionings, and tie
orders (ties at the boundary position all carry the same value).

Scale shape: ONE hash shuffle on the group key, reused by the rank window
and the final aggregation (HashPartitioning(group) satisfies both); the
per-p picks are conditional aggregates, not extra passes. No driver
actions, no global sort — each group sorts only its own rows, the same
cost profile as any windowed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(df: DataFrame, value_col: str, group_col: str,
                    percentiles=(50, 90, 99)) -> DataFrame:
    """One row per group: ``(group_col, n, p<P> for each P)`` where ``p<P>``
    is the exact discrete P-th percentile of ``value_col`` in the group.

    ``percentiles`` are integers in 1..100 (100 = max).
    """
    ps = [int(p) for p in percentiles]
    if not ps or any(p < 1 or p > 100 for p in ps):
        raise ValueError("percentiles must be integers in 1..100")
    w = Window.partitionBy(group_col).orderBy(value_col)
    ranked = df.select(
        group_col, value_col,
        F.row_number().over(w).alias("__r"),
        F.count("*").over(Window.partitionBy(group_col)).alias("__n"),
    )
    aggs = [F.max("__n").alias("n")]
    for p in ps:
        # integer `div`, not `/` (Spark's `/` on longs returns double and a
        # double round-trip loses exactness past 2^53)
        pos = F.expr("({p} * __n + 99) div 100".format(p=p))
        aggs.append(
            F.min(F.when(F.col("__r") == pos, F.col(value_col)))
            .alias("p{}".format(p))
        )
    return ranked.groupBy(group_col).agg(*aggs)


def quantiles_oracle_sql(source_sql: str, value_col: str, group_col: str,
                         percentiles=(50, 90, 99)) -> str:
    """DuckDB replay of :func:`group_quantiles` (same rank/position math —
    deliberately NOT quantile_disc(), so both engines run one formula)."""
    ps = [int(p) for p in percentiles]
    picks = ",\n       ".join(
        "MIN(CASE WHEN __r = ({p} * __n + 99) // 100 THEN {v} END) AS p{p}"
        .format(p=p, v=value_col) for p in ps
    )
    return f"""
WITH ranked AS (
  SELECT {group_col}, {value_col},
         ROW_NUMBER() OVER (PARTITION BY {group_col} ORDER BY {value_col})
           AS __r,
         COUNT(*) OVER (PARTITION BY {group_col}) AS __n
  FROM ({source_sql}))
SELECT {group_col}, CAST(MAX(__n) AS BIGINT) AS n,
       {picks}
FROM ranked
GROUP BY {group_col}
ORDER BY {group_col}
"""
