"""Cohort retention: activity of each signup-week cohort k weeks later.

The other canonical product-analytics rollup next to the funnel
(``funnel.funnel_counts``): bucket users by their FIRST activity week (the
cohort), then count how many of each cohort are active again exactly k
weeks later. All arithmetic is integer weeks derived from epoch-microsecond
timestamps (callers supply ``ts_us`` via pure-NTZ arithmetic — see
``__spark_entry__._ntz_epoch_us`` — so no session-timezone cast perturbs
bucket boundaries).

Scale shape: one map-side-combined min-aggregate builds the user->cohort
table, one distinct compacts activity to (user, week) rows, and the join
between them is user-keyed (AQE skew-join territory for power users); the
final rollup is a count-distinct whose key space is bounded by
cohorts x offsets. No windows over per-user history, no collect_list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WEEK_US = 7 * 86_400 * 1_000_000


def cohort_retention(events: DataFrame, max_offset: int = 8,
                     user_col: str = "user_id",
                     ts_us_col: str = "ts_us") -> DataFrame:
    """``(cohort_week, week_offset, n_users)`` for offsets 0..max_offset:
    users whose first-ever activity week is ``cohort_week`` and who are
    active in ``cohort_week + week_offset``. Offset 0 is the cohort size
    by construction (every user is active in their first week)."""
    if max_offset < 0:
        raise ValueError("max_offset must be >= 0")
    # Week bucketing uses integer division, which TRUNCATES toward zero in
    # BOTH engines: Spark `div` and DuckDB's integer `//` agree on negative
    # inputs (measured: -7//2 = -3 in DuckDB, same as Spark) — so pre-1970
    # (negative) ts_us buckets identically on both sides of the oracle;
    # test_cohort_negative_ts_matches_oracle pins this parity.
    ev = events.select(
        F.col(user_col).alias("u"),
        F.expr("CAST({t} AS BIGINT) div {w}".format(
            t=ts_us_col, w=_WEEK_US)).alias("week"),
    )
    first = ev.groupBy("u").agg(F.min("week").alias("cohort_week"))
    activity = ev.distinct()
    return (
        activity.join(first, "u")
        .withColumn("week_offset", F.col("week") - F.col("cohort_week"))
        .filter((F.col("week_offset") >= 0)
                & (F.col("week_offset") <= max_offset))
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("u").cast("long").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def cohort_oracle_sql(source_sql: str, max_offset: int = 8) -> str:
    """DuckDB replay; ``source_sql`` must yield (user_id, ts_us)."""
    return f"""
WITH ev AS (
  SELECT user_id AS u, ts_us // {_WEEK_US} AS week
  FROM ({source_sql})),
first_w AS (SELECT u, MIN(week) AS cohort_week FROM ev GROUP BY u),
act AS (SELECT DISTINCT u, week FROM ev)
SELECT f.cohort_week,
       a.week - f.cohort_week AS week_offset,
       CAST(COUNT(DISTINCT a.u) AS BIGINT) AS n_users
FROM act a JOIN first_w f USING (u)
WHERE a.week - f.cohort_week BETWEEN 0 AND {int(max_offset)}
GROUP BY 1, 2
ORDER BY cohort_week, week_offset
"""
