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


def rolling_active_users(
    events: DataFrame,
    user_col: str = "user_id",
    day_col: str = "day_id",
    week: int = 7,
    month: int = 30,
) -> DataFrame:
    """DAU / WAU / MAU + stickiness per observed day — the
    product-analytics engagement read.  Input rows are
    ``(user, day_id)`` events (``day_id`` an integer day, pure-NTZ);
    output one row per OBSERVED day:

        day_id, dau, wau, mau         exact distinct-user counts over
                                      [d-w+1, d] windows
        stickiness_ppm                floor(1e6 * dau / mau)

    Scale shape: the corpus collapses to the DISTINCT (user, day)
    rollup first (ONE map-side-combined aggregate); each window then
    EXPLODES that rollup forward w days (a bounded literal sequence —
    never a range join against the day table) and re-distincts, so the
    window-w pass costs w x |rollup| narrow rows and one exchange.
    Observed-day filtering is one equi-join against the bounded day
    vocabulary.  No inequality joins, no windows over raw events.
    """
    if not (0 < week <= month):
        raise ValueError("need 0 < week <= month")
    ud = (
        events.select(F.col(user_col).alias("u"),
                      F.col(day_col).cast("long").alias("d"))
        .distinct()
    )
    days = ud.select("d").distinct()

    def window_count(w, name):
        cov = ud.select(
            "u",
            F.explode(F.sequence(F.col("d"),
                                 F.col("d") + F.lit(int(w) - 1)))
            .alias("d_t"),
        ).distinct()
        return (
            cov.join(days.withColumnRenamed("d", "d_t"), on="d_t")
            .groupBy("d_t")
            .agg(F.count("*").cast("long").alias(name))
            .withColumnRenamed("d_t", "day_id")
        )

    dau = window_count(1, "dau")
    wau = window_count(week, "wau")
    mau = window_count(month, "mau")
    out = dau.join(wau, on="day_id").join(mau, on="day_id")
    return out.select(
        "day_id", "dau", "wau", "mau",
        F.expr("cast(div(cast(dau as decimal(38,0)) * 1000000, mau)"
               " as bigint)").alias("stickiness_ppm"),
    )


def new_vs_returning(
    events: DataFrame,
    user_col: str = "user_id",
    day_col: str = "day_id",
) -> DataFrame:
    """Daily new-vs-returning split — the acquisition/retention
    headline read (is growth new users or the same users coming
    back?): per observed day, ``(day_id, dau, new_users,
    returning_users, new_share_ppm)`` where a user is NEW on their
    first-ever active day and RETURNING on every later active day.

    Scale shape: the corpus collapses to the distinct (user, day)
    rollup (ONE map-side-combined aggregate); first-activity is one
    per-user aggregate on that rollup; the flag attach is ONE hash
    equi-join on the user key; the daily split is ONE final
    aggregate.  No windows over raw events, no python.
    """
    ud = (
        events.select(F.col(user_col).alias("u"),
                      F.col(day_col).cast("long").alias("d"))
        .distinct()
    )
    first = ud.groupBy("u").agg(F.min("d").alias("_fd"))
    flagged = ud.join(first, on="u").select(
        "d", (F.col("d") == F.col("_fd")).alias("_new"))
    out = flagged.groupBy(F.col("d").alias("day_id")).agg(
        F.count("*").cast("long").alias("dau"),
        F.sum(F.when(F.col("_new"), 1).otherwise(0)).cast("long")
        .alias("new_users"),
    )
    return out.select(
        "day_id", "dau", "new_users",
        (F.col("dau") - F.col("new_users")).cast("long")
        .alias("returning_users"),
        F.expr("cast(div(cast(new_users as decimal(38,0)) * 1000000,"
               " dau) as bigint)").alias("new_share_ppm"),
    )
