"""Kaplan-Meier survival estimation over event streams.

Retention / churn survival curves are the standard product-analytics read
on an events table ("what fraction of users are still active after t
days?").  The estimator here is the textbook Kaplan-Meier product-limit
curve with right-censoring, computed EXACTLY in scaled integers so the
DuckDB oracle replays it bit-for-bit.

Scale shape: the only corpus-sized work is ONE map-side-combined
groupBy(entity) min/max aggregate; everything downstream operates on the
duration rollup, which is bounded by the number of DISTINCT survival
durations (days in the observation window — hundreds, not rows).  The
product-limit recurrence runs inside a single higher-order ``aggregate``
over that bounded sorted array (1 row), so there is never a global row
sort, never a corpus window, and no iteration.  The lambda touches only
its own lambda variables (the CLAUDE.md HOF-inlining hazard does not
apply: the array is an aggregate output, a bound attribute Catalyst
cannot inline a recompute into).
"""

from pyspark.sql import DataFrame, functions as F


#: Duration resolution -> microseconds per unit.
_UNIT_US = {"day": 86_400_000_000, "hour": 3_600_000_000}


def survival_km(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    censor_margin_days: int = 7,
    unit: str = "day",
) -> DataFrame:
    """Kaplan-Meier survival curve with right-censoring over an event
    stream: per entity, birth = first event, last activity = last event;
    an entity whose last activity is at least ``censor_margin_days``
    before the global observation end (max ts) has CHURNED at duration
    ``floor((last - first) / 1 day)``; later last-activity entities are
    right-CENSORED at that duration (still alive when observation
    stopped).

    ``unit`` ("day" | "hour") sets the duration resolution; censoring
    margin stays day-denominated either way.

    Returns one row per distinct duration that carries any churn or
    censoring: ``(t_days, n_risk, n_events, n_censored, surv_ppm)``
    (``t_days`` is named for the default unit; under ``unit="hour"`` it
    carries hours)
    where ``n_risk`` counts entities with duration >= t (deaths at t
    happen first, censored-at-t leave after — the standard KM
    convention) and ``surv_ppm`` is the product-limit estimate in parts
    per million under the exact integer recurrence

        s_0 = 1_000_000;  s_i = floor(s_{i-1} * (n_i - d_i) / n_i)

    (non-negative throughout, so Spark's truncating ``div`` IS floor and
    matches the oracle's HUGEINT-free ``//`` replay; s <= 1e6 and
    n < 2^43 keep the product inside int64 with room to spare).

    Durations use pure-NTZ microsecond arithmetic (``timestampdiff``
    between two NTZ columns) — no session-timezone dependence.
    """
    unit_us = _UNIT_US[unit]
    margin_us = int(censor_margin_days) * 86_400_000_000
    per = (
        events.groupBy(F.col(entity_col).alias("entity"))
        .agg(F.min(ts_col).alias("t0"), F.max(ts_col).alias("t1"))
    )
    cutoff = events.agg(F.max(ts_col).alias("_cutoff"))
    from ._util import attach_scalar

    durs = attach_scalar(per, cutoff).select(
        F.expr("div(timestampdiff(MICROSECOND, t0, t1), {})".format(unit_us))
        .cast("long").alias("t"),
        F.when(
            F.expr("timestampdiff(MICROSECOND, t1, _cutoff)") >= margin_us,
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long").alias("ev"),
    )
    roll = durs.groupBy("t").agg(
        F.sum("ev").alias("d"),
        F.sum(F.lit(1) - F.col("ev")).alias("c"),
    )
    one = roll.agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "c"))).alias("km"),
        F.sum(F.col("d") + F.col("c")).cast("long").alias("n_total"),
    )
    curve = one.select(
        F.expr(
            """
            aggregate(
              km,
              struct(cast(1000000 as bigint) as s,
                     n_total as n,
                     cast(array() as
                          array<struct<t:bigint,n_risk:bigint,d:bigint,
                                       c:bigint,s:bigint>>) as out),
              (acc, x) -> struct(
                cast(div(acc.s * (acc.n - x.d), acc.n) as bigint) as s,
                cast(acc.n - x.d - x.c as bigint) as n,
                array_append(acc.out, struct(
                  x.t as t, acc.n as n_risk, x.d as d, x.c as c,
                  cast(div(acc.s * (acc.n - x.d), acc.n) as bigint) as s))
                  as out),
              acc -> acc.out)
            """
        ).alias("out")
    )
    row = curve.select(F.explode("out").alias("r"))
    return row.select(
        F.col("r.t").alias("t_days"),
        F.col("r.n_risk").alias("n_risk"),
        F.col("r.d").alias("n_events"),
        F.col("r.c").alias("n_censored"),
        F.col("r.s").alias("surv_ppm"),
    )
