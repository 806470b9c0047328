"""Holt linear-trend forecasting over event-rate series — integer exact.

The capacity-planning / trend-monitoring step: per key, double
exponential smoothing (Holt 1957) over the hourly count series gives a
level, a trend, and a one-step forecast.  Floats are the classic
cross-engine hazard here (alpha powers compound rounding), so the whole
recurrence runs in MILLI fixed point with FLOOR division — and because
the trend can go negative, floor must be spelled explicitly on the
Spark side (``(a - pmod(a, 1000)) / 1000``): Spark's ``div`` truncates
toward zero while DuckDB's ``//`` floors, the repo's known divergence
trap for negatives.

Scale shape: ONE map-side-combined (key, hour) aggregate reduces the
corpus to the hourly table; ONE key-sized aggregate collects each key's
BOUNDED series (hours in the analysis window — at 100 TB you forecast
over the rollup, never raw events); the recurrence is a single
``F.aggregate`` fold whose lambda touches only its own variables (the
HOF-safe category per the repo's CollapseProject rule).  The oracle
replays the identical fold with DuckDB ``list_reduce``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def holt_forecast(
    events: DataFrame,
    alpha_milli: int = 300,
    beta_milli: int = 100,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key Holt linear smoothing over the hourly count series
    (observed hours, in hour order; all-integer milli fixed point):

    - init: level = first_count * 1000, trend = 0;
    - step: level' = floor((a*x*?) ...) — precisely
      ``fd(alpha*x_milli + (1000-alpha)*(level+trend))`` and
      ``trend' = fd(beta*(level'-level) + (1000-beta)*trend)`` with
      ``fd(v) = floor(v / 1000)``.

    Output: ``key, n_hours, level_milli, trend_milli,
    forecast_next_milli`` (= level + trend, the one-step-ahead Holt
    forecast).
    """
    if not (0 < alpha_milli <= 1000 and 0 <= beta_milli <= 1000):
        raise ValueError("alpha_milli in (0,1000], beta_milli in [0,1000]")
    a, b = int(alpha_milli), int(beta_milli)
    hour = F.expr(
        "div(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
        "00:00:00', {c}), 3600000000)".format(c=ts_col))
    hourly = (
        events.select(F.col(key_col).alias("key"), hour.alias("hour"))
        .groupBy("key", "hour")
        .agg(F.count("*").cast("long").alias("n"))
    )
    series = hourly.groupBy("key").agg(
        F.array_sort(F.collect_list(F.struct("hour", "n"))).alias("s"))
    # fold with EXPLICIT floor division: fd(v) = div(v - pmod(v, 1000),
    # 1000) — pmod is the non-negative remainder, so v - pmod(v, 1000) is
    # exactly divisible and div's truncation is exact even for negative
    # trends; integer div throughout (a `/` here would go through DOUBLE
    # and lose exactness past 2^53)
    def fd(v):
        return "div(({v}) - pmod({v}, 1000), 1000)".format(v=v)

    lp = fd("{a} * e.n * 1000L + {na} * (acc.l + acc.b)".format(
        a=a, na=1000 - a))
    bp = fd("{b} * (({lp}) - acc.l) + {nb} * acc.b".format(
        b=b, nb=1000 - b, lp=lp))
    step = (
        "aggregate(slice(s, 2, greatest(0, size(s) - 1)), "
        "named_struct('l', element_at(s, 1).n * 1000L, 'b', 0L), "
        "(acc, e) -> named_struct('l', {lp}, 'b', {bp}))"
    ).format(lp=lp, bp=bp)
    out = series.select(
        "key",
        F.size("s").cast("long").alias("n_hours"),
        F.expr(step).alias("hb"),
    )
    return out.select(
        "key", "n_hours",
        F.col("hb.l").alias("level_milli"),
        F.col("hb.b").alias("trend_milli"),
        (F.col("hb.l") + F.col("hb.b")).cast("long")
        .alias("forecast_next_milli"),
    )
