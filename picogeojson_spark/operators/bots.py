"""Behavioral bot detection over an event stream.

The crawl-hygiene / abuse-filtering step of a training-data pipeline:
automated traffic shows up as (a) METRONOME regularity — identical
inter-event gaps no human produces, (b) BURSTS — many events inside one
instant, or (c) sustained RATE beyond plausible human activity.  All
three signals reduce to exact integer statistics per user, so the
classification is bit-identical cross-engine (no means, no variances —
a gap variance needs squared sums that overflow int64 at real spans;
the min==max spelling is both exact and the sharper metronome test).

Scale shape: ONE shuffle total — the per-user window (lag over
(ts, event_id)) hash-partitions by user and the groupBy(user) reuses the
exchange; output is user-sized.  Pure-NTZ microsecond arithmetic
(timestampdiff between event columns) — session-timezone-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bot_scores(
    events: DataFrame,
    rate_threshold_milli: int = 60_000,
    min_regular_events: int = 5,
    burst_events: int = 10,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user bot signals and verdict.

    Output: ``user_id, n_events, span_s, rate_milli, n_types,
    min_gap_us, max_gap_us, is_regular, is_bot`` where

    - ``span_s``   = floor((last - first) / 1e6) whole seconds;
    - ``rate_milli`` = ``(n_events * 3_600_000) // span_s`` (milli-events
      per hour; 0 when the span is under one second);
    - ``is_regular`` = at least ``min_regular_events`` events AND every
      inter-event gap identical AND positive (min_gap == max_gap > 0) —
      the metronome; a same-instant pile-up is the burst signal's job,
      not a degenerate zero-period metronome;
    - ``is_bot`` = is_regular OR rate above ``rate_threshold_milli`` OR
      a sub-second burst of ``burst_events``+.

    Single-event users have NULL gaps and span 0: never regular, never
    rate-flagged, bot only under an absurd burst_events of 1.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.expr(
        "timestampdiff(MICROSECOND, _prev_ts, {c})".format(c=ts_col))
    g = (
        events.select(user_col, ts_col, id_col, type_col)
        .withColumn("_prev_ts", F.lag(ts_col).over(w))
        .withColumn("_gap_us", gap)
    )
    agg = g.groupBy(F.col(user_col).alias("user_id")).agg(
        F.count("*").cast("long").alias("n_events"),
        F.expr("div(timestampdiff(MICROSECOND, min({c}), max({c})),"
               " 1000000)".format(c=ts_col)).cast("long").alias("span_s"),
        F.countDistinct(type_col).cast("long").alias("n_types"),
        F.min("_gap_us").cast("long").alias("min_gap_us"),
        F.max("_gap_us").cast("long").alias("max_gap_us"),
    )
    rate = F.when(
        F.col("span_s") > 0,
        F.expr("div(n_events * 3600000L, span_s)"),
    ).otherwise(F.lit(0)).cast("long")
    out = agg.withColumn("rate_milli", rate).withColumn(
        "is_regular",
        (F.col("n_events") >= int(min_regular_events))
        & (F.col("min_gap_us") > 0)
        & (F.col("min_gap_us") == F.col("max_gap_us")),
    )
    return out.withColumn(
        "is_bot",
        F.col("is_regular")
        | (F.col("rate_milli") > int(rate_threshold_milli))
        | ((F.col("span_s") == 0)
           & (F.col("n_events") >= int(burst_events))),
    ).select("user_id", "n_events", "span_s", "rate_milli", "n_types",
             "min_gap_us", "max_gap_us", "is_regular", "is_bot")
