"""Multi-touch attribution: split conversion credit across the touch
events that preceded it.

The marketing-analytics batch twin of ``stream_attribution``'s interval
join: every conversion looks back ``window_us`` for the same user's
touch events and divides its credit EQUALLY among them (linear / uniform
multi-touch — the model where order doesn't matter, so no window
function over touch sequences is needed).  Conversions with no touch in
the window report as unattributed (the "direct" bucket).

Exactness: per-conversion credit is ``1e6 // n_touches`` ppm per touch —
integer division, remainder deliberately dropped (documented; both
engines truncate non-negative identically).  Time deltas are pure-NTZ
microsecond ``timestampdiff`` between two event columns — no
session-timezone cast anywhere.

Scale shape: ONE user-keyed equi-join (per-user fan-out is bounded by a
user's own activity — never a corpus product), ONE conversion-sized
aggregate, ONE window over the (conversion, touch_type)-sized table, a
left-anti probe for the direct bucket, and a final touch-type-sized
aggregate.  No corpus-sized windows, no collects.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def linear_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("click", "view", "signup"),
    window_us: int = 7 * 86_400_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-touch-type linear attribution report:
    ``(touch_type, n_touches, n_conversions, credit_ppm_sum)`` — plus a
    ``(none)`` row counting unattributed conversions at full credit.
    A touch attributes when STRICTLY before its conversion and at most
    ``window_us`` earlier."""
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("u"),
        F.col(id_col).alias("conv_id"),
        F.col(ts_col).alias("conv_ts"),
    )
    touch = events.filter(
        F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("touch_type"),
        F.col(ts_col).alias("touch_ts"),
    )
    delta = F.expr("timestampdiff(MICROSECOND, touch_ts, conv_ts)")
    j = (
        conv.join(touch, on="u")
        .withColumn("_delta", delta)
        .filter((F.col("_delta") > 0) & (F.col("_delta") <= int(window_us)))
    )
    per_ct = j.groupBy("conv_id", "touch_type").agg(
        F.count("*").cast("long").alias("n_ct"))
    w = Window.partitionBy("conv_id")
    credited = (
        per_ct.withColumn("n_tot", F.sum("n_ct").over(w))
        .withColumn(
            "credit",
            (F.col("n_ct") * F.expr("div(1000000L, n_tot)")).cast("long"))
    )
    attributed = credited.groupBy("touch_type").agg(
        F.sum("n_ct").cast("long").alias("n_touches"),
        F.countDistinct("conv_id").cast("long").alias("n_conversions"),
        F.sum("credit").cast("long").alias("credit_ppm_sum"),
    )
    direct = (
        conv.join(per_ct.select("conv_id").distinct(), on="conv_id",
                  how="left_anti")
        .agg(F.count("*").cast("long").alias("n_conversions"))
        .select(
            F.lit("(none)").alias("touch_type"),
            F.lit(0).cast("long").alias("n_touches"),
            "n_conversions",
            (F.col("n_conversions") * 1000000).cast("long")
            .alias("credit_ppm_sum"),
        )
        .filter(F.col("n_conversions") > 0)
    )
    return attributed.unionByName(direct)
