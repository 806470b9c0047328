"""CUSUM change-point detection over keyed time series — exact, windowed.

The classic one-sided CUSUM recurrence ``C_t = max(0, C_{t-1} + x_t - mu -
slack)`` looks sequential (a max-reset fold), but it has a closed form as
plain prefix windows::

    S_t = cumsum(x_i - mu - slack)          # plain running sum
    C_t = S_t - min(S_0 .. S_t)             # running minimum

so the whole detector is two window functions over the per-key rollup —
never an iterative loop, never a UDF, never a collect.  (The identity:
resetting at zero whenever the sum dips below its running minimum is the
same as measuring height above the lowest point seen so far.)

All arithmetic is integer: ``mu = sum div n`` per key, ``slack = mu *
slack_pct div 100``, deviations may go negative but are never divided, so
both engines agree bit-for-bit.

Scale shape: corpus-sized work is ONE map-side-combined count/sum
aggregate to the (key x bucket) rollup; the two windows run over that
tiny rollup partitioned by key.  The per-key mean attaches with a
broadcast-sized aggregate join (key cardinality << rollup).  At a 100 TB
event stream the rollup is hours x keys — window state stays bounded by
the series length per key, and skewed keys only skew a rollup-sized
exchange, not the corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_changepoints(
    series: DataFrame,
    key_col: str = "event_type",
    ord_col: str = "hour_id",
    val_col: str = "n",
    slack_pct: int = 10,
    threshold_x: int = 3,
) -> DataFrame:
    """One-sided (upward) CUSUM per key over an ordered integer series.

    Input: one row per ``(key, bucket)`` with an integer value.  Output
    adds ``mu`` (integer per-key mean), ``level`` (the CUSUM statistic,
    >= 0) and ``changed`` (1 when ``level > threshold_x * mu`` — a
    sustained upward shift, robust to single-bucket spikes that the
    trailing-mean anomaly detector flags).

    ``ord_col`` must be unique per key (a time bucket id).
    """
    mu = series.groupBy(key_col).agg(
        F.expr("div(sum({v}), count(*))".format(v=val_col))
        .cast("long").alias("mu"))
    w = (Window.partitionBy(key_col).orderBy(ord_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    dev = (F.col(val_col)
           - F.col("mu")
           - F.expr("div(mu * {p}, 100)".format(p=int(slack_pct))))
    s = F.sum(dev).over(w)
    return (
        series.join(F.broadcast(mu), on=key_col)
        .withColumn("_s", s.cast("long"))
        .withColumn("level",
                    (F.col("_s")
                     - F.least(F.min("_s").over(w), F.lit(0)))
                    .cast("long"))
        .drop("_s")
        .withColumn(
            "changed",
            (F.col("level") > F.lit(int(threshold_x)) * F.col("mu"))
            .cast("int"))
    )
