"""Session path mining: the most-travelled event-type sequences.

The clickstream product-analytics staple (where do sessions start and
what do the first k steps look like): gap-sessionize, take each
session's first ``k`` event types in time order, and count sessions and
distinct users per path string.

Scale shape: ONE corpus shuffle — the per-user window hash-partitions by
user and its sort order is reused by the running-sum window AND the
(user, session) groupBy; the per-session collect_list is bounded by
session length (sessions are gap-bounded by construction); the final
aggregate's reduce side is path-space-sized (≤ |event types|^k plus
shorter prefixes).  The HOF chain (array_sort → transform → slice)
touches only its own lambda variables — the CollapseProject-safe
category.  Determinism: ordering key is (ts micros, event_id) with
event_id unique, so the sorted struct array is total-ordered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def session_paths(
    events: DataFrame,
    gap_us: int = 1_800_000_000,
    k: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """-> ``(path, n_sessions, n_users)``: the first ``k`` event types of
    every gap-delimited session joined with ``>``, counted across the
    corpus.  Sessions shorter than ``k`` contribute their full (shorter)
    path string."""
    if k < 1:
        raise ValueError("k must be >= 1")
    e = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ "
               "'1970-01-01 00:00:00', {})".format(ts_col)).alias("tus"),
        F.col(type_col).alias("etype"),
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gapped = e.withColumn(
        "new_s",
        F.when(
            F.lag("tus").over(w).isNull()
            | ((F.col("tus") - F.lag("tus").over(w)) > int(gap_us)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = gapped.withColumn(
        "sidx",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = sess.groupBy("user_id", "sidx").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("tus", "event_id", "etype"))),
                    lambda x: x["etype"],
                ),
                1, int(k),
            ),
            ">",
        ).alias("path")
    )
    return per_session.groupBy("path").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
