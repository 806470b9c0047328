"""Training-shard packing: assign documents to fixed-budget contiguous
shards of the concatenated token stream — the layout step a pre-training
pipeline runs after curation (docs are concatenated in a deterministic
order and the stream is cut every ``budget`` tokens; a document's shard is
``floor(exclusive_prefix_sum / budget)``).

The naive Spark formulation — ``SUM(w) OVER (ORDER BY id)`` with no
PARTITION BY — collapses the whole corpus into ONE window task and cannot
scale. This module implements the classic two-level scan instead:

1. per-bucket cumulative sums (parallel: window partitioned by a coarse
   id-derived bucket),
2. bucket totals (tiny — one row per bucket) prefixed by a single-partition
   window over *buckets only*, broadcast-joined back as offsets.

At 10^10 docs and ``bucket_width`` 2^20 the serial step sees ~10^4 rows;
everything corpus-sized stays hash/range-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_token_shards(docs: DataFrame, budget: int,
                      weight_col: str = "n_chars",
                      id_col: str = "doc_id",
                      bucket_width: int = 65536) -> DataFrame:
    """Assign each document a position and shard in the concatenated
    ``weight_col`` stream ordered by ``id_col`` (must be integral — the
    bucket is ``id div bucket_width``, which preserves id order across
    buckets so the two-level prefix sum equals the global one).

    Output: ``(doc_id, weight, start_offset, shard_id)`` where
    ``start_offset`` is the exclusive prefix sum of weights in id order and
    ``shard_id = start_offset div budget``. Deterministic and reproducible
    at any parallelism: both levels are pure functions of (id, weight).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(weight_col).cast("long").alias("weight"),
    ).withColumn(
        "bucket", F.expr("doc_id div {w}".format(w=int(bucket_width)))
    )
    w_local = Window.partitionBy("bucket").orderBy("doc_id")
    d = d.withColumn(
        "local_excl",
        F.coalesce(F.sum("weight").over(w_local), F.lit(0)) - F.col("weight"),
    )
    totals = d.groupBy("bucket").agg(F.sum("weight").alias("btot"))
    w_bucket = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("btot").over(w_bucket), F.lit(0)).alias("boff"),
    )
    return (
        d.join(F.broadcast(offsets), on="bucket")
        .select(
            "doc_id",
            "weight",
            (F.col("boff") + F.col("local_excl")).cast("long")
            .alias("start_offset"),
            F.expr(
                "CAST((boff + local_excl) div {b} AS BIGINT)".format(
                    b=int(budget)
                )
            ).alias("shard_id"),
        )
    )
