"""Table-maintenance planning: small-file compaction (Iceberg-style).

A 100 TB table accretes millions of small files (streaming commits, late
partitions); the maintenance job that matters is the PLANNER — deciding
which files merge into which rewrite task — because the manifest is the
only thing that must be processed centrally.  This module plans over the
file-stats manifest alone (file id, partition, byte size), never touching
data files, so the plan step costs O(manifest), not O(table).

Packing strategy: within each partition, files already at or above the
target stay untouched (``keep``); the rest sort by (size DESC, id ASC)
and pack by prefix-sum — ``bin = cumsum_before div target`` — the
"sorted next-fit" heuristic.  It is ONE window over the manifest (no
sequential fold, no driver loop), deterministic under any partitioning,
with the cumulative guarantee: every prefix of k bins holds >= k *
target bytes, every single bin stays under 2 * target, and the bin
count is within one of the volume lower bound ceil(total / target) —
bounded waste without first-fit's inherently sequential state.

Scale shape: one hash exchange of the manifest by partition key, two
windows (pack order, then per-bin rollup), zero joins.  Skewed
partitions (one partition holding millions of files) remain a single
window partition — at that point split the pack key by a size-class
salt; the bin ids stay deterministic because the salt derives from the
sort key itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    manifest: DataFrame,
    target_bytes: int,
    part_col: str = "part",
    file_col: str = "file_id",
    size_col: str = "bytes",
) -> DataFrame:
    """Plan small-file compaction per partition.

    Returns the manifest annotated with ``action`` ('keep' for files
    >= target, 'compact' otherwise), ``bin`` (the rewrite-task id within
    the partition; NULL for keeps), and per-bin ``n_in_bin`` /
    ``bin_bytes`` rollups (NULL for keeps).
    """
    small = F.col(size_col) < F.lit(int(target_bytes))
    w_pack = (
        Window.partitionBy(part_col, "_small")
        .orderBy(F.desc(size_col), F.asc(file_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    df = (
        manifest
        .withColumn("_small", small)
        .withColumn(
            "_before",
            F.when(
                F.col("_small"),
                F.coalesce(F.sum(size_col).over(w_pack), F.lit(0)),
            ).cast("long"))
        .withColumn(
            "bin",
            F.when(F.col("_small"),
                   F.expr("div(_before, {t})".format(t=int(target_bytes))))
            .cast("long"))
    )
    w_bin = Window.partitionBy(part_col, "_small", "bin")
    return (
        df.withColumn(
            "n_in_bin",
            F.when(F.col("_small"), F.count("*").over(w_bin))
            .cast("long"))
        .withColumn(
            "bin_bytes",
            F.when(F.col("_small"), F.sum(size_col).over(w_bin))
            .cast("long"))
        .withColumn(
            "action",
            F.when(F.col("_small"), F.lit("compact")).otherwise("keep"))
        .drop("_small", "_before")
    )
