"""Spatial storage layout: cell-partitioned parquet + pruned range reads.

The 100 TB lever this module provides: a features/points table written
``partitionBy`` a coarse spatial cell means a bbox query touches only the
matching directories — Catalyst partition-prunes the scan *before* any task
launches, so a city-sized query over a planet-sized table reads a handful of
files instead of 100 TB. This composes with (not replaces) the in-file
levers: predicate pushdown on ``lon``/``lat`` min/max stats prunes row
groups inside each kept partition.

Layout key: ``cell_p`` — the level-``part_level`` ancestor of each row's
point cell. Coarse on purpose: partition counts must stay in the thousands
(HDFS/S3 listing cost, small-file pressure), while row-group stats handle
the fine-grained pruning inside each partition.

In production (Iceberg) the same layout is a *hidden* partition transform —
``PARTITIONED BY (truncate(...))``-style on the cell id — plus data-file
sorting by cell for locality; this module is the parquet stand-in with
identical semantics (see sources/catalog.py for the DDL mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo.cells import DEFAULT_LEVEL, cover_bbox

DEFAULT_PART_LEVEL = 3  # 16x8 grid -> <=128 directories


def with_partition_cell(points: DataFrame, cell_col: str = "cell",
                        part_level: int = DEFAULT_PART_LEVEL,
                        cell_level: int = DEFAULT_LEVEL) -> DataFrame:
    """Attach ``cell_p``: the coarse ancestor of ``cell_col``, JVM-side.

    Cell ids pack (level, x, y) with x occupying bits [X_SHIFT, ...] and y
    the low bits; the ancestor is a pure bit-shift of each coordinate, which
    ``parent`` implements — replicated here as an expression so no Python
    runs per row.
    """
    from ..geo.cells import X_SHIFT

    drop = cell_level - part_level
    if drop < 0:
        raise ValueError("part_level must be <= cell_level")
    x = F.shiftright(F.col(cell_col), X_SHIFT).bitwiseAND(F.lit((1 << 29) - 1))
    y = F.col(cell_col).bitwiseAND(F.lit((1 << X_SHIFT) - 1))
    cell_p = (
        (F.lit(part_level).cast("long") * F.lit(2**58))
        + (F.shiftright(x, drop) * F.lit(2**X_SHIFT))
        + F.shiftright(y, drop)
    )
    return points.withColumn("cell_p", cell_p)


def write_cell_partitioned(points: DataFrame, path: str,
                           cell_col: str = "cell",
                           part_level: int = DEFAULT_PART_LEVEL,
                           cell_level: int = DEFAULT_LEVEL) -> None:
    """Write parquet partitioned by coarse cell, rows Z-ordered (Morton key
    of the fine cell) within each partition — row groups stay spatially
    compact in both axes, so lon/lat min/max stats prune tighter than an
    x-major sort for bbox reads."""
    (
        with_partition_cell(points, cell_col, part_level, cell_level)
        .withColumn("__z", morton_key(cell_col))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .partitionBy("cell_p")
        .parquet(path)
    )


def read_bbox_pruned(spark, path: str, xmin: float, ymin: float,
                     xmax: float, ymax: float,
                     part_level: int = DEFAULT_PART_LEVEL) -> DataFrame:
    """Scan only the partitions whose coarse cell intersects the bbox.

    The ``cell_p IN (...)`` predicate is a partition filter (directory-level
    prune, visible as PartitionFilters in the formatted plan); the lon/lat
    bounds then push down into the kept files as ordinary parquet filters.

    ``xmin > xmax`` means the query bbox crosses the antimeridian (the same
    convention the dateline kernel splits on): the read becomes the union of
    the two disjoint lon ranges, each pruned independently.
    """
    if xmin > xmax:
        west = read_bbox_pruned(spark, path, xmin, ymin, 180.0, ymax, part_level)
        east = read_bbox_pruned(spark, path, -180.0, ymin, xmax, ymax, part_level)
        return west.unionByName(east)
    cells = cover_bbox(xmin, ymin, xmax, ymax, level=part_level)
    df = spark.read.parquet(path).filter(
        F.col("cell_p").isin([int(c) for c in cells])
    )
    return df.filter(
        (F.col("lon") >= xmin) & (F.col("lon") <= xmax)
        & (F.col("lat") >= ymin) & (F.col("lat") <= ymax)
    )


def _spread_bits(col):
    """Interleave-ready bit spread (29-bit value -> even bit positions),
    classic Morton magic-number spreading as JVM expressions."""
    masks = [
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    ]
    v = col
    for shift, mask in masks:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def morton_key(cell_col: str = "cell"):
    """Z-order key for a cell id: interleaves the cell's x and y grid
    coordinates so lexicographic order follows the Z space-filling curve.
    Sorting data files by this key (instead of raw x-major cell ids) keeps
    each parquet row group spatially compact in BOTH axes, so min/max stats
    prune better for bbox reads — the same lever as lakehouse Z-ordering.
    """
    from ..geo.cells import X_SHIFT

    x = F.shiftright(F.col(cell_col), X_SHIFT).bitwiseAND(F.lit((1 << 29) - 1))
    y = F.col(cell_col).bitwiseAND(F.lit((1 << X_SHIFT) - 1))
    return _spread_bits(x).bitwiseOR(F.shiftleft(_spread_bits(y), 1))
