"""Grid-based DBSCAN spatial clustering (density clusters over a point
table, cell-granular).

The classic DBSCAN neighborhood query is an all-pairs radius join — a
non-starter at 100 TB. The standard distributed relaxation (grid DBSCAN,
the cell-level variant of Dai & Lin's MR-DBSCAN partitioning) evaluates
density at eps-cell granularity:

1. snap every point to an eps-sized grid cell (pure integer expressions,
   rides the scan);
2. ONE groupBy(cell) produces occupied-cell counts — the only corpus-sized
   shuffle in the operator;
3. cells with >= min_pts points are CORE cells; a cluster is a connected
   component of core cells under 8-neighborhood adjacency. Adjacency is an
   8-offset explode + self EQUI-join on the packed cell key (never a theta
   join), and the components run on the *cell* graph — orders of magnitude
   smaller than the point table — via the same O(log n) large-star /
   small-star rounds as ``dedup.duplicate_clusters``;
4. points in core cells take their cell's component id; points in
   non-core cells adjacent (8-neighborhood) to a core cell are BORDER
   points and take the minimum neighboring cluster id; everything else is
   noise (cluster_id = -1).

All arithmetic is integer micro-degrees, so the contract is deterministic
and the DuckDB oracle replays it bit-for-bit (component ids = min packed
cell key, via a recursive-CTE closure — same proof shape as
``dedup_clusters``).

Determinism note: truncating vs flooring division differs between engines
for negatives (repo rule), so cell coordinates use ``floor(x / eps)`` on
doubles — exact here because |lon_u| <= 1.8e8 is far inside 2^53 and the
quotient is never within 2e-6 of a non-attained integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import duplicate_clusters

# packed key = (cx + _B) * 2 * _B + (cy + _B); |cx|,|cy| < _B asserted by
# the eps lower bound below (eps >= 200 udeg -> |cx| <= 900_000 < 2^20).
_B = 1 << 20

_NEIGHBOR_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                     if not (dx == 0 and dy == 0)]


def _cell_cols(lon, lat, eps_udeg: int):
    lon_u = F.floor(lon * 1e6).cast("long")
    lat_u = F.floor(lat * 1e6).cast("long")
    cx = F.floor(lon_u / F.lit(float(eps_udeg))).cast("long")
    cy = F.floor(lat_u / F.lit(float(eps_udeg))).cast("long")
    return cx, cy


def _pack(cx, cy):
    return (cx + F.lit(_B)) * F.lit(2 * _B) + (cy + F.lit(_B))


def grid_heatmap(
    points: DataFrame,
    cell_udeg: int = 2_000_000,
    id_col: str = "point_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Spatial heatmap: per-cell point counts plus the 3x3
    box-smoothed density (the classic hotspot / KDE-lite raster) -> one
    row per OCCUPIED cell: ``(cx, cy, cnt, smoothed)`` where ``smoothed``
    sums the counts of the cell and its 8 neighbors.

    Scale shape: ONE corpus-sized shuffle (the cell histogram); smoothing
    is a 9-offset explode of the *cell* table re-aggregated on the packed
    target key — shuffle volume 9x the occupied-cell count, independent of
    the point count. Never a theta join.
    """
    if cell_udeg < 200:
        raise ValueError("cell_udeg must be >= 200 (cell key packing bound)")
    cx, cy = _cell_cols(F.col(lon_col), F.col(lat_col), cell_udeg)
    cells = (
        points.select(cx.alias("cx"), cy.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count("*").alias("cnt"))
        .withColumn("k", _pack(F.col("cx"), F.col("cy")))
    )
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    contrib = (
        cells.select("cnt", F.explode(offs).alias("o"), "cx", "cy")
        .select(
            _pack(F.col("cx") + F.col("o.dx"),
                  F.col("cy") + F.col("o.dy")).alias("k"),
            F.col("cnt"),
        )
        .groupBy("k")
        .agg(F.sum("cnt").alias("smoothed"))
    )
    return (
        cells.join(contrib, on="k", how="inner")
        .select("cx", "cy", F.col("cnt").cast("long").alias("cnt"),
                F.col("smoothed").cast("long").alias("smoothed"))
    )


def grid_dbscan(
    points: DataFrame,
    eps_udeg: int = 500_000,
    min_pts: int = 2,
    id_col: str = "point_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Cluster a point table -> one row per point:
    ``(point_id, cluster_id, role)`` with ``cluster_id`` the minimum
    packed cell key of the point's component (-1 for noise) and ``role``
    in {'core', 'border', 'noise'}.

    ``eps_udeg`` is the grid pitch in integer micro-degrees (>= 200).
    """
    if eps_udeg < 200:
        raise ValueError("eps_udeg must be >= 200 (cell key packing bound)")

    cx, cy = _cell_cols(F.col(lon_col), F.col(lat_col), eps_udeg)
    pts = points.select(
        F.col(id_col).alias("point_id"),
        cx.alias("cx"), cy.alias("cy"), _pack(cx, cy).alias("k"),
    )

    # the ONLY corpus-sized shuffle: occupied-cell histogram.
    cells = pts.groupBy("cx", "cy", "k").agg(F.count("*").alias("cnt"))
    core = cells.filter(F.col("cnt") >= F.lit(int(min_pts))).select(
        "cx", "cy", "k")

    # 8-neighbor adjacency between CORE cells: bounded explode + equi-join
    # on the packed neighbor key (core-cell table is tiny next to points,
    # so AQE broadcasts it).
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in _NEIGHBOR_OFFSETS
    ])
    nbr = (
        core.select(
            F.col("k").alias("u"),
            F.explode(offs).alias("o"),
            F.col("cx"), F.col("cy"),
        )
        .select(
            "u",
            _pack(F.col("cx") + F.col("o.dx"),
                  F.col("cy") + F.col("o.dy")).alias("v"),
        )
    )
    edges = (
        nbr.join(core.select(F.col("k").alias("v")), on="v", how="inner")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
    )

    # components of the CELL graph (not the point graph) — O(log n)
    # star rounds; isolated core cells stay their own cluster.
    comp = duplicate_clusters(edges, src="u", dst="v").select(
        F.col("doc_id").alias("k"), F.col("rep_id").alias("cluster_id"))
    core_clusters = (
        core.join(comp, on="k", how="left")
        .select("k", "cx", "cy",
                F.coalesce("cluster_id", "k").alias("cluster_id"))
    )

    # border resolution: for every occupied NON-core cell, the minimum
    # cluster id among its 8 core neighbors (if any) — again a bounded
    # explode + equi-join on the cell table only.
    non_core = cells.join(
        core_clusters.select("k"), on="k", how="left_anti")
    border_map = (
        non_core.select(
            F.col("k"), F.explode(offs).alias("o"),
            F.col("cx"), F.col("cy"),
        )
        .select(
            "k",
            _pack(F.col("cx") + F.col("o.dx"),
                  F.col("cy") + F.col("o.dy")).alias("nk"),
        )
        .join(
            core_clusters.select(F.col("k").alias("nk"), "cluster_id"),
            on="nk", how="inner",
        )
        .groupBy("k")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )

    cell_roles = (
        core_clusters.select("k", "cluster_id", F.lit("core").alias("role"))
        .unionByName(
            border_map.select("k", "cluster_id",
                              F.lit("border").alias("role")))
    )
    return (
        pts.join(cell_roles, on="k", how="left")
        .select(
            "point_id",
            F.coalesce("cluster_id", F.lit(-1)).cast("long")
            .alias("cluster_id"),
            F.coalesce("role", F.lit("noise")).alias("role"),
        )
    )
