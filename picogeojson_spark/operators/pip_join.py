"""Point-in-polygon join: cell-prefix pre-filter + vectorized exact refine.

Scale design (SURVEY §2.11):

- polygons are covered with cells at an adaptive level (``cover_bbox`` walks
  to a coarser level when a bbox would need more than ``max_cells`` cells),
  then exploded to (cell, poly) rows;
- points emit their cell **plus its ancestors** down to ``min_level`` — an
  array of ~(level - min_level + 1) ids, exploded — so a point equi-joins a
  polygon regardless of which level the polygon's cover chose. The spatial
  theta-join becomes a plain equi-join that Catalyst/AQE already optimizes
  (broadcast when the polygon side is small, skew-split when a hot cell
  dominates);
- candidates are refined by the exact numpy winding-number kernel inside one
  ``mapInPandas`` (geometries parsed once per distinct polygon per batch, PIP
  vectorized over that polygon's candidate points);
- the per-(point,poly) match is unique by construction (one cover level per
  polygon, ancestors are distinct levels), so no dedup shuffle is needed.

Skew: pass ``salt > 1`` to replicate the (small) polygon side ``salt`` ways
and scatter points across replicas — defeats a single hot cell hashing to one
shuffle partition. AQE's skew-join handles the rest.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo.cells import DEFAULT_LEVEL, LEVEL_SHIFT, X_SHIFT, cover_bbox_ints

MIN_LEVEL = 6


def polygon_cover_df(polygons: DataFrame, level: int = DEFAULT_LEVEL,
                     max_cells: int = 64, min_level: int = MIN_LEVEL) -> DataFrame:
    """polygons(poly_id, geometry_json, [bbox]) -> (cell, poly_id, geometry_json).

    The cover's coarse-level fallback is floored at ``min_level`` so it can
    never drop below the point side's ancestor range (which would silently
    miss pairs); continent-sized polygons therefore pay more cover cells
    rather than losing correctness.
    """
    import pandas as pd

    def cover(batches):
        for pdf in batches:
            out_cell, out_pid, out_geom = [], [], []
            for pid, gj in zip(pdf["poly_id"], pdf["geometry_json"]):
                g = json.loads(gj)
                from ..geo.bounds import geometry_bbox

                bb = geometry_bbox(g)
                ndim = len(bb) // 2
                cells = cover_bbox_ints(bb[0], bb[1], bb[ndim], bb[ndim + 1],
                                        level, max_cells, min_level=min_level)
                out_cell.extend(cells)
                out_pid.extend([pid] * len(cells))
                out_geom.extend([gj] * len(cells))
            yield pd.DataFrame(
                {"cell": out_cell, "poly_id": out_pid, "geometry_json": out_geom}
            )

    # polygon tables are usually tiny next to the point side: coalesce so the
    # cover UDF pays a handful of python-worker round trips, not one per core
    # — but never below the cluster's task slots, so a LARGE polygon table
    # (country-scale admin boundaries at production) still covers in parallel
    slots = polygons.sparkSession.sparkContext.defaultParallelism
    src = polygons.select("poly_id", "geometry_json").coalesce(max(8, slots))
    return src.mapInPandas(
        cover, schema="cell long, poly_id long, geometry_json string"
    )


def cell_expr(lon, lat, level: int):
    """JVM-side replica of ``geo.cells.cell_of``: same double arithmetic in
    the same order (add, divide, multiply, floor — all IEEE-754 binary64 on
    both sides), same clip, same bit packing, so the produced cell ids are
    BIT-IDENTICAL to the numpy kernel (pinned by a differential test over
    random points plus the ±180/±90 edges). Being a plain expression it
    runs in whole-stage codegen — no Python worker on the point side."""
    from ..geo.cells import grid_shape

    nx, ny = grid_shape(level)
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(nx)))
    y = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(ny)))
    x = F.least(F.greatest(x, F.lit(0).cast("long")),
                F.lit(int(nx - 1)).cast("long"))
    y = F.least(F.greatest(y, F.lit(0).cast("long")),
                F.lit(int(ny - 1)).cast("long"))
    return (
        F.lit(int(level) << LEVEL_SHIFT).cast("long")
        .bitwiseOR(F.shiftleft(x, X_SHIFT))
        .bitwiseOR(y)
    )


def point_ancestors_df(points: DataFrame, level: int = DEFAULT_LEVEL,
                       min_level: int = MIN_LEVEL) -> DataFrame:
    """points(point_id, lon, lat) -> (cell, point_id, lon, lat), one row per
    ancestor level so mixed-level polygon covers still equi-join.

    Pure JVM expressions (``cell_expr`` per level, one array explode): the
    point side — unbounded at production scale — pays NO Python stage here,
    which also leaves the exact-refine UDF as the only Python stage in the
    whole pip_join pipeline (chained mapInPandas UDFs in one stage
    oversubscribe python workers; see CLAUDE.md)."""
    cells = F.array(*[
        cell_expr(F.col("lon"), F.col("lat"), lv)
        for lv in range(min_level, level + 1)
    ])
    return points.select(
        F.explode(cells).alias("cell"), "point_id", "lon", "lat"
    )


#: geometry-cache capacity for the refine stage. A worker holding the
#: full candidate stream for > cap distinct polygons evicts least-recently
#: -used geometries instead of silently stopping to cache (the pre-round-4
#: behavior re-parsed every polygon past #4096 on EVERY batch — a per-batch
#: O(distinct polys) JSON parse at country-scale polygon tables).
REFINE_GEOM_CACHE_CAP = 4096


def _refine_batches(batches, cache_cap=REFINE_GEOM_CACHE_CAP, stats=None):
    """Core of the refine stage, Spark-free for unit testing: a generator
    over pandas batches of (point_id, lon, lat, poly_id, geometry_json)
    yielding exact (point_id, poly_id) PIP pairs.

    Geometries are parsed at most once while they stay inside the LRU cache
    (``cache_cap`` entries per worker); ``stats`` (a dict) receives a
    ``parses`` counter so tests can assert the re-parse bound directly.
    """
    import collections

    import numpy as np
    import pandas as pd

    from ..geo.pip import points_in_geometry

    geom_cache = collections.OrderedDict()
    if stats is not None:
        stats.setdefault("parses", 0)
    for pdf in batches:
        if len(pdf) == 0:
            continue
        keep_pid, keep_poly = [], []
        # group on the int key only; parse each polygon once per worker
        for poly_id, grp in pdf.groupby("poly_id", sort=False):
            geom = geom_cache.get(poly_id)
            if geom is None:
                geom = json.loads(grp["geometry_json"].iloc[0])
                if stats is not None:
                    stats["parses"] += 1
                geom_cache[poly_id] = geom
                if len(geom_cache) > cache_cap:
                    geom_cache.popitem(last=False)
            else:
                geom_cache.move_to_end(poly_id)
            xs = grp["lon"].to_numpy(dtype=np.float64)
            ys = grp["lat"].to_numpy(dtype=np.float64)
            mask = points_in_geometry(xs, ys, geom)
            if mask.any():
                pids = grp["point_id"].to_numpy()[mask]
                keep_pid.extend(int(p) for p in pids)
                keep_poly.extend([int(poly_id)] * int(mask.sum()))
        yield pd.DataFrame({"point_id": keep_pid, "poly_id": keep_poly})


def _refine(candidates: DataFrame) -> DataFrame:
    """(point_id, lon, lat, poly_id, geometry_json) -> exact PIP pairs."""

    return candidates.mapInPandas(
        _refine_batches, schema="point_id long, poly_id long"
    )


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    level: int = DEFAULT_LEVEL,
    max_cells: int = 64,
    min_level: int = MIN_LEVEL,
    broadcast_polys: bool = None,
    salt: int = 1,
    broadcast_budget_bytes: int = 32 << 20,
) -> DataFrame:
    """Exact point-in-polygon join -> DataFrame(point_id, poly_id).

    ``points``: (point_id, lon, lat); ``polygons``: (poly_id, geometry_json).

    ``broadcast_polys=None`` (default) auto-sizes: one narrow aggregate over
    the raw polygon table estimates the exploded cover's bytes; at or under
    ``broadcast_budget_bytes`` the cover side is broadcast-hinted (the
    point side — unbounded at production scale — then never shuffles at
    all), above it the join is left unhinted and AQE picks the strategy
    from runtime sizes (including a runtime broadcast if the estimate was
    pessimistic). Catalyst cannot make this call itself because the cover
    is a Python-UDF output with no size statistics — an unconditional hint
    here would force a country-scale polygon table into one broadcast.
    Pass True/False to skip the estimate job and decide explicitly.
    """
    if broadcast_polys is None:
        est_row = polygons.agg(
            F.count("*").alias("n"),
            F.sum(F.length("geometry_json")).alias("geom_bytes"),
        ).first()
        n_polys = int(est_row["n"])
        geom_bytes = int(est_row["geom_bytes"] or 0)
        # each polygon's geometry string is replicated once per cover cell;
        # typical adaptive covers use ~4-16 cells (ceiling max_cells), and a
        # salted join replicates the whole side again. 16x is deliberately
        # pessimistic for the common case — AQE still broadcasts an unhinted
        # join at runtime when the real cover turns out small.
        est = 16 * max(salt, 1) * (geom_bytes + 24 * n_polys)
        broadcast_polys = est <= broadcast_budget_bytes

    polys = polygon_cover_df(polygons, level, max_cells, min_level)
    pts = point_ancestors_df(points, level, min_level)

    if salt > 1:
        polys = polys.crossJoin(
            F.broadcast(polys.sparkSession.range(salt).select(
                F.col("id").cast("int").alias("salt")))
        )
        pts = pts.withColumn(
            "salt", (F.pmod(F.xxhash64("point_id"), F.lit(salt))).cast("int")
        )
        join_keys = ["cell", "salt"]
    else:
        join_keys = ["cell"]

    if broadcast_polys:
        polys = F.broadcast(polys)

    candidates = pts.join(polys, on=join_keys).select(
        "point_id", "lon", "lat", "poly_id", "geometry_json"
    )
    return _refine(candidates)
