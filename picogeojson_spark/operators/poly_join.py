"""Polygon-polygon intersection join (cell-cover candidates + exact refine).

The candidate stage rasterizes BOTH sides into fixed-level grid cells
(Raster-Intervals-style approximation, SIGMOD 2023 — realized as the
materialized-cell equi-join Catalyst already optimizes, same as pip_join):
two polygons can only intersect if their bbox covers share a cell at the
common level, so the equi-join on ``cell`` is a complete candidate
generator. The refine step then decides exactly with the geometry kernel
(``polygons_intersect``: winding-number vertex containment + vectorized
proper edge-crossing).

Unlike pip_join's adaptive cover (fine for point ancestors), BOTH sides
here must cover at the SAME fixed level — mixed per-polygon levels would
break cell equality and silently drop pairs — so ``max_cells`` is a hard
error, not a fallback: raise the level if your polygons are too big.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo.cells import cover_bbox


def _fixed_cover_df(polygons: DataFrame, id_col: str, level: int,
                    max_cells: int) -> DataFrame:
    import pandas as pd

    from ..geo.bounds import geometry_bbox

    def cover(batches):
        for pdf in batches:
            out_cell, out_pid, out_geom = [], [], []
            for pid, gj in zip(pdf[id_col], pdf["geometry_json"]):
                g = json.loads(gj)
                bb = geometry_bbox(g)
                ndim = len(bb) // 2
                # min_level=level pins the cover at the fixed level (no
                # coarsening walk); the size guard below is then a hard error
                cells = cover_bbox(bb[0], bb[1], bb[ndim], bb[ndim + 1],
                                   level, max_cells=max_cells, min_level=level)
                if len(cells) > max_cells:
                    raise ValueError(
                        "polygon {} covers {} cells at level {} (> {}); "
                        "use a coarser level".format(pid, len(cells), level,
                                                     max_cells))
                out_cell.extend(int(c) for c in cells)
                out_pid.extend([pid] * len(cells))
                out_geom.extend([gj] * len(cells))
            yield pd.DataFrame(
                {"cell": out_cell, id_col: out_pid, "geometry_json": out_geom}
            )

    return polygons.select(id_col, "geometry_json").coalesce(8).mapInPandas(
        cover, schema="cell long, {} long, geometry_json string".format(id_col)
    )


def _max_extent(polygons: DataFrame) -> tuple:
    """(max bbox width, max bbox height) over a polygon table — one cheap
    aggregation used by auto-level selection."""
    import pandas as pd

    from ..geo.bounds import geometry_bbox

    def extents(batches):
        for pdf in batches:
            w = h = 0.0
            for gj in pdf["geometry_json"]:
                bb = geometry_bbox(json.loads(gj))
                nd = len(bb) // 2
                w = max(w, bb[nd] - bb[0])
                h = max(h, bb[nd + 1] - bb[1])
            yield pd.DataFrame({"w": [w], "h": [h]})

    r = (polygons.select("geometry_json").mapInPandas(
            extents, schema="w double, h double")
         .agg(F.max("w").alias("w"), F.max("h").alias("h")).first())
    return float(r["w"] or 0.0), float(r["h"] or 0.0)


def choose_poly_level(max_w: float, max_h: float, max_cells: int = 4096,
                      finest: int = 12) -> int:
    """Finest level at which the largest bbox still covers <= max_cells
    cells (finer level = tighter candidate pruning; the fixed-level
    constraint means one size must fit all)."""
    for level in range(finest, -1, -1):
        cs = 180.0 / (2 ** level)
        if (max_w / cs + 2) * (max_h / cs + 2) <= max_cells:
            return level
    return 0


def polygon_intersection_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    level: int = None,
    max_cells: int = 4096,
    broadcast_b: bool = True,
) -> DataFrame:
    """(a_id, b_id) pairs of strictly-overlapping polygons.

    ``polys_a``: (a_id, geometry_json); ``polys_b``: (b_id, geometry_json).
    ``level=None`` auto-tunes: two cheap max-extent aggregations pick the
    finest level at which every polygon's cover fits ``max_cells`` — a
    wrong manual level is a hard error (never silent truncation), so auto
    is the safe default. Degenerate touching (shared edges / vertex
    contacts) is out of contract — see geo/polyjoin.py.
    """
    if level is None:
        wa, ha = _max_extent(polys_a)
        wb, hb = _max_extent(polys_b)
        level = choose_poly_level(max(wa, wb), max(ha, hb), max_cells)
    import pandas as pd

    from ..geo.polyjoin import polygons_intersect

    ca = _fixed_cover_df(polys_a, "a_id", level, max_cells)
    cb = _fixed_cover_df(polys_b, "b_id", level, max_cells)
    if broadcast_b:
        cb = F.broadcast(cb)
    cand = (
        ca.join(cb.withColumnRenamed("geometry_json", "geometry_json_b"),
                on="cell")
        .select("a_id", "geometry_json", "b_id", "geometry_json_b")
        .dropDuplicates(["a_id", "b_id"])
    )

    def refine(batches):
        cache = {}
        for pdf in batches:
            keep_a, keep_b = [], []
            for a_id, gja, b_id, gjb in zip(pdf["a_id"], pdf["geometry_json"],
                                            pdf["b_id"], pdf["geometry_json_b"]):
                ga = cache.get(("a", a_id))
                if ga is None:
                    ga = json.loads(gja)
                    cache[("a", a_id)] = ga
                gb = cache.get(("b", b_id))
                if gb is None:
                    gb = json.loads(gjb)
                    cache[("b", b_id)] = gb
                if polygons_intersect(ga, gb):
                    keep_a.append(int(a_id))
                    keep_b.append(int(b_id))
            yield pd.DataFrame({"a_id": keep_a, "b_id": keep_b})

    return cand.mapInPandas(refine, schema="a_id long, b_id long")
