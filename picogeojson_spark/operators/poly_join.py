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


def polygon_intersection_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    level: int = 6,
    max_cells: int = 4096,
    broadcast_b: bool = True,
) -> DataFrame:
    """(a_id, b_id) pairs of strictly-overlapping polygons.

    ``polys_a``: (a_id, geometry_json); ``polys_b``: (b_id, geometry_json).
    Degenerate touching (shared edges / vertex contacts) is out of contract
    — see geo/polyjoin.py.
    """
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
