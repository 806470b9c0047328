"""Map-matching lite: snap points to their nearest road segment.

The missing third primitive of the spatial-join family — pip_join answers
"which polygon CONTAINS the point", knn_join "which point is NEAREST";
this answers "which SEGMENT is nearest and where along it" — GPS pings
onto a road network, geotagged pages onto a coastline/route graph.

Geometry is exact integer rationals on the micro-degree lattice: with
``AB = B - A``, ``AP = P - A``::

    L2    = |AB|^2                      (segment length squared)
    tnum  = AP . AB                     (unclamped projection numerator)
    d^2   = |AP|^2                 when tnum <= 0 or L2 = 0   (before A)
          = |BP|^2                 when tnum >= L2            (past B)
          = (|AP|^2 * L2 - tnum^2) / L2  otherwise            (interior)

The interior case runs in decimal(38,0) (DuckDB: HUGEINT) — with the
radius prefilter, ``|AP|^2 * L2`` stays ~1e26, far inside 38 digits but
far outside int64.  The emitted distance is ``floor(d^2)`` in udeg^2 and
the ranking contract is (floor(d^2) ASC, seg_id ASC) — deterministic on
both engines; sub-udeg^2 ties resolve by segment id.  ``t_ppm`` is the
clamped projection parameter in ppm (0 = at A, 1e6 = at B): the actual
map-matching output.

Scale shape: segments cover their radius-expanded bbox on a grid of
``cell_udeg >= radius`` cells (bounded fan-out, ``max_cells`` raises on
degenerate geometry); each point hashes to its SINGLE cell, so the
candidate join is one equi-join on the packed cell key — points never
explode, and a point-segment pair can only meet in one cell, so no
dedup pass.  Hot cells (urban road density) are AQE skew-join
territory.  Points with no segment inside ``radius`` drop out (inner
contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_B = 1 << 20  # packed cell key bound (same packing as segjoin)


def _cell(c, cell_udeg: int):
    return F.floor(c / F.lit(float(cell_udeg))).cast("long")


def snap_to_segments(
    points: DataFrame,
    segs: DataFrame,
    radius_udeg: int,
    cell_udeg: int | None = None,
    max_cells: int = 4096,
) -> DataFrame:
    """``points``: ``(point_id, px, py)``; ``segs``: ``(seg_id, ax, ay,
    bx, by)`` — all integer micro-degrees.  Returns one row per matched
    point: ``(point_id, seg_id, d2_udeg2, t_ppm)`` for the nearest
    segment within ``radius_udeg`` (Euclidean on the lattice)."""
    cell = int(cell_udeg or radius_udeg)
    if cell < radius_udeg:
        raise ValueError("cell_udeg must be >= radius_udeg "
                         "(single-cell point join relies on it)")
    r = int(radius_udeg)

    p = points.select(
        "point_id", "px", "py",
        ((_cell(F.col("px"), cell) + F.lit(_B)) * F.lit(2 * _B)
         + _cell(F.col("py"), cell) + F.lit(_B)).alias("k"),
    )
    s = segs.select(
        "seg_id", "ax", "ay", "bx", "by",
        _cell(F.least("ax", "bx") - F.lit(r), cell).alias("cx0"),
        _cell(F.greatest("ax", "bx") + F.lit(r), cell).alias("cx1"),
        _cell(F.least("ay", "by") - F.lit(r), cell).alias("cy0"),
        _cell(F.greatest("ay", "by") + F.lit(r), cell).alias("cy1"),
    )
    ncells = ((F.col("cx1") - F.col("cx0") + 1)
              * (F.col("cy1") - F.col("cy0") + 1))
    s = s.filter(
        F.when(ncells <= F.lit(int(max_cells)), F.lit(True)).otherwise(
            F.raise_error(F.concat(
                F.lit("segment covers more than %d cells; raise "
                      "cell_udeg (seg_id=" % int(max_cells)),
                F.col("seg_id").cast("string"), F.lit(")")))))
    cov = (
        s.select("seg_id", "ax", "ay", "bx", "by", "cy0", "cy1",
                 F.explode(F.sequence("cx0", "cx1")).alias("cx"))
        .select("seg_id", "ax", "ay", "bx", "by", "cx",
                F.explode(F.sequence("cy0", "cy1")).alias("cy"))
        .select("seg_id", "ax", "ay", "bx", "by",
                ((F.col("cx") + F.lit(_B)) * F.lit(2 * _B)
                 + F.col("cy") + F.lit(_B)).alias("k"))
    )

    cand = p.join(cov, on="k")
    l2 = ((F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax"))
          + (F.col("by") - F.col("ay")) * (F.col("by") - F.col("ay")))
    apx, apy = F.col("px") - F.col("ax"), F.col("py") - F.col("ay")
    bpx, bpy = F.col("px") - F.col("bx"), F.col("py") - F.col("by")
    scored = cand.select(
        "point_id", "seg_id",
        l2.cast("long").alias("l2"),
        (apx * apx + apy * apy).cast("long").alias("ap2"),
        (bpx * bpx + bpy * bpy).cast("long").alias("bp2"),
        (apx * (F.col("bx") - F.col("ax"))
         + apy * (F.col("by") - F.col("ay"))).cast("long").alias("tnum"),
    ).select(
        "point_id", "seg_id",
        F.when((F.col("l2") == 0) | (F.col("tnum") <= 0), F.col("ap2"))
        .when(F.col("tnum") >= F.col("l2"), F.col("bp2"))
        .otherwise(F.expr(
            "div(cast(ap2 as decimal(38,0)) * l2"
            " - cast(tnum as decimal(38,0)) * tnum, l2)"))
        .cast("long").alias("d2_udeg2"),
        F.when((F.col("l2") == 0) | (F.col("tnum") <= 0), F.lit(0))
        .when(F.col("tnum") >= F.col("l2"), F.lit(1000000))
        .otherwise(F.expr(
            "div(cast(tnum as decimal(38,0)) * 1000000, l2)"))
        .cast("long").alias("t_ppm"),
    ).filter(F.col("d2_udeg2") <= F.lit(r * r).cast("long"))

    w = Window.partitionBy("point_id").orderBy(
        F.asc("d2_udeg2"), F.asc("seg_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("point_id", "seg_id", "d2_udeg2", "t_ppm")
    )
