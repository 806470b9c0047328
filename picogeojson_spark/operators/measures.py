"""Polygon measures: signed area, centroid numerators, edge statistics.

Spark-first design: the shoelace scan is ONE pass over the ring array as a
JVM higher-order-function chain — ``zip_with`` pairs each vertex with its
successor, a single ``aggregate`` folds all four sums (cross product, the
two centroid numerators, squared edge length) through one struct
accumulator. No Python UDF, no explode, no shuffle: per-row work only, so
the operator composes with any downstream aggregation at scan parallelism
and survives a 100x scale-up trivially (measure cost is O(vertices) per
row, embarrassingly parallel).

HOF-safety (build-notes rule): every lambda touches only its own lambda
variables (``p``, ``q``, ``acc``, ``t``) — never the outer ring column —
so Catalyst's CollapseProject inlining cannot turn the fold into an
O(n^2)-per-row re-evaluation. The two ``slice`` calls are plain arguments,
evaluated once per row.

Semantics: GeoJSON rings are closed (first == last, enforced by the
kernel's ``make_polygon``, see geo/algebra.py), so consecutive pairs cover
every edge without a wrap term. ``area2`` is the SIGNED sum of cross
products (= 2x signed area; positive for counter-clockwise rings, the
RFC-7946 exterior orientation the reference's ``is_counterclockwise``
checks — reference anchor: picogeojson/orientation.py). Centroid follows
the standard polygon-centroid formula ``C = num / (3 * area2)``; the raw
numerators are returned so callers on exact (dyadic-rational) inputs stay
in exact arithmetic. For polygons with holes, measures are additive:
subtract each hole ring's measures from the exterior's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FOLD = """
aggregate(
  zip_with(slice({r}, 1, size({r}) - 1), slice({r}, 2, size({r}) - 1),
           (p, q) -> named_struct(
              'cr', p[0] * q[1] - q[0] * p[1],
              'sx', p[0] + q[0],
              'sy', p[1] + q[1],
              'e2', (q[0] - p[0]) * (q[0] - p[0])
                    + (q[1] - p[1]) * (q[1] - p[1]))),
  named_struct('a2', 0.0d, 'cx', 0.0d, 'cy', 0.0d, 'e2', 0.0d),
  (acc, t) -> named_struct(
      'a2', acc.a2 + t.cr,
      'cx', acc.cx + t.sx * t.cr,
      'cy', acc.cy + t.sy * t.cr,
      'e2', acc.e2 + t.e2))
"""


def polygon_measures(
    polys: DataFrame,
    ring_col: str = "ring",
    id_col: str = "poly_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """Per-polygon shoelace measures from a closed exterior ring.

    Input: ``id_col`` plus ``ring_col: array<array<double>>`` holding a
    closed GeoJSON ring (first position repeated last, >= 4 positions).

    Returns one row per polygon:

    - ``n_vertices``  distinct vertices (ring length - 1)
    - ``area2``       signed shoelace sum = 2 x signed area (CCW > 0)
    - ``cx_num``/``cy_num``  centroid numerators: centroid =
      ``(cx_num, cy_num) / (3 * area2)``
    - ``edge2_sum``   sum of squared edge lengths (planar)

    All sums are left folds in ring order; on dyadic-rational coordinates
    (the contract query's quarter-degree lattice) every intermediate is
    exactly representable, so results are bit-stable across engines and
    summation orders.
    """
    fold = F.expr(_FOLD.format(r=ring_col))
    return polys.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        (F.size(F.col(ring_col)) - 1).cast("int").alias("n_vertices"),
        fold["a2"].alias("area2"),
        fold["cx"].alias("cx_num"),
        fold["cy"].alias("cy_num"),
        fold["e2"].alias("edge2_sum"),
    )


def rect_union_area(rects: DataFrame, group_col: str = "grp") -> DataFrame:
    """EXACT union area of axis-aligned integer rectangles per group —
    coverage measures for crawl regions, tile budgets, viewport dedup:
    ``(grp, n_rects, area)`` where ``area`` is the exact area of the
    union (overlaps counted once), in squared coordinate units.

    Rectangles are HALF-OPEN ``[x1,x2) × [y1,y2)`` (the tiling
    convention — adjacent boxes neither gap nor double-count);
    degenerate boxes (``x2<=x1`` or ``y2<=y1``) are dropped.

    Algorithm: distributed coordinate compression — the classic
    sweep-line, re-expressed relationally.  Per group: (1) the distinct
    x-edges rank into SLABS (consecutive-edge strips); (2) each
    rectangle explodes into the slab indices it spans (an equi-join on
    the exact edge value recovers each rect's edge ranks — x-edges come
    from the rects themselves, so no inequality join exists anywhere);
    (3) within (grp, slab) the y-intervals merge by the gaps-and-
    islands window (an island starts where y1 exceeds the running max
    of every earlier y2); (4) ``area = sum over islands of
    (max_y2 - min_y1) * slab_width``.  Bit-exact: every quantity is an
    integer and the window order (y1, y2, rid) is total.

    Scale shape: everything runs on the rectangle table, never a
    corpus: two ranking windows + one slab-index explode + the island
    window, all sharing hashpartitioning(grp)-style exchanges; the
    only join keys are (grp, exact edge value) — equi-joins.  The
    slab explode is O(rects x overlap-depth) per group: the worst case
    (every rect spanning every slab) is quadratic, so groups are
    expected DIM-TABLE sized (the geofence broadcast contract) — at
    larger scale, pre-shard groups by a coarse x-grid first (each
    shard's union is disjoint, areas add).  Products in decimal(38,0)
    (a full-globe micro-degree box is ~6.5e18 — int64-adjacent).
    """
    from pyspark.sql import Window

    r = rects.select(
        F.col(group_col).alias("grp"),
        F.col("rid").cast("long").alias("rid"),
        F.col("x1").cast("long").alias("x1"),
        F.col("x2").cast("long").alias("x2"),
        F.col("y1").cast("long").alias("y1"),
        F.col("y2").cast("long").alias("y2"),
    ).filter((F.col("x2") > F.col("x1")) & (F.col("y2") > F.col("y1")))

    edges = (
        r.select("grp", F.col("x1").alias("x"))
        .union(r.select("grp", F.col("x2").alias("x")))
        .distinct()
    )
    w_e = Window.partitionBy("grp").orderBy("x")
    slabs = edges.select(
        "grp", "x",
        F.row_number().over(w_e).cast("long").alias("rx"),
        (F.lead("x").over(w_e) - F.col("x")).cast("long").alias("width"),
    )
    e1 = slabs.select("grp", F.col("x").alias("x1"),
                      F.col("rx").alias("r1"))
    e2 = slabs.select("grp", F.col("x").alias("x2"),
                      F.col("rx").alias("r2"))
    spans = (
        r.join(e1, on=["grp", "x1"]).join(e2, on=["grp", "x2"])
        .select("grp", "rid", "y1", "y2",
                F.explode(F.sequence(F.col("r1"), F.col("r2") - 1))
                .alias("rx"))
    )
    w_i = (Window.partitionBy("grp", "rx").orderBy("y1", "y2", "rid")
           .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy("grp", "rx").orderBy("y1", "y2", "rid")
             .rowsBetween(Window.unboundedPreceding, 0))
    prevmax = F.max("y2").over(w_i)
    isl = spans.select(
        "grp", "rx", "y1", "y2", "rid",
        F.when(prevmax.isNull() | (F.col("y1") > prevmax), 1)
        .otherwise(0).alias("_new"),
    ).select(
        "grp", "rx", "y1", "y2",
        F.sum("_new").over(w_run).cast("long").alias("island"),
    )
    cov = isl.groupBy("grp", "rx", "island").agg(
        (F.max("y2") - F.min("y1")).cast("long").alias("cov_len"))
    slab_cov = cov.groupBy("grp", "rx").agg(
        F.sum("cov_len").cast("long").alias("cov"))
    contrib = slab_cov.join(slabs.select("grp", "rx", "width"),
                            on=["grp", "rx"])
    area = contrib.groupBy("grp").agg(
        F.sum(F.expr("cast(cov as decimal(38,0)) * width"))
        .cast("long").alias("area"))
    nr = r.groupBy("grp").agg(F.count("*").cast("long").alias("n_rects"))
    return nr.join(area, on="grp", how="left").select(
        "grp", "n_rects",
        F.coalesce("area", F.lit(0)).cast("long").alias("area"))
