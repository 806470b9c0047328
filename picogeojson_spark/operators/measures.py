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
