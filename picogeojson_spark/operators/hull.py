"""Per-group convex hull (Andrew's monotone chain), Arrow-batched.

The footprint primitive trajectory/coverage analytics need: the convex
hull of each document's point set (mention cloud, GPS trace, cluster
members) as a closed CCW GeoJSON-style ring, ready to feed straight into
``measures.polygon_measures`` (hull -> area/centroid/edge stats is the
canonical composition, exercised by the ``geo_hull`` contract query).

Spark shape: hulls are inherently per-group sequential, so this is one
``applyInPandas`` stage over ``groupBy(id)`` — the documented Python
seam, Arrow-batched, no other shuffle. Per-group point counts are
caller-bounded (mentions per doc, members per cluster), which is what
makes per-group O(n log n) fine at 100 TB: the heavy dimension (number
of groups) is embarrassingly parallel.

Determinism contract: input coordinates on the repo's dyadic lattice are
exact in float64, the orientation test is an exact cross-product sign,
and the ring is canonicalized — CCW, starting at the lexicographically
smallest (x, y), first vertex repeated last. Collinear boundary points
are dropped (strict hull); degenerate inputs yield a 1-point ring
``[p, p]`` or a 2-point ring ``[a, b, a]``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _hull_of(xs, ys):
    pts = sorted(set(zip(xs, ys)))
    if len(pts) <= 2:
        return pts
    def chain(seq):
        out = []
        for p in seq:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                if (ax - ox) * (p[1] - oy) - (p[0] - ox) * (ay - oy) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out
    lower = chain(pts)
    upper = chain(reversed(pts))
    return lower[:-1] + upper[:-1]


def convex_hull_rings(points: DataFrame, id_col: str = "doc_id",
                      x_col: str = "x", y_col: str = "y") -> DataFrame:
    """One row per group: ``(id_col, ring: array<array<double>>)`` — the
    closed CCW hull ring in the canonical orientation above."""

    def _grp(pdf):
        import pandas as pd

        hull = _hull_of(pdf[x_col].tolist(), pdf[y_col].tolist())
        ring = [[float(x), float(y)] for x, y in hull]
        ring.append(ring[0])
        return pd.DataFrame({
            id_col: [pdf[id_col].iloc[0]],
            "ring": [ring],
        })

    schema = "{} long, ring array<array<double>>".format(id_col)
    return points.groupBy(id_col).applyInPandas(_grp, schema=schema)
