"""Polygon-polygon intersection test (kernel for the intersection join).

Two polygons (with optional holes) intersect iff any vertex of one lies
inside the other (winding-number PIP — the same edge rules as the PIP join,
reference antimeridian.py:72-88) OR any pair of edges properly crosses
(orientation tests). Holes are handled by the PIP side for free: a polygon
sitting wholly inside another's hole has no vertices *inside* it and no
edge crossings, so the pair correctly does not intersect.

Degenerate contacts (shared edges / touching at a vertex, i.e. collinear
orientation zeros) are deliberately not classified — the operator's
contract is strict interior overlap vs strict disjoint; test/query data
keeps geometry off those measure-zero configurations (quarter-degree
lattice with non-aligned extents). The cell-cover candidate stage never
filters a truly intersecting pair (covers are supersets), so the refine
decides membership exactly — same exactness split as pip_join.

Inspiration for the candidate stage: raster/grid approximation for polygon
intersection joins (Raster Intervals, SIGMOD 2023) — realized here as the
same materialized-cell equi-join Catalyst already optimizes.
"""

from __future__ import annotations

import numpy as np

from .pip import points_in_geometry


def _ring_edges(ring):
    a = np.asarray([(p[0], p[1]) for p in ring], dtype=np.float64)
    return a[:-1], a[1:]


def _edges_of(geom):
    """All boundary edges (exterior + holes, every part) as (P1, P2)."""
    if geom["type"] == "Polygon":
        polys = [geom["coordinates"]]
    elif geom["type"] == "MultiPolygon":
        polys = geom["coordinates"]
    else:
        raise TypeError("polygon intersection requires (Multi)Polygon")
    p1s, p2s = [], []
    for rings in polys:
        for ring in rings:
            if len(ring) < 2:
                continue
            e1, e2 = _ring_edges(ring)
            p1s.append(e1)
            p2s.append(e2)
    if not p1s:
        # degenerate geometry (no ring with >=2 points): no edges, so the
        # intersection test degrades to vertex containment instead of
        # raising from np.concatenate([])
        empty = np.empty((0, 2), dtype=np.float64)
        return empty, empty
    return np.concatenate(p1s), np.concatenate(p2s)


def _vertices_of(geom):
    if geom["type"] == "Polygon":
        polys = [geom["coordinates"]]
    else:
        polys = geom["coordinates"]
    vs = []
    for rings in polys:
        for ring in rings:
            vs.extend((p[0], p[1]) for p in ring[:-1] or ring)
    return np.asarray(vs, dtype=np.float64)


def _any_proper_cross(a1, a2, b1, b2):
    """Vectorized proper-crossing test over all edge pairs (n x m)."""

    def cross(o, p, q):
        return ((p[..., 0] - o[..., 0]) * (q[..., 1] - o[..., 1])
                - (q[..., 0] - o[..., 0]) * (p[..., 1] - o[..., 1]))

    A1 = a1[:, None, :]
    A2 = a2[:, None, :]
    B1 = b1[None, :, :]
    B2 = b2[None, :, :]
    d1 = cross(B1, B2, A1)
    d2 = cross(B1, B2, A2)
    d3 = cross(A1, A2, B1)
    d4 = cross(A1, A2, B2)
    return bool(np.any((d1 * d2 < 0) & (d3 * d4 < 0)))


def polygons_intersect(geom_a, geom_b) -> bool:
    """Strict interior-overlap test for two (Multi)Polygon dicts."""
    va = _vertices_of(geom_a)
    if len(va) and points_in_geometry(va[:, 0], va[:, 1], geom_b).any():
        return True
    vb = _vertices_of(geom_b)
    if len(vb) and points_in_geometry(vb[:, 0], vb[:, 1], geom_a).any():
        return True
    a1, a2 = _edges_of(geom_a)
    b1, b2 = _edges_of(geom_b)
    return _any_proper_cross(a1, a2, b1, b2)
