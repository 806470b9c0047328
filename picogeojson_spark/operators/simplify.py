"""Visvalingam–Whyatt ring simplification — simplify-for-zoom before tiling.

A vector-tile pipeline serves each zoom level a geometry whose detail
matches the pixel budget: vertices whose removal changes the shape by less
than ~a pixel's area are dropped (Visvalingam & Whyatt 1993 — the
algorithm behind topojson/mapshaper simplification).

Spark shape: simplification is per-row work with no cross-row state, so it
rides ``mapInPandas`` (Arrow batches, one Python stage, no shuffle) and
composes with ``tile_pyramid``/``assign_tiles`` at scan parallelism. The
per-ring loop is the textbook O(n log n) heap variant with lazy
re-insertion; rings are numpy arrays end to end.

Determinism: pure function of the input ring + threshold — areas compare
exactly (dyadic-rational lattice inputs stay exact in float64), ties
resolve to the LOWEST vertex index (strict ``<`` in the heap winner
check), so output is independent of partitioning and batch size.
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tri_area2(pts, i, j, k):
    """Twice the triangle area spanned by vertices i, j, k (absolute)."""
    ax, ay = pts[i]
    bx, by = pts[j]
    cx, cy = pts[k]
    return abs((bx - ax) * (cy - ay) - (cx - ax) * (by - ay))


def simplify_ring(ring, min_area2: float):
    """Simplify one CLOSED ring (list of [x, y], first == last): drop the
    vertex with the smallest effective triangle area while that area is
    < ``min_area2`` (in 2x-area units, matching the shoelace convention of
    ``polygon_measures``), never dropping below a triangle (4 ring
    positions). Returns a new closed ring (python lists).

    The anchor vertex (index 0 == index -1) is never removed — the stable
    choice that keeps output deterministic and rings aligned across zooms.
    """
    n = len(ring) - 1  # distinct vertices
    if n < 3:
        return [list(p) for p in ring]
    pts = [tuple(map(float, p)) for p in ring[:n]]
    prv = [(i - 1) % n for i in range(n)]
    nxt = [(i + 1) % n for i in range(n)]
    alive = [True] * n
    n_alive = n

    def area(i):
        return _tri_area2(pts, prv[i], i, nxt[i])

    heap = [(area(i), i) for i in range(1, n)]  # anchor 0 never enters
    heapq.heapify(heap)
    while heap and n_alive > 3:
        a, i = heapq.heappop(heap)
        if not alive[i]:
            continue
        cur = area(i)
        if cur != a:           # stale entry: re-insert with current area
            heapq.heappush(heap, (cur, i))
            continue
        if cur >= min_area2:
            break
        alive[i] = False
        n_alive -= 1
        p, q = prv[i], nxt[i]
        nxt[p], prv[q] = q, p
        for j in (p, q):
            if j != 0 and alive[j]:
                heapq.heappush(heap, (area(j), j))
    out = []
    i = 0
    while True:
        out.append([pts[i][0], pts[i][1]])
        i = nxt[i]
        if i == 0:
            break
    out.append([pts[0][0], pts[0][1]])
    return out


def simplify_rings(
    polys: DataFrame,
    min_area2: float,
    ring_col: str = "ring",
    id_col: str = "poly_id",
) -> DataFrame:
    """DataFrame wrapper: ``(id, ring)`` -> ``(id, ring, n_in, n_out)``
    with each closed ring Visvalingam-simplified at ``min_area2``.

    One ``mapInPandas`` stage (Arrow-batched; no per-row Python UDF
    dispatch), no shuffle — the operator inherits scan parallelism and an
    executor count scales it linearly.
    """
    import pandas as pd

    if min_area2 < 0:
        raise ValueError("min_area2 must be >= 0")

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rings = [simplify_ring(r, min_area2) for r in pdf[ring_col]]
            yield pd.DataFrame(
                {
                    "poly_id": pdf[id_col],
                    "ring": rings,
                    "n_in": [len(r) - 1 for r in pdf[ring_col]],
                    "n_out": [len(r) - 1 for r in rings],
                }
            )

    return polys.select(F.col(id_col), F.col(ring_col)).mapInPandas(
        run,
        schema=("poly_id long, ring array<array<double>>,"
                " n_in int, n_out int"),
    )
