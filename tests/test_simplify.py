"""Visvalingam simplification: differential vs an independent brute-force
implementation (global re-scan each removal), plus geometric invariants."""

import random

from pyspark.sql import functions as F


def _area2(pts, i, j, k):
    ax, ay = pts[i]
    bx, by = pts[j]
    cx, cy = pts[k]
    return abs((bx - ax) * (cy - ay) - (cx - ax) * (by - ay))


def _brute_simplify(ring, min_area2):
    """Independent oracle: recompute every alive vertex's triangle area
    from scratch each round, remove the global minimum (< threshold, ties
    to lowest index, never the anchor 0), stop at a triangle."""
    n = len(ring) - 1
    pts = [tuple(map(float, p)) for p in ring[:n]]
    alive = list(range(n))
    while len(alive) > 3:
        best = None
        for idx in range(1, len(alive)):
            p = alive[idx - 1]
            v = alive[idx]
            q = alive[(idx + 1) % len(alive)]
            a = _area2(pts, p, v, q)
            if best is None or a < best[0]:
                best = (a, idx)
        if best is None or best[0] >= min_area2:
            break
        alive.pop(best[1])
    out = [[pts[i][0], pts[i][1]] for i in alive]
    out.append([pts[alive[0]][0], pts[alive[0]][1]])
    return out


def _rand_ring(rng, n):
    """Simple (star-shaped) lattice ring: radial spokes in angular order."""
    import math

    pts = []
    for i in range(n):
        ang = 2 * math.pi * i / n
        r = rng.randrange(4, 40) / 4.0
        x = round(r * math.cos(ang) * 4) / 4.0
        y = round(r * math.sin(ang) * 4) / 4.0
        pts.append([x, y])
    # dedup consecutive equals (degenerate spokes)
    ded = [p for i, p in enumerate(pts) if p != pts[i - 1]]
    if len(ded) < 3:
        ded = [[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]]
    return ded + [ded[0]]


def test_simplify_matches_brute():
    from picogeojson_spark.operators.simplify import simplify_ring

    rng = random.Random(11)
    for trial in range(60):
        ring = _rand_ring(rng, rng.randrange(4, 24))
        thr = rng.randrange(0, 64) / 4.0
        assert simplify_ring(ring, thr) == _brute_simplify(ring, thr), \
            (trial, ring, thr)


def test_simplify_invariants():
    from picogeojson_spark.operators.simplify import simplify_ring

    ring = [[0.0, 0.0], [2.0, 0.25], [4.0, 0.0], [4.0, 4.0],
            [2.0, 3.75], [0.0, 4.0], [0.0, 0.0]]
    out = simplify_ring(ring, 3.0)
    # closed, anchor preserved, collapsed to the square corners
    assert out[0] == out[-1] == [0.0, 0.0]
    assert [p for p in out[:-1]] == [[0.0, 0.0], [4.0, 0.0],
                                     [4.0, 4.0], [0.0, 4.0]]
    # idempotent at the same threshold
    assert simplify_ring(out, 3.0) == out
    # never below a triangle even at an absurd threshold
    tri = simplify_ring(ring, 1e9)
    assert len(tri) == 4 and tri[0] == tri[-1]
    # zero threshold = identity
    assert simplify_ring(ring, 0.0) == ring


def test_simplify_rings_dataframe(spark):
    from picogeojson_spark.operators.simplify import (simplify_ring,
                                                      simplify_rings)

    rng = random.Random(3)
    rings = [_rand_ring(rng, rng.randrange(5, 20)) for _ in range(25)]
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rings)],
        "poly_id long, ring array<array<double>>")
    out = simplify_rings(df, 2.0).orderBy("poly_id").collect()
    assert len(out) == 25
    for r in out:
        want = simplify_ring(rings[r["poly_id"]], 2.0)
        got = [list(p) for p in r["ring"]]
        assert got == want
        assert r["n_in"] == len(rings[r["poly_id"]]) - 1
        assert r["n_out"] == len(want) - 1
    plan = simplify_rings(df, 2.0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
