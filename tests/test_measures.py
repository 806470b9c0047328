"""polygon_measures: differential vs a pure-Python shoelace, plus the
geometric invariants (winding sign, hole additivity, known closed forms)."""

import random

import pytest
from pyspark.sql import functions as F


def _py_measures(pts):
    ring = pts + [pts[0]]
    a2 = cx = cy = e2 = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        cr = x1 * y2 - x2 * y1
        a2 += cr
        cx += (x1 + x2) * cr
        cy += (y1 + y2) * cr
        e2 += (x2 - x1) ** 2 + (y2 - y1) ** 2
    return a2, cx, cy, e2


def _random_convex(rng, n):
    """Convex lattice polygon: sort random angle-ish offsets around a hull."""
    import math

    pts = set()
    while len(pts) < n:
        pts.add((rng.randrange(-40, 40) / 4.0, rng.randrange(-40, 40) / 4.0))
    pts = sorted(pts)
    # gift-wrap a convex hull (small n, fine)
    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower, upper = [], []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    return hull if len(hull) >= 3 else [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)]


def _run(spark, polys):
    from picogeojson_spark.operators.measures import polygon_measures

    rows = [(i, [list(p) for p in pts + [pts[0]]]) for i, pts in enumerate(polys)]
    df = spark.createDataFrame(rows, "poly_id long, ring array<array<double>>")
    out = polygon_measures(df).orderBy("poly_id").collect()
    return {r["poly_id"]: r for r in out}


def test_measures_match_python_brute(spark):
    rng = random.Random(7)
    polys = [_random_convex(rng, rng.randrange(3, 12)) for _ in range(40)]
    # a concave L and a clockwise square
    polys.append([(0.0, 0.0), (6.0, 0.0), (6.0, 4.0), (4.0, 4.0),
                  (4.0, 2.0), (0.0, 2.0)])
    polys.append([(0.0, 0.0), (0.0, 3.0), (5.0, 3.0), (5.0, 0.0)])
    got = _run(spark, polys)
    for i, pts in enumerate(polys):
        a2, cx, cy, e2 = _py_measures(pts)
        r = got[i]
        assert r["n_vertices"] == len(pts)
        assert r["area2"] == pytest.approx(a2, abs=1e-9)
        assert r["cx_num"] == pytest.approx(cx, abs=1e-9)
        assert r["cy_num"] == pytest.approx(cy, abs=1e-9)
        assert r["edge2_sum"] == pytest.approx(e2, abs=1e-9)


def test_winding_sign_and_centroid(spark):
    ccw = [(0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (0.0, 2.0)]
    cw = list(reversed(ccw))
    got = _run(spark, [ccw, cw])
    assert got[0]["area2"] == 16.0 and got[1]["area2"] == -16.0
    # centroid = num / (3 * area2) = rectangle center either way
    for r in got.values():
        assert r["cx_num"] / (3 * r["area2"]) == pytest.approx(2.0)
        assert r["cy_num"] / (3 * r["area2"]) == pytest.approx(1.0)


def test_hole_additivity(spark):
    """Exterior minus hole == donut measures: measures are additive, so a
    holed polygon is exterior_ring - hole_ring (both CCW)."""
    ext = [(0.0, 0.0), (8.0, 0.0), (8.0, 8.0), (0.0, 8.0)]
    hole = [(2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0)]
    got = _run(spark, [ext, hole])
    area2 = got[0]["area2"] - got[1]["area2"]
    cx = got[0]["cx_num"] - got[1]["cx_num"]
    cy = got[0]["cy_num"] - got[1]["cy_num"]
    assert area2 == 2 * (64.0 - 16.0)
    # symmetric donut: centroid stays at (4, 4)
    assert cx / (3 * area2) == pytest.approx(4.0)
    assert cy / (3 * area2) == pytest.approx(4.0)


def test_no_shuffle_plan(spark):
    from picogeojson_spark.operators.measures import polygon_measures

    df = spark.createDataFrame(
        [(0, [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 0.0]])],
        "poly_id long, ring array<array<double>>")
    plan = polygon_measures(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
