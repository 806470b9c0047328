"""convex_hull_rings: canonical ring contract + brute differential."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, rows):
    from picogeojson_spark.operators.hull import convex_hull_rings

    df = spark.createDataFrame(rows, "doc_id long, x double, y double")
    out = convex_hull_rings(df).collect()
    return {r.doc_id: [tuple(p) for p in r.ring] for r in out}


def test_square_with_interior_and_duplicates(spark):
    rows = [(1, 0.0, 0.0), (1, 2.0, 0.0), (1, 2.0, 2.0), (1, 0.0, 2.0),
            (1, 1.0, 1.0), (1, 0.5, 0.25), (1, 2.0, 0.0)]
    got = _run(spark, rows)[1]
    # CCW from lexicographic min, closed
    assert got == [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0),
                   (0.0, 0.0)]


def test_collinear_boundary_points_dropped(spark):
    rows = [(1, 0.0, 0.0), (1, 1.0, 0.0), (1, 2.0, 0.0),
            (1, 2.0, 2.0), (1, 0.0, 2.0), (1, 0.0, 1.0)]
    got = _run(spark, rows)[1]
    assert got == [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0),
                   (0.0, 0.0)]


def test_degenerate_inputs(spark):
    rows = [(1, 3.0, 4.0),
            (2, 0.0, 0.0), (2, 1.0, 0.5), (2, 2.0, 1.0), (2, 3.0, 1.5)]
    got = _run(spark, rows)
    assert got[1] == [(3.0, 4.0), (3.0, 4.0)]
    assert got[2] == [(0.0, 0.0), (3.0, 1.5), (0.0, 0.0)]


def _py_in_hull(hull, p):
    # point strictly inside or on boundary of CCW hull
    n = len(hull)
    for i in range(n):
        a, b = hull[i], hull[(i + 1) % n]
        if (b[0] - a[0]) * (p[1] - a[1]) - (p[0] - a[0]) * (b[1] - a[1]) < 0:
            return False
    return True


def test_brute_differential(spark):
    # deterministic scatter; hull must contain every input point and every
    # hull vertex must be an input point
    rows = [(1, ((i * 13) % 17) * 0.25, ((i * 7) % 19) * 0.25)
            for i in range(60)]
    got = _run(spark, rows)[1]
    hull = got[:-1]
    pts = {(x, y) for _, x, y in rows}
    assert set(hull) <= pts
    for p in pts:
        assert _py_in_hull(hull, p), p
    # strict convexity: no three consecutive hull vertices collinear
    n = len(hull)
    for i in range(n):
        o, a, b = hull[i], hull[(i + 1) % n], hull[(i + 2) % n]
        cr = (a[0] - o[0]) * (b[1] - o[1]) - (b[0] - o[0]) * (a[1] - o[1])
        assert cr > 0
