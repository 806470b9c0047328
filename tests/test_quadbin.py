"""adaptive_quadbin: leaf rule, skew splitting, cover invariants."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, pts, **kw):
    from picogeojson_spark.operators.spatial_cluster import adaptive_quadbin

    df = spark.createDataFrame(pts, "lon double, lat double")
    return adaptive_quadbin(df, **kw).collect()


def test_sparse_world_stays_coarse(spark):
    pts = [(10.25, 10.25), (-120.25, -50.25), (60.25, 70.25)]
    out = _run(spark, pts, cap=5, max_level=6)
    assert all(r.level == 0 for r in out)
    assert sum(r.n_points for r in out) == 3


def test_hotspot_splits_to_max_level(spark):
    # 40 identical points, cap 5 -> never satisfiable -> max_level leaf
    pts = [(10.25, 10.25)] * 40 + [(-120.25, -50.25)]
    out = _run(spark, pts, cap=5, max_level=4)
    hot = [r for r in out if r.n_points == 40]
    cold = [r for r in out if r.n_points == 1]
    assert len(hot) == 1 and hot[0].level == 4
    assert len(cold) == 1 and cold[0].level == 0


def test_leaf_rule_cap_respected_below_max(spark):
    # a dyadic-lattice blob + scatter at several densities
    pts = [(10.0 + (i % 8) * 0.25, 10.0 + (i // 8 % 8) * 0.25)
           for i in range(200)]
    pts += [(-60.25 + (i % 3) * 0.5, -20.25) for i in range(9)]
    out = _run(spark, pts, cap=25, max_level=6)
    assert sum(r.n_points for r in out) == len(pts)
    for r in out:
        if r.level < 6:
            assert r.n_points <= 25, r


def test_leaves_do_not_overlap(spark):
    pts = [(10.0 + (i % 16) * 0.25, 10.0 + (i // 16 % 16) * 0.25)
           for i in range(300)]
    out = _run(spark, pts, cap=20, max_level=5)
    # project every leaf to its max-level descendant range; ranges must
    # be disjoint (a consistent non-overlapping cover)
    boxes = []
    for r in out:
        s = 1 << (5 - r.level)
        boxes.append((r.x * s, (r.x + 1) * s, r.y * s, (r.y + 1) * s))
    for i in range(len(boxes)):
        for j in range(i + 1, len(boxes)):
            a, b = boxes[i], boxes[j]
            overlap = (a[0] < b[1] and b[0] < a[1]
                       and a[2] < b[3] and b[2] < a[3])
            assert not overlap, (a, b)
