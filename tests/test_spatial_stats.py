"""gi_star: exact-integer Getis-Ord hotspot semantics."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


# ---------------------------------------------------------------------------
# gi_star
# ---------------------------------------------------------------------------

def _gi(spark, pts, cell_udeg=1_000_000):
    from picogeojson_spark.operators.spatial_cluster import gi_star

    df = spark.createDataFrame(pts, "lon double, lat double")
    out = gi_star(df, cell_udeg=cell_udeg).collect()
    return {(r.cx, r.cy): r for r in out}


def test_gistar_hand_computed_hotspot(spark):
    # 3 occupied cells in a row: counts 1, 10, 1 -> N=3, S=12.
    pts = ([(0.5, 0.5)] + [(1.5, 0.5)] * 10 + [(2.5, 0.5)])
    got = _gi(spark, pts)
    mid = got[(1, 0)]
    # middle cell's 3x3 block holds all 3 cells: w=3, block=12
    assert (mid.cnt, mid.w, mid.block) == (10, 3, 12)
    assert mid.gi_num_n == 3 * 12 - 3 * 12 == 0 and mid.hot == 0
    edge = got[(0, 0)]
    # edge block: cells (0,0)+(1,0): w=2, block=11 -> 3*11 - 2*12 = 9 hot
    assert (edge.cnt, edge.w, edge.block) == (1, 2, 11)
    assert edge.gi_num_n == 9 and edge.hot == 1


def test_gistar_cold_spot_negative(spark):
    # isolated sparse cell far from a dense clump.
    pts = [(10.5, 10.5)] + [(0.5, 0.5)] * 20
    got = _gi(spark, pts)
    lone = got[(10, 10)]
    # lone block: w=1 block=1 -> N*1 - 1*S = 2 - 21 < 0
    assert lone.gi_num_n == 2 * 1 - 1 * 21 and lone.hot == -1


def test_gistar_self_included(spark):
    pts = [(0.5, 0.5)] * 4
    got = _gi(spark, pts)
    only = got[(0, 0)]
    assert (only.w, only.block) == (1, 4)
    assert only.gi_num_n == 1 * 4 - 1 * 4 == 0
