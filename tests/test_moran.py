"""local_moran / moran_summary: hand-computed I, identities, isolation."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _loc(spark, pts, **kw):
    from picogeojson_spark.operators.spatial_cluster import local_moran

    df = spark.createDataFrame(pts, "lon double, lat double")
    return local_moran(df, **kw).collect()


def test_two_cell_perfect_negative_autocorrelation(spark):
    # cells (0,0) cnt=3 and (0,1) cnt=1: N=2, S=4, dev = (2, -2),
    # each the other's only neighbor -> lag = (-2, 2), local = (-4, -4),
    # I = (N/W) * num/den = (2/2) * (-8/8) = -1 exactly.
    pts = [(0.25, 0.25)] * 3 + [(0.25, 2.25)]
    from picogeojson_spark.operators.spatial_cluster import moran_summary

    df = spark.createDataFrame(pts, "lon double, lat double")
    row = moran_summary(df).first()
    assert (row.n_cells, row.total_pts, row.w_pairs) == (2, 4, 2)
    assert row.num == -8 and row.den == 8
    loc = _loc(spark, pts)
    assert sorted((r.dev_n, r.lag, r.local) for r in loc) == [
        (-2, 2, -4), (2, -2, -4)]


def test_dev_sums_to_zero_and_w_even(spark):
    pts = [(((i * 37) % 720) / 2.0 - 180 + 0.25,
            ((i * 61) % 360) / 2.0 - 90 + 0.25) for i in range(300)]
    loc = _loc(spark, pts)
    assert sum(r.dev_n for r in loc) == 0
    assert sum(r.n_nbrs for r in loc) % 2 == 0  # symmetric pairs
    # conservation
    assert sum(r.cnt for r in loc) == 300


def test_isolated_cell_has_zero_lag(spark):
    # one dense blob + one far singleton (no occupied neighbors)
    pts = [(0.25, 0.25)] * 5 + [(100.25, 50.25)]
    loc = {(r.cx, r.cy): r for r in _loc(spark, pts)}
    iso = loc[(50, 25)]
    assert iso.n_nbrs == 0 and iso.lag == 0 and iso.local == 0


def test_hot_pair_positive_local(spark):
    # two adjacent hot cells among scattered cold singletons: the hot
    # cells sit in each other's lag -> strongly positive local there
    pts = [(0.25, 0.25)] * 10 + [(2.25, 0.25)] * 10
    pts += [(50.25 + 4 * i, -50.25) for i in range(6)]
    loc = {(r.cx, r.cy): r for r in _loc(spark, pts)}
    assert loc[(0, 0)].local > 0 and loc[(1, 0)].local > 0
