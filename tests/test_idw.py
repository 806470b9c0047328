"""idw_interpolate: hand-computed blends on a tiny station grid."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, queries, stations, **kw):
    from picogeojson_spark.operators.knn import idw_interpolate

    q = spark.createDataFrame(queries, "query_id long, lon double, lat double")
    c = spark.createDataFrame(
        stations, "neighbor_id long, lon double, lat double, value long")
    out = idw_interpolate(q, c, **kw).collect()
    return {r.query_id: r for r in out}


def test_station_at_query_point_dominates(spark):
    # station 1 sits exactly on the query -> weight 1e9; others tiny
    stations = [(1, 10.25, 10.25, 100), (2, 30.25, 10.25, 900),
                (3, 10.25, 40.25, 900), (4, 60.25, 60.25, 900)]
    got = _run(spark, [(7, 10.25, 10.25)], stations, k=4, level=4, radius=2)
    r = got[7]
    assert r.n_used == 4
    # blend sits within a fraction of a unit of the colocated station
    assert abs(r.idw_value - 100) <= 1


def test_exact_hand_blend(spark):
    # two stations, equal distance (symmetric) -> integer midpoint
    stations = [(1, 9.25, 10.25, 100), (2, 11.25, 10.25, 300)]
    got = _run(spark, [(7, 10.25, 10.25)], stations, k=2, level=4, radius=2)
    r = got[7]
    # d2 = 1.0 for both -> d2i = 16, w = 1e9 // 17 each -> mean = 200
    assert r.idw_value == 200
    assert r.w_sum == 2 * (10**9 // 17)
    assert r.n_used == 2


def test_closer_station_pulls_estimate(spark):
    stations = [(1, 10.75, 10.25, 0), (2, 20.25, 10.25, 1000)]
    got = _run(spark, [(7, 10.25, 10.25)], stations, k=2, level=4, radius=2)
    # station 1 at d2=0.25 (w=1e9//5), station 2 at d2=100 (w=1e9//1601)
    w1, w2 = 10**9 // 5, 10**9 // 1601
    want = (0 * w1 + 1000 * w2) // (w1 + w2)
    assert got[7].idw_value == want
