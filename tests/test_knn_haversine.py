"""Great-circle kNN: differential vs a pure-Python brute force.

Points are lattice-derived (k*0.5 + 0.25 style) including polar and
dateline-straddling queries — the cases where the per-query guard must
route through the exact brute tail rather than wrongly settle.
"""

import math

import pytest


def _hav_udeg_py(qlon, qlat, clon, clat):
    s_lat = math.sin(math.radians(clat - qlat) / 2)
    s_lon = math.sin(math.radians(clon - qlon) / 2)
    h = (s_lat * s_lat
         + math.cos(math.radians(qlat)) * math.cos(math.radians(clat))
         * s_lon * s_lon)
    deg = math.degrees(2 * math.asin(min(1.0, math.sqrt(h))))
    return math.floor(deg * 1000000.0 + 0.5)


def _brute_knn(queries, candidates, k):
    out = []
    for qid, qlon, qlat in queries:
        ds = sorted(
            (_hav_udeg_py(qlon, qlat, clon, clat), nid)
            for nid, clon, clat in candidates
        )
        for rank, (d, nid) in enumerate(ds[:k], 1):
            out.append((qid, rank, nid, d))
    return sorted(out)


def _lattice_points(n, a, b, id0=0):
    pts = []
    for i in range(n):
        lon = ((id0 + i) * a % 720) / 2.0 - 180 + 0.25
        lat = ((id0 + i) * b % 360) / 2.0 - 90 + 0.25
        pts.append((id0 + i, lon, lat))
    return pts


@pytest.mark.parametrize("level,radius,k", [(4, 2, 3), (3, 1, 5)])
def test_haversine_knn_matches_brute(spark, level, radius, k):
    from picogeojson_spark.operators.knn import knn_join_haversine

    qs = _lattice_points(120, 37, 61)
    # force polar + dateline coverage
    qs += [(1000, 179.75, 89.75), (1001, -179.75, -89.75),
           (1002, 0.25, 89.75), (1003, -179.75, 0.25)]
    cs = _lattice_points(60, 53, 29, id0=0)
    cs += [(2000, -179.75, 89.25), (2001, 179.25, -89.75)]

    qdf = spark.createDataFrame(qs, "query_id long, lon double, lat double")
    cdf = spark.createDataFrame(cs, "neighbor_id long, lon double, lat double")
    got = sorted(
        tuple(r) for r in
        knn_join_haversine(qdf, cdf, k=k, level=level, radius=radius).collect()
    )
    want = _brute_knn(qs, cs, k)
    assert got == want


def test_haversine_fewer_candidates_than_k(spark):
    from picogeojson_spark.operators.knn import knn_join_haversine

    qdf = spark.createDataFrame(
        [(1, 0.25, 0.25), (2, 100.25, 50.25)],
        "query_id long, lon double, lat double")
    cdf = spark.createDataFrame(
        [(10, 0.25, 1.25), (11, 10.25, 10.25)],
        "query_id long, lon double, lat double"
    ).toDF("neighbor_id", "lon", "lat")
    out = knn_join_haversine(qdf, cdf, k=5, level=3, radius=1).collect()
    # each query keeps its (shorter) full candidate ranking
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert {q: len(v) for q, v in by_q.items()} == {1: 2, 2: 2}
