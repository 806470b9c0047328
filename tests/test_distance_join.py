"""distance_join_haversine: differential vs pure-Python brute force,
including polar queries that must route through the exact brute tail,
plus the no-cross-join plan guarantee when every query settles."""

import math


def _hav_udeg_py(qlon, qlat, clon, clat):
    s_lat = math.sin(math.radians(clat - qlat) / 2)
    s_lon = math.sin(math.radians(clon - qlon) / 2)
    h = (s_lat * s_lat
         + math.cos(math.radians(qlat)) * math.cos(math.radians(clat))
         * s_lon * s_lon)
    deg = math.degrees(2 * math.asin(min(1.0, math.sqrt(h))))
    return math.floor(deg * 1000000.0 + 0.5)


def _brute(queries, candidates, d_udeg):
    out = set()
    for qid, qlon, qlat in queries:
        for nid, clon, clat in candidates:
            d = _hav_udeg_py(qlon, qlat, clon, clat)
            if d <= d_udeg:
                out.add((qid, nid, d))
    return out


def _lattice(n, a, b, id0=0):
    pts = []
    for i in range(n):
        lon = ((id0 + i) * a % 720) / 2.0 - 180 + 0.25
        lat = ((id0 + i) * b % 360) / 2.0 - 90 + 0.25
        pts.append((id0 + i, lon, lat))
    return pts


def _run(spark, queries, candidates, d_udeg, **kw):
    from picogeojson_spark.operators.knn import distance_join_haversine

    q = spark.createDataFrame(queries, "query_id long, lon double, lat double")
    c = spark.createDataFrame(candidates,
                              "neighbor_id long, lon double, lat double")
    out = distance_join_haversine(q, c, d_udeg, **kw)
    return {(r["query_id"], r["neighbor_id"], r["dist_udeg"])
            for r in out.collect()}


def test_distance_join_matches_brute_with_polar_tail(spark):
    # global lattices: queries include near-polar rows (|lat| up to 89.75)
    # which cannot settle at level 5 / radius 2 with a 3-degree radius —
    # they MUST come back exact through the brute tail
    queries = _lattice(120, 37, 61)
    candidates = _lattice(300, 53, 29, id0=1000)
    assert max(abs(q[2]) for q in queries) > 85  # polar rows present
    got = _run(spark, queries, candidates, 3_000_000, level=5, radius=2)
    assert got == _brute(queries, candidates, 3_000_000)
    assert len(got) > 0


def test_distance_join_dateline_pairs(spark):
    # pairs straddling the antimeridian: ring pmod wrap must find them
    queries = [(1, 179.75, 10.25), (2, -179.75, -20.25)]
    candidates = [(11, -179.25, 10.75), (12, 179.25, -19.75),
                  (13, 0.25, 0.25)]
    got = _run(spark, queries, candidates, 2_000_000, level=5, radius=1)
    assert got == _brute(queries, candidates, 2_000_000)
    assert {(q, n) for q, n, _ in got} == {(1, 11), (2, 12)}


def test_distance_join_settled_plan_has_no_cross_join(spark):
    # all queries below |lat| 60 settle at level 5 / radius 2 for 3 deg:
    # the brute branch must not appear in the executed plan at all
    queries = [q for q in _lattice(80, 37, 61) if abs(q[2]) < 60.0]
    candidates = _lattice(200, 53, 29, id0=1000)
    from picogeojson_spark.operators.knn import distance_join_haversine

    q = spark.createDataFrame(queries, "query_id long, lon double, lat double")
    c = spark.createDataFrame(candidates,
                              "neighbor_id long, lon double, lat double")
    out = distance_join_haversine(q, c, 3_000_000, level=5, radius=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {(r["query_id"], r["neighbor_id"], r["dist_udeg"])
           for r in out.collect()}
    assert got == _brute(queries, candidates, 3_000_000)
