"""colocation_pairs: hand cases + brute differential."""

import pytest

from picogeojson_spark.operators.trajsim import colocation_pairs

SCHEMA = "entity long, ts_us long, x_udeg long, y_udeg long"


def _run(spark, pts, cell, bucket, k):
    got = colocation_pairs(
        spark.createDataFrame(pts, SCHEMA), cell_udeg=cell,
        bucket_us=bucket, min_events=k,
    ).collect()
    return {(r.entity_a, r.entity_b): r.n_cobuckets for r in got}


def _brute(pts, cell, bucket, k):
    from collections import defaultdict

    pres = defaultdict(set)
    for e, t, x, y in pts:
        pres[e].add((x // cell, y // cell, t // bucket))
    ents = sorted(pres)
    out = {}
    for i, a in enumerate(ents):
        for b in ents[i + 1:]:
            n = len(pres[a] & pres[b])
            if n >= k:
                out[(a, b)] = n
    return out


def test_hand_case_and_dedup(spark):
    # entities 1,2 share bucket (0,0,0) twice (dedup -> once) and
    # (1,0,0) once; entity 3 is elsewhere.
    pts = [(1, 0, 10, 10), (1, 5, 20, 20), (1, 0, 150, 10),
           (2, 9, 30, 30), (2, 3, 160, 40),
           (3, 0, 500, 500)]
    got = _run(spark, pts, 100, 1000, 1)
    assert got[(1, 2)] == 2
    assert (1, 3) not in got and (2, 3) not in got
    assert got == _brute(pts, 100, 1000, 1)


def test_min_events_threshold(spark):
    pts = [(1, 0, 10, 10), (2, 0, 20, 20),
           (1, 1000, 10, 10), (2, 1000, 20, 20)]
    assert _run(spark, pts, 100, 1000, 2) == {(1, 2): 2}
    assert _run(spark, pts, 100, 1000, 3) == {}


def test_sharp_boundaries_contract(spark):
    # 99 vs 100 at cell=100: adjacent cells, no co-location.
    pts = [(1, 0, 99, 0), (2, 0, 100, 0)]
    assert _run(spark, pts, 100, 1000, 1) == {}


def test_negative_coords_and_ts_floor(spark):
    pts = [(1, -500, -150, -250), (2, -900, -101, -201)]
    # floors: x -2, y -3, t -1 for both.
    assert _run(spark, pts, 100, 1000, 1) == {(1, 2): 1}
    assert _run(spark, pts, 100, 1000, 1) == _brute(pts, 100, 1000, 1)


def test_brute_differential(spark):
    pts = [((i * 7) % 9, (i * 13) % 5 * 1000 + i,
            ((i * 7) % 9 % 3) * 300 + (i * 37) % 250,
            (i * 53) % 180)
           for i in range(150)]
    for cell, bucket, k in ((100, 1000, 1), (200, 2000, 2),
                            (300, 5000, 3)):
        assert _run(spark, pts, cell, bucket, k) == \
            _brute(pts, cell, bucket, k), (cell, bucket, k)


def test_bad_args_raise(spark):
    df = None
    with pytest.raises(ValueError):
        colocation_pairs(df, 0, 10)
    with pytest.raises(ValueError):
        colocation_pairs(df, 10, 10, min_events=0)
