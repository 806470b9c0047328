"""hausdorff_pairs: hand cases + brute all-pairs differential."""

import pytest

from picogeojson_spark.operators.trajsim import hausdorff_pairs

SCHEMA = "entity long, x_udeg long, y_udeg long"


def _run(spark, pts, t):
    got = hausdorff_pairs(
        spark.createDataFrame(pts, SCHEMA), threshold_udeg=t
    ).collect()
    return {(r.entity_a, r.entity_b): r.hausdorff_sq for r in got}


def _brute(pts, t):
    from collections import defaultdict

    sets = defaultdict(set)
    for e, x, y in pts:
        sets[e].add((x, y))
    ents = sorted(sets)

    def dsq(a, b):
        return (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2

    def directed(A, B):
        return max(min(dsq(a, b) for b in B) for a in A)

    out = {}
    for i, ea in enumerate(ents):
        for eb in ents[i + 1:]:
            h = max(directed(sets[ea], sets[eb]),
                    directed(sets[eb], sets[ea]))
            if h <= t * t:
                out[(ea, eb)] = h
    return out


def test_hand_case_symmetric_max(spark):
    # A = {(0,0),(10,0)}, B = {(0,0)}: h(A->B)=100, h(B->A)=0 -> H=100.
    pts = [(1, 0, 0), (1, 10, 0), (2, 0, 0)]
    assert _run(spark, pts, 100) == {(1, 2): 100}


def test_threshold_excludes(spark):
    pts = [(1, 0, 0), (2, 0, 50)]
    assert _run(spark, pts, 49) == {}
    assert _run(spark, pts, 50) == {(1, 2): 2500}


def test_duplicates_and_order_invariance(spark):
    pts = [(1, 0, 0), (1, 0, 0), (1, 5, 5), (2, 5, 5), (2, 0, 0)]
    assert _run(spark, pts, 10) == {(1, 2): 0}


def test_far_pairs_pruned_but_near_kept(spark):
    # three clusters ~1e7 apart; within-cluster spread < 1000.
    pts = []
    for e in range(9):
        bx, by = (e % 3) * 10_000_000, (e // 3) * 10_000_000
        for j in range(4):
            pts.append((e, bx + j * 300, by + (j * 7 % 4) * 250))
    got = _run(spark, pts, 5_000)
    assert got == _brute(pts, 5_000)
    assert all((a % 3 == b % 3) and (a // 3 == b // 3) for a, b in got)
    assert len(got) == 0 or max(got.values()) <= 5_000 ** 2


def test_negative_coordinates_floor_cells(spark):
    pts = [(1, -1_500_000, -2_400_000), (2, -1_499_000, -2_401_000)]
    got = _run(spark, pts, 100_000)
    assert got == _brute(pts, 100_000)
    assert (1, 2) in got


def test_brute_differential(spark):
    pts = [((i * 5) % 12,
            ((i * 5) % 12 % 4) * 40_000 + (i * 37) % 700,
            ((i * 5) % 12 % 3) * 55_000 + (i * 53) % 800)
           for i in range(120)]
    for t in (1_000, 30_000, 80_000):
        assert _run(spark, pts, t) == _brute(pts, t), t


def test_bad_threshold_raises(spark):
    with pytest.raises(ValueError):
        hausdorff_pairs(spark.createDataFrame([], SCHEMA), 0)
