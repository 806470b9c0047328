"""dtw_pairs: hand cases + brute DP differential + order sensitivity."""

import pytest

from picogeojson_spark.operators.trajsim import dtw_pairs

SCHEMA = "entity long, seq long, x_udeg long, y_udeg long"


def _run(spark, pts, max_cost, cell):
    got = dtw_pairs(
        spark.createDataFrame(pts, SCHEMA), max_cost=max_cost,
        cell_udeg=cell,
    ).collect()
    return {(r.entity_a, r.entity_b): r.dtw_cost for r in got}


def _brute_dtw(A, B):
    n, m = len(A), len(B)
    INF = float("inf")
    D = [[INF] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = (A[i - 1][0] - B[j - 1][0]) ** 2 \
                + (A[i - 1][1] - B[j - 1][1]) ** 2
            D[i][j] = c + min(D[i - 1][j], D[i][j - 1], D[i - 1][j - 1])
    return D[n][m]


def _brute(pts, max_cost):
    from collections import defaultdict

    seqs = defaultdict(list)
    for e, s, x, y in pts:
        seqs[e].append((s, x, y))
    trajs = {e: [(x, y) for _, x, y in sorted(v)]
             for e, v in seqs.items()}
    ents = sorted(trajs)
    out = {}
    for i, ea in enumerate(ents):
        for eb in ents[i + 1:]:
            d = _brute_dtw(trajs[ea], trajs[eb])
            if d <= max_cost:
                out[(ea, eb)] = d
    return out


def test_identical_trajectories_zero_cost(spark):
    pts = [(1, 0, 10, 20), (1, 1, 30, 40), (2, 5, 10, 20), (2, 9, 30, 40)]
    assert _run(spark, pts, 1000, 100) == {(1, 2): 0}


def test_hand_case_warping_beats_alignment(spark):
    # A = [0, 10, 20]; B = [0, 10, 10, 20] (1-D): perfect warp -> 0.
    pts = ([(1, i, v, 0) for i, v in enumerate([0, 10, 20])]
           + [(2, i, v, 0) for i, v in enumerate([0, 10, 10, 20])])
    assert _run(spark, pts, 100, 50) == {(1, 2): 0}


def test_order_sensitivity_vs_hausdorff(spark):
    # same point SET, reversed visit order: Hausdorff 0, DTW > 0.
    fwd = [(1, i, v * 10, 0) for i, v in enumerate(range(5))]
    rev = [(2, i, v * 10, 0) for i, v in enumerate(reversed(range(5)))]
    got = _run(spark, fwd + rev, 10**9, 10**5)
    assert got[(1, 2)] == _brute(fwd + rev, 10**9)[(1, 2)]
    assert got[(1, 2)] > 0


def test_single_point_entities(spark):
    pts = [(1, 0, 0, 0), (2, 0, 3, 4), (3, 0, 3, 4), (3, 1, 6, 8)]
    got = _run(spark, pts, 10**6, 10**4)
    assert got == _brute(pts, 10**6)
    assert got[(1, 2)] == 25                     # 1x1 DP
    assert got[(2, 3)] == 0 + 25                 # path accumulates


def test_threshold_and_prefilter_completeness(spark):
    # two close entities + one far (different cell, pruned not lost).
    pts = ([(1, i, i * 100, 0) for i in range(4)]
           + [(2, i, i * 100 + 30, 10) for i in range(4)]
           + [(3, i, 10_000_000 + i * 100, 0) for i in range(4)])
    mc = 50_000
    got = _run(spark, pts, mc, 300)
    assert got == _brute(pts, mc)
    assert all(3 not in p for p in got)


def test_brute_differential(spark):
    pts = [((i * 5) % 10, i,
            ((i * 5) % 10 % 3) * 50_000 + (i * 37) % 900,
            ((i * 5) % 10 % 2) * 40_000 + (i * 53) % 800)
           for i in range(90)]
    for mc, cell in ((10**7, 4_000), (10**10, 100_000),
                     (10**13, 4_000_000)):
        assert _run(spark, pts, mc, cell) == _brute(pts, mc), (mc, cell)


def test_bad_args_raise(spark):
    df = None
    with pytest.raises(ValueError):
        dtw_pairs(df, max_cost=0, cell_udeg=10)
    with pytest.raises(ValueError):
        dtw_pairs(df, max_cost=101, cell_udeg=10)
