"""modularity + rolling_active_users: textbook two-clique Q, single
community, anti-community negative floor; WAU/MAU hand series, window
edges, dedup of multi-events, brute replay."""

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.cohort import rolling_active_users
from picogeojson_spark.operators.graph import modularity

pytestmark = pytest.mark.usefixtures("spark")


def _e(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def _l(spark, assign):
    return spark.createDataFrame(list(assign.items()),
                                 "node long, label long")


def test_modularity_two_cliques(spark):
    # two triangles joined by one edge: the textbook community case
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    labels = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    r = modularity(_e(spark, edges), _l(spark, labels)).collect()[0]
    m = 7
    intra = 6
    # degrees: 2,2,3,3,2,2 -> d_c = 7 each; Q = 6/7 - 2*(7/14)^2
    sum_dsq = 7 * 7 * 2
    num = 10**6 * (4 * m * intra - sum_dsq)
    den = 4 * m * m
    assert (r.m_edges, r.intra_edges, r.sum_deg_sq) == (m, intra, sum_dsq)
    assert r.n_communities == 2
    assert r.q_ppm == num // den  # python // floors


def test_modularity_single_community_zero(spark):
    # everything one community: Q = m/m - (2m/2m)^2 = 0
    edges = [(0, 1), (1, 2), (0, 2)]
    r = modularity(_e(spark, edges), _l(spark, {0: 9, 1: 9, 2: 9})
                   ).collect()[0]
    assert r.q_ppm == 0 and r.n_communities == 1


def test_modularity_anti_community_negative(spark):
    # bipartite edges, partition along the sides: all edges inter
    edges = [(0, 2), (0, 3), (1, 2), (1, 3)]
    labels = {0: 0, 1: 0, 2: 1, 3: 1}
    r = modularity(_e(spark, edges), _l(spark, labels)).collect()[0]
    assert r.intra_edges == 0
    # Q = 0 - 2*(4/8)^2 = -0.5
    assert r.q_ppm == -500000


def test_modularity_empty_edges_null(spark):
    r = modularity(_e(spark, []), _l(spark, {0: 0})).collect()[0]
    assert r.q_ppm is None and r.m_edges == 0


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, day_id long")


def test_wau_hand_series(spark):
    rows = [(1, 10), (2, 10), (1, 11), (3, 12), (1, 16)]
    out = {r.day_id: r for r in rolling_active_users(
        _ev(spark, rows), week=7, month=30).collect()}
    assert out[10].dau == 2 and out[10].wau == 2 and out[10].mau == 2
    assert out[11].dau == 1
    # day 11 window [5,11]: users {1,2} day10 + {1} day11 = {1,2}
    assert out[11].wau == 2
    assert out[12].wau == 3                            # {1,2,3}
    # day 16 window [10,16]: all of 10..16 -> {1,2,3}
    assert out[16].wau == 3 and out[16].dau == 1
    assert out[16].stickiness_ppm == 10**6 // 3


def test_wau_window_edge_exclusive(spark):
    # day 17 is 7 days after day 10: day-10 activity must age OUT
    rows = [(1, 10), (2, 17)]
    out = {r.day_id: r for r in rolling_active_users(
        _ev(spark, rows), week=7, month=30).collect()}
    assert out[17].wau == 1          # [11,17] excludes day 10
    assert out[17].mau == 2          # [−12,17] includes it


def test_wau_dedups_multi_events(spark):
    rows = [(1, 5)] * 4 + [(1, 6)]
    out = {r.day_id: r for r in rolling_active_users(
        _ev(spark, rows)).collect()}
    assert out[5].dau == 1 and out[6].wau == 1


def test_wau_brute_differential(spark):
    rows = [((i * 3) % 5, 100 + (i * 7) % 20) for i in range(60)]
    got = {r.day_id: (r.dau, r.wau, r.mau) for r in
           rolling_active_users(_ev(spark, rows), week=7,
                                month=30).collect()}
    ud = {(u, d) for u, d in rows}
    days = sorted({d for _, d in ud})
    for d in days:
        def cnt(w):
            return len({u for u, dd in ud if d - w + 1 <= dd <= d})
        assert got[d] == (cnt(1), cnt(7), cnt(30)), d
    assert set(got) == set(days)


def test_wau_rejects_bad_windows(spark):
    with pytest.raises(ValueError):
        rolling_active_users(_ev(spark, [(1, 1)]), week=0)


def test_new_vs_returning(spark):
    from picogeojson_spark.operators.cohort import new_vs_returning

    rows = [(1, 10), (2, 10), (1, 11), (3, 11), (1, 11), (2, 12)]
    out = {r.day_id: r for r in new_vs_returning(
        _ev(spark, rows)).collect()}
    assert (out[10].dau, out[10].new_users) == (2, 2)
    assert out[10].new_share_ppm == 1000000
    # day 11: users {1,3}; 1 returning, 3 new (dup event deduped)
    assert (out[11].dau, out[11].new_users,
            out[11].returning_users) == (2, 1, 1)
    assert out[11].new_share_ppm == 500000
    assert (out[12].dau, out[12].new_users) == (1, 0)
    assert out[12].new_share_ppm == 0
