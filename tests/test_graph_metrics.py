"""degree_assortativity / clustering_coefficients: hand-computed +
brute-force python differentials + plan invariants."""

from itertools import combinations

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "u long, v long"
    ).distinct()


def _brute_assort(pairs):
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    deg = {}
    for u, v in es:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    m = len(es)
    sp = sum(deg[u] * deg[v] for u, v in es)
    sd = sum(deg[u] + deg[v] for u, v in es)
    sq = sum(deg[u] ** 2 + deg[v] ** 2 for u, v in es)
    num = (4 * m * sp - sd * sd) * 1_000_000
    den = 2 * m * sq - sd * sd
    r_ppm = None if den == 0 else num // den  # python // IS floor
    return m, sp, sd, sq, r_ppm


def _brute_cc(pairs):
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    deg = {}
    for u, v in es:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    tri = {}
    nodes = sorted(deg)
    for a, b, c in combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for n in (a, b, c):
                tri[n] = tri.get(n, 0) + 1
    out = {}
    for n, d in deg.items():
        if d >= 2:
            t = tri.get(n, 0)
            out[n] = (d, t, (t * 1_000_000) // (d * (d - 1) // 2))
    return out


def _run_assort(spark, pairs):
    from picogeojson_spark.operators.graph import degree_assortativity

    r = degree_assortativity(_edges_df(spark, pairs)).collect()
    assert len(r) == 1
    row = r[0]
    return (row.m_edges, row.sum_prod, row.sum_deg, row.sum_sq, row.r_ppm)


def test_assortativity_star_is_maximally_disassortative(spark):
    # star K1,5: every edge joins deg-5 hub to deg-1 leaf -> r = -1
    pairs = [(0, i) for i in range(1, 6)]
    m, sp, sd, sq, r_ppm = _run_assort(spark, pairs)
    assert (m, sp, sd, sq, r_ppm) == _brute_assort(pairs)
    assert r_ppm == -1_000_000


def test_assortativity_regular_graph_is_degenerate_null(spark):
    # cycle C6: all degrees equal -> zero variance -> NULL r_ppm
    pairs = [(i, (i + 1) % 6) for i in range(6)]
    m, sp, sd, sq, r_ppm = _run_assort(spark, pairs)
    bm, bsp, bsd, bsq, br = _brute_assort(pairs)
    assert (m, sp, sd, sq) == (bm, bsp, bsd, bsq)
    assert br is None and r_ppm is None


def test_assortativity_brute_differential_mixed_graph(spark):
    # two hubs + rim sprinkle: negative but not -1, exercises the
    # negative-numerator floor (truncation would differ by 1 ulp).
    pairs = [(0, i) for i in range(1, 15)]
    pairs += [(1, 2), (2, 3), (5, 9), (7, 11), (100, 101)]
    got = _run_assort(spark, pairs)
    assert got == _brute_assort(pairs)
    assert got[4] is not None and got[4] < 0


def test_clustcoef_triangle_plus_tail(spark):
    # triangle 1-2-3 with tail 3-4: cc(1)=cc(2)=1e6, cc(3)=1/3 of pairs,
    # node 4 has degree 1 -> excluded.
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
    from picogeojson_spark.operators.graph import clustering_coefficients

    rows = clustering_coefficients(_edges_df(spark, pairs)).collect()
    got = {r.node: (r.deg, r.n_triangles, r.cc_ppm) for r in rows}
    assert got == _brute_cc(pairs)
    assert got[1] == (2, 1, 1_000_000)
    assert got[3] == (3, 1, 333_333)
    assert 4 not in got


def test_clustcoef_zero_triangle_nodes_present(spark):
    # path graph: every interior node deg>=2 with cc 0 must APPEAR
    pairs = [(i, i + 1) for i in range(5)]
    from picogeojson_spark.operators.graph import clustering_coefficients

    rows = clustering_coefficients(_edges_df(spark, pairs)).collect()
    got = {r.node: (r.deg, r.n_triangles, r.cc_ppm) for r in rows}
    assert got == _brute_cc(pairs)
    assert all(v == (2, 0, 0) for v in got.values())
    assert len(got) == 4


def test_clustcoef_brute_differential_skewed(spark):
    pairs = [(0, i) for i in range(1, 30)]
    pairs += [(i, (i * 11) % 30) for i in range(1, 30) if i != (i * 11) % 30]
    from picogeojson_spark.operators.graph import clustering_coefficients

    rows = clustering_coefficients(_edges_df(spark, pairs)).collect()
    got = {r.node: (r.deg, r.n_triangles, r.cc_ppm) for r in rows}
    assert got == _brute_cc(pairs)


def test_metrics_plans_have_no_cross_join(spark):
    from picogeojson_spark.operators.graph import (
        clustering_coefficients,
        degree_assortativity,
    )

    df = _edges_df(spark, list(combinations(range(6), 2)))
    for op in (degree_assortativity, clustering_coefficients):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
