"""neighbor_feature_agg: hand cases + brute walk-sum differential."""

from picogeojson_spark.operators.graph import neighbor_feature_agg

EDGES = "u long, v long"
FEATS = "node long, feat long"


def _run(spark, edges, feats):
    got = neighbor_feature_agg(
        spark.createDataFrame(edges, EDGES),
        spark.createDataFrame(feats, FEATS),
    ).collect()
    return {r.node: (r.feat, r.deg, r.h1_sum, r.h1_mean_ppm,
                     r.walk2, r.h2_sum, r.h2_mean_ppm) for r in got}


def _brute(edges, feats):
    from collections import defaultdict

    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    f = dict(feats)
    out = {}
    for n, nbrs in adj.items():
        deg = len(nbrs)
        h1 = sum(f[v] for v in nbrs)
        walk2 = sum(len(adj[v]) for v in nbrs)
        h2 = sum(sum(f[w] for w in adj[v]) for v in nbrs)
        out[n] = (f[n], deg, h1, h1 * 10**6 // deg,
                  walk2, h2, h2 * 10**6 // walk2)
    return out


def test_path_graph_includes_self_walks(spark):
    # 1-2-3 path: node 2's 2-hop walk sum goes BACK through 2 twice.
    edges = [(1, 2), (2, 3)]
    feats = [(1, 10), (2, 70), (3, 30)]
    got = _run(spark, edges, feats)
    assert got[2] == (70, 2, 40, 20_000_000, 2, 140, 70_000_000)
    # node 1: N={2} -> h1=70; 2-hop walks: 2->1, 2->3 -> h2 = 10+30.
    assert got[1] == (10, 1, 70, 70_000_000, 2, 40, 20_000_000)
    assert got[3] == (30, 1, 70, 70_000_000, 2, 40, 20_000_000)


def test_star_graph(spark):
    edges = [(0, i) for i in range(1, 5)]
    feats = [(i, i * 100) for i in range(5)]
    got = _run(spark, edges, feats)
    assert got == _brute(edges, feats)
    # hub: h1 = 100+200+300+400; every leaf's 1-hop sum is hub feat 0.
    assert got[0][2] == 1000 and got[0][5] == 0


def test_brute_differential(spark):
    edges = sorted({(min((i * 7) % 23, (i * 11 + 3) % 23),
                     max((i * 7) % 23, (i * 11 + 3) % 23))
                    for i in range(80)
                    if (i * 7) % 23 != (i * 11 + 3) % 23})
    feats = [(n, (n * 37) % 500) for n in range(23)]
    assert _run(spark, edges, feats) == _brute(edges, feats)


def test_isolated_nodes_absent_and_floor_division(spark):
    edges = [(1, 2), (1, 3)]
    feats = [(1, 1), (2, 1), (3, 2), (9, 999)]  # 9 isolated
    got = _run(spark, edges, feats)
    assert 9 not in got
    assert got[1][3] == 1_500_000  # (1+2)*1e6 // 2
    assert got[2][6] == 1_500_000  # h2=3 over walk2=2
