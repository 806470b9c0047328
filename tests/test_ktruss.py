"""edge_support / k_truss: hand cases + brute peeling differential."""

import pytest

from picogeojson_spark.operators.graph import edge_support, k_truss

EDGES = "u long, v long"


def _df(spark, edges):
    return spark.createDataFrame(edges, EDGES)


def _sup(spark, edges):
    got = edge_support(_df(spark, edges)).collect()
    return {(r.u, r.v): r.support for r in got}


def _truss(spark, edges, k, rounds):
    got = k_truss(_df(spark, edges), k=k, rounds=rounds).collect()
    return {(r.u, r.v): r.support for r in got}


def _brute_sup(edges):
    es = set(edges)
    sup = {}
    for (u, v) in es:
        sup[(u, v)] = sum(
            1 for w in {a for e in es for a in e}
            if w not in (u, v)
            and (min(u, w), max(u, w)) in es
            and (min(v, w), max(v, w)) in es)
    return sup


def _brute_truss(edges, k, rounds):
    es = set(edges)
    for _ in range(rounds):
        sup = _brute_sup(es)
        keep = {e for e in es if sup[e] >= k - 2}
        if keep == es:
            break
        es = keep
    return _brute_sup(es)


# K4 plus a pendant triangle hanging off one corner.
K4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
PENDANT = [(4, 5), (4, 6), (5, 6)]


def test_edge_support_hand_case(spark):
    got = _sup(spark, K4 + PENDANT)
    assert got[(1, 2)] == 2        # K4 edges each in 2 triangles
    assert got[(4, 5)] == 1        # pendant triangle edges in 1
    assert got == _brute_sup(K4 + PENDANT)


def test_edge_support_zero_kept(spark):
    got = _sup(spark, [(1, 2), (3, 4)])
    assert got == {(1, 2): 0, (3, 4): 0}


def test_k4_truss_peels_pendant(spark):
    # 4-truss (support >= 2): the pendant triangle peels, K4 survives.
    got = _truss(spark, K4 + PENDANT, k=4, rounds=3)
    assert set(got) == set(K4)
    assert all(s == 2 for s in got.values())


def test_triangle_is_3truss_not_4truss(spark):
    tri = [(1, 2), (1, 3), (2, 3)]
    assert set(_truss(spark, tri, k=3, rounds=2)) == set(tri)
    assert _truss(spark, tri, k=4, rounds=2) == {}


def test_cascading_peel_needs_rounds(spark):
    # chain of triangles sharing edges: peeling cascades one layer per
    # round; rounds=1 keeps what a converged peel would drop.
    chain = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (3, 5), (4, 5)]
    r1 = _truss(spark, chain, k=4, rounds=1)
    full = _truss(spark, chain, k=4, rounds=10)
    assert full == _brute_truss(chain, 4, 10)
    assert r1 == _brute_truss(chain, 4, 1)


def test_brute_differential(spark):
    edges = sorted({(min((i * 5) % 17, (i * 11 + 2) % 17),
                     max((i * 5) % 17, (i * 11 + 2) % 17))
                    for i in range(70)
                    if (i * 5) % 17 != (i * 11 + 2) % 17})
    for k, rounds in ((3, 2), (4, 3), (5, 3)):
        assert _truss(spark, edges, k, rounds) == \
            _brute_truss(edges, k, rounds), (k, rounds)


def test_bad_args_raise(spark):
    with pytest.raises(ValueError):
        k_truss(_df(spark, []), k=2)
    with pytest.raises(ValueError):
        k_truss(_df(spark, []), k=4, rounds=-1)
