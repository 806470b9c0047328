"""link_prediction: hand-computed scores on a known graph, python brute
replay on a synthesized graph, adjacency exclusion, and the hub-cap
lever."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _edges(spark, pairs):
    return spark.createDataFrame([(u, v) for u, v in pairs],
                                 "u long, v long")


def test_hand_computed_path_graph(spark):
    from picogeojson_spark.operators.graph import link_prediction

    # path 1-2-3-4: distance-2 pairs (1,3) and (2,4), one common each
    got = {(r.u, r.v): r for r in link_prediction(
        _edges(spark, [(1, 2), (2, 3), (3, 4)])).collect()}
    assert set(got) == {(1, 3), (2, 4)}
    r = got[(1, 3)]
    # N(1)={2}, N(3)={2,4}: common 1, union 2 -> 500000 ppm
    assert (r.common_n, r.deg_u, r.deg_v, r.jaccard_ppm) == (1, 1, 2, 500000)


def test_adjacent_pairs_excluded(spark):
    from picogeojson_spark.operators.graph import link_prediction

    # triangle 1-2-3 plus spur 3-4: (1,2),(1,3),(2,3) adjacent -> excluded
    got = {(r.u, r.v) for r in link_prediction(
        _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])).collect()}
    assert got == {(1, 4), (2, 4)}


def test_python_brute_replay(spark):
    from collections import defaultdict

    from picogeojson_spark.operators.graph import link_prediction

    pairs = sorted({(min(i % 23, (i * 7) % 23), max(i % 23, (i * 7) % 23))
                    for i in range(1, 200)
                    if i % 23 != (i * 7) % 23})
    got = {(r.u, r.v): (r.common_n, r.deg_u, r.deg_v, r.jaccard_ppm)
           for r in link_prediction(_edges(spark, pairs)).collect()}

    nbr = defaultdict(set)
    for u, v in pairs:
        nbr[u].add(v)
        nbr[v].add(u)
    exp = {}
    eset = set(pairs)
    for u in nbr:
        for v in nbr:
            if u < v and (u, v) not in eset:
                c = len(nbr[u] & nbr[v])
                if c:
                    exp[(u, v)] = (c, len(nbr[u]), len(nbr[v]),
                                   c * 1000000 // (len(nbr[u])
                                                   + len(nbr[v]) - c))
    assert got == exp


def test_max_mid_degree_skips_hub(spark):
    from picogeojson_spark.operators.graph import link_prediction

    # star through hub 100 (degree 4) plus a 2-path through 5 (degree 2)
    e = _edges(spark, [(1, 100), (2, 100), (3, 100), (4, 100),
                       (1, 5), (2, 5)])
    exact = {(r.u, r.v) for r in link_prediction(e).collect()}
    capped = {(r.u, r.v) for r in
              link_prediction(e, max_mid_degree=3).collect()}
    assert exact == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                     (5, 100)}
    # hub-middle wedges gone; low-degree middles (5, 1, 2) survive
    assert capped == {(1, 2), (5, 100)}
