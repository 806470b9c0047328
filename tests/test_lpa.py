"""label_propagation: convergence on disjoint cliques, python brute
replay differential, cache hygiene."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def _brute_lpa(pairs, rounds):
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n, nbrs in adj.items():
            cnt = {}
            for m in nbrs:
                cnt[labels[m]] = cnt.get(labels[m], 0) + 1
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            nxt[n] = best[0]
        labels = nxt
    return labels


def test_disjoint_triangles_converge_to_min_id(spark):
    from picogeojson_spark.operators.graph import label_propagation

    pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    out = {r.node: r.label
           for r in label_propagation(_edges(spark, pairs), rounds=4)
           .collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_brute_replay_differential(spark):
    from picogeojson_spark.operators.graph import label_propagation

    # deterministic pseudo-random graph with two dense blobs + a bridge
    pairs = set()
    for i in range(60):
        a = (i * 7) % 12
        b = (i * 11 + 3) % 12
        if a != b:
            pairs.add((min(a, b), max(a, b)))
        a = 20 + (i * 5) % 10
        b = 20 + (i * 13 + 1) % 10
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    pairs.add((11, 20))  # bridge
    pairs = sorted(pairs)
    for rounds in (1, 3):
        out = {r.node: r.label
               for r in label_propagation(_edges(spark, pairs),
                                          rounds=rounds).collect()}
        assert out == _brute_lpa(pairs, rounds), rounds


def test_no_pinned_cache_after_return(spark):
    from picogeojson_spark.operators.graph import label_propagation

    pairs = [(1, 2), (2, 3)]
    label_propagation(_edges(spark, pairs), rounds=2).collect()
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty(), "label_propagation leaked persisted DataFrames"


def test_rounds_validation(spark):
    from picogeojson_spark.operators.graph import label_propagation

    with pytest.raises(ValueError):
        label_propagation(_edges(spark, [(1, 2)]), rounds=0)
