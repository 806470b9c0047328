"""triangle_count: hand-computed + brute-force differential."""

from itertools import combinations

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "u long, v long"
    ).distinct()


def _brute(pairs):
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    nodes = sorted({n for e in es for n in e})
    counts = {}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def _run(spark, pairs):
    from picogeojson_spark.operators.graph import triangle_count

    out = triangle_count(_edges_df(spark, pairs)).collect()
    return {r.node: r.n_triangles for r in out}


def test_k4_and_dangling_path(spark):
    k4 = list(combinations([1, 2, 3, 4], 2))
    path = [(10, 11), (11, 12)]  # no triangles
    got = _run(spark, k4 + path)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_two_triangles_sharing_an_edge(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)]
    got = _run(spark, pairs)
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_brute_differential_on_skewed_graph(spark):
    # hub node 0 connected to everything (worst case for naive wedge
    # enumeration) + a deterministic sprinkle of rim edges.
    pairs = [(0, i) for i in range(1, 40)]
    pairs += [(i, (i * 7) % 40) for i in range(1, 40) if i != (i * 7) % 40]
    got = _run(spark, pairs)
    assert got == _brute(pairs)


def test_no_cartesian_in_plan(spark):
    from picogeojson_spark.operators.graph import triangle_count

    df = _edges_df(spark, list(combinations(range(6), 2)))
    plan = triangle_count(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_sampled_estimate_python_replay(spark):
    import hashlib

    from picogeojson_spark.operators.graph import triangle_count_estimate

    pairs = list(combinations(range(24), 2))  # K24: 2024 triangles
    q = 2

    def coin(u, v):
        h = hashlib.md5(("%d:%d" % (u, v)).encode()).hexdigest()[:8]
        return int(h, 16) % q == 0

    sampled = [(u, v) for u, v in pairs if coin(u, v)]
    want_tri = sum(
        1 for a, b, c in combinations(range(24), 3)
        if (a, b) in sampled and (b, c) in sampled and (a, c) in sampled)

    df = spark.createDataFrame(pairs, "u long, v long")
    r = triangle_count_estimate(df, q=q).collect()[0]
    assert r.n_sampled_edges == len(sampled)
    assert r.n_sampled_triangles == want_tri
    assert r.est_triangles == want_tri * q ** 3


def test_sampled_estimate_q1_is_exact(spark):
    from picogeojson_spark.operators.graph import triangle_count_estimate

    pairs = list(combinations(range(8), 2))  # K8: 56 triangles
    df = spark.createDataFrame(pairs, "u long, v long")
    r = triangle_count_estimate(df, q=1).collect()[0]
    assert r.n_sampled_triangles == r.est_triangles == 56


def test_auto_dispatch_size_threshold(spark, caplog):
    """triangle_count_auto: exact per-vertex counts under the edge
    budget; DOULION estimate (with a loud log line) above it."""
    import logging

    from picogeojson_spark.operators.graph import (
        EXACT_TRIANGLES_EDGE_BUDGET,
        triangle_count_auto,
        triangle_count_estimate,
    )

    pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
    df = _edges_df(spark, pairs)

    small = triangle_count_auto(df, edge_count=len(pairs))
    assert {f.name for f in small.schema.fields} == {"node", "n_triangles"}
    assert {r.node: r.n_triangles for r in small.collect()} == _brute(pairs)

    with caplog.at_level(logging.WARNING,
                         logger="picogeojson_spark.operators.graph"):
        big = triangle_count_auto(
            df, edge_count=EXACT_TRIANGLES_EDGE_BUDGET + 1, q=1)
    assert any("DOULION" in r.message for r in caplog.records)
    got = big.collect()[0]
    want = triangle_count_estimate(df, q=1).collect()[0]
    assert got.asDict() == want.asDict()
    assert got.est_triangles == 1  # q=1 sample == exact global count
