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
