"""graph_summary: reciprocity + degree extremes on crafted digraphs."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, pairs):
    from picogeojson_spark.operators.graph import graph_summary

    df = spark.createDataFrame(pairs, "src long, dst long")
    [r] = graph_summary(df).collect()
    return r


def test_fully_reciprocal_cycle(spark):
    r = _run(spark, [(1, 2), (2, 1), (2, 3), (3, 2)])
    assert (r.n_nodes, r.n_edges, r.n_recip) == (3, 4, 4)
    assert r.reciprocity_ppm == 1_000_000
    assert (r.max_out, r.max_in) == (2, 2)


def test_one_way_star(spark):
    r = _run(spark, [(0, i) for i in range(1, 5)])
    assert (r.n_nodes, r.n_edges, r.n_recip) == (5, 4, 0)
    assert r.reciprocity_ppm == 0
    assert (r.max_out, r.max_in) == (4, 1)


def test_half_reciprocal(spark):
    r = _run(spark, [(1, 2), (2, 1), (1, 3)])
    assert r.n_recip == 2
    assert r.reciprocity_ppm == 666_666


def test_self_loops_and_dups_excluded(spark):
    r = _run(spark, [(1, 1), (1, 2), (1, 2), (2, 1)])
    assert (r.n_edges, r.n_recip) == (2, 2)


def test_plan_has_no_cartesian(spark):
    from picogeojson_spark.operators.graph import graph_summary

    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    plan = graph_summary(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
