"""basket_rules: support/confidence/lift on hand-crafted baskets."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, baskets, min_pairs=1):
    from picogeojson_spark.operators.basket import basket_rules

    rows = [(bk, it) for bk, items in baskets.items() for it in items]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = basket_rules(df, min_pairs=min_pairs).collect()
    return {(r.u, r.v): r for r in out}


def test_hand_counts_and_lift(spark):
    # 4 baskets; {a,b} together in 2, a in 3, b in 3.
    got = _run(spark, {1: ["a", "b"], 2: ["a", "b"], 3: ["a"], 4: ["b"]})
    r = got[("a", "b")]
    assert (r.pair_n, r.n_u, r.n_v) == (2, 3, 3)
    assert r.support_ppm == 500_000           # 2/4
    assert r.conf_uv_ppm == 666_666           # floor(2e6/3)
    assert r.conf_vu_ppm == 666_666
    assert r.lift_ppm == 888_888              # floor(2*4*1e6/9)


def test_independence_lift_is_one(spark):
    # a and b in every basket: pair_n = N = n_u = n_v -> lift exactly 1e6
    got = _run(spark, {i: ["a", "b"] for i in range(5)})
    assert got[("a", "b")].lift_ppm == 1_000_000


def test_min_pairs_filters(spark):
    got = _run(spark, {1: ["a", "b"], 2: ["a", "c"], 3: ["a", "b"]},
               min_pairs=2)
    assert ("a", "b") in got and ("a", "c") not in got


def test_repeats_in_basket_count_once(spark):
    got = _run(spark, {1: ["a", "a", "b", "b"], 2: ["a", "b"]})
    assert got[("a", "b")].pair_n == 2


def test_attach_scalar_shape(spark):
    # the N attach must go through the sanctioned 1-row broadcast —
    # plan shows no CartesianProduct.
    from picogeojson_spark.operators.basket import basket_rules

    df = spark.createDataFrame([(1, "a"), (1, "b")],
                               "basket long, item string")
    plan = basket_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
