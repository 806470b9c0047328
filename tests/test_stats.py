

# ------------------------------------------------------- key_skew_report

def test_skew_report_hand_values(spark):
    from picogeojson_spark.operators.stats import key_skew_report

    rows = ([("hot", i) for i in range(90)]
            + [(f"k{i}", i) for i in range(10)])
    df = spark.createDataFrame(rows, "k string, v long")
    r = {x.col_name: x for x in key_skew_report(df, ["k"]).collect()}["k"]
    assert (r.n_rows, r.n_keys, r.max_key, r.max_n) == (100, 11, "hot", 90)
    assert r.max_share_ppm == 900000
    # counts: ten 1s and one 90 -> p50 = 1, p99 = 90
    assert (r.p50_n, r.p99_n) == (1, 90)
    assert r.skew_ratio_ppm == 90 * 1000000


def test_skew_report_uniform_and_nulls(spark):
    from picogeojson_spark.operators.stats import key_skew_report

    rows = [(str(i % 5) if i % 7 else None, i) for i in range(70)]
    df = spark.createDataFrame(rows, "k string, v long")
    r = key_skew_report(df, ["k"]).collect()[0]
    assert r.n_rows == 70 and r.n_keys == 6  # 5 keys + (null)
    assert r.skew_ratio_ppm < 2 * 1000000    # near-uniform


def test_skew_report_multi_column_and_plan(spark):
    from picogeojson_spark.operators.stats import key_skew_report

    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "b")],
                               "x long, y string")
    rep = key_skew_report(df, ["x", "y"])
    got = {r.col_name: r for r in rep.collect()}
    assert got["x"].max_n == 2 and got["y"].max_n == 2
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_skew_report_validates(spark):
    import pytest as _pytest

    from picogeojson_spark.operators.stats import key_skew_report

    df = spark.createDataFrame([(1,)], "x long")
    with _pytest.raises(ValueError):
        key_skew_report(df, [])
