"""expectation_report: every rule kind with planted violations, NULL
semantics, single-scan plan for row-level rules, fk anti-probe."""

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.expectations import expectation_report

pytestmark = pytest.mark.usefixtures("spark")


def _df(spark):
    rows = [
        (1, "a", 10, "x1"),
        (2, "b", 20, "x2"),
        (2, None, 500, "bad"),   # dup key, null name, out of range, regex
        (4, "zz", -5, "x4"),     # not in set, below range
        (5, "a", 30, None),      # null regex col passes matches
    ]
    return spark.createDataFrame(rows, "k long, name string, v long, "
                                       "code string")


def test_all_rule_kinds(spark):
    df = _df(spark)
    got = {r.rule: r for r in expectation_report(
        df,
        not_null=["name"],
        in_range={"v": (0, 100)},
        in_set={"name": ["a", "b"]},
        matches={"code": r"x[0-9]"},
        unique=[["k"]],
    ).collect()}
    assert got["not_null:name"].n_violations == 1
    assert got["in_range:v"].n_violations == 2          # 500 and -5
    assert got["in_set:name"].n_violations == 1         # zz (NULL passes)
    assert got["matches:code"].n_violations == 1        # bad (NULL passes)
    assert got["unique:k"].n_violations == 1            # second k=2
    assert all(r.n_checked == 5 for r in got.values())
    assert not any(r.passed for r in got.values())


def test_clean_table_passes(spark):
    df = _df(spark).filter(F.col("k").isin(1, 5))
    got = expectation_report(df, not_null=["name"],
                             unique=[["k"]]).collect()
    assert all(r.passed and r.n_violations == 0 for r in got)


def test_fk_rule(spark):
    df = _df(spark)
    dim = spark.createDataFrame([(1,), (2,), (5,)], "k long")
    got = {r.rule: r for r in expectation_report(
        df, fks=[("k_dim", "k", dim, "k")]).collect()}
    r = got["fk:k_dim"]
    assert r.n_checked == 5 and r.n_violations == 1 and not r.passed


def test_row_rules_single_scan(spark):
    df = _df(spark)
    rep = expectation_report(df, not_null=["name"],
                             in_range={"v": (0, 100)},
                             in_set={"name": ["a", "b"]},
                             unique=[["k"]])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # one scan feeds every row-level rule
    n_scans = plan.count("LocalTableScan") + plan.count("Scan ExistingRDD")
    assert n_scans == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_no_rules_raises(spark):
    with pytest.raises(ValueError):
        expectation_report(_df(spark))


def test_unique_rule_null_keys_are_grouped_not_violations(spark):
    # ADVICE r4 (low): countDistinct(*cols) drops NULL-keyed rows, making
    # every NULL-keyed row a violation; the struct spelling groups them.
    from picogeojson_spark.operators.expectations import expectation_report

    df = spark.createDataFrame(
        [(None, 1), (None, 1), (None, 2), (7, 1), (7, 1), (8, 1)],
        "a int, b int")
    rep = {r.rule: r for r in expectation_report(
        df, unique=[("a", "b")]).collect()}
    r = rep["unique:a,b"]
    # duplicates beyond-first: one extra (None,1) and one extra (7,1)
    assert (r.n_checked, r.n_violations, r.passed) == (6, 2, False)
    # single NULL-keyed rows are NOT violations
    df2 = spark.createDataFrame([(None, 1), (None, 2), (3, 1)], "a int, b int")
    r2 = expectation_report(df2, unique=[("a", "b")]).collect()[0]
    assert (r2.n_violations, bool(r2.passed)) == (0, True)
