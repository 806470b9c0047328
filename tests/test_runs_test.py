"""runs_test: Wald-Wolfowitz run counts on crafted series."""

import math
from fractions import Fraction as Fr

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, series):
    from picogeojson_spark.operators.forecast import runs_test

    rows = [(k, t, v) for k, vs in series.items()
            for t, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "key string, t long, v long")
    return {r.key: r for r in runs_test(df).collect()}


def _ratio(runs, n1, n2):
    return math.floor(Fr(runs * 1_000_000 * (n1 + n2),
                         n1 + n2 + 2 * n1 * n2))


def test_perfect_oscillation(spark):
    xs = [0, 10] * 5  # mean 5: signs -+-+... -> 10 runs, n1=n2=5
    r = _run(spark, {"a": xs})["a"]
    assert (r.n1, r.n2, r.runs) == (5, 5, 10)
    assert r.ratio_ppm == _ratio(10, 5, 5)
    assert r.ratio_ppm > 1_000_000


def test_trending_two_runs(spark):
    xs = [1, 1, 1, 9, 9, 9]  # below-block then above-block: 2 runs
    r = _run(spark, {"a": xs})["a"]
    assert (r.n1, r.n2, r.runs) == (3, 3, 2)
    assert r.ratio_ppm < 1_000_000


def test_ties_dropped(spark):
    xs = [5, 1, 5, 9, 5]  # mean 5: the three 5s drop; signs -,+ -> 2 runs
    r = _run(spark, {"a": xs})["a"]
    assert (r.n1, r.n2, r.runs) == (1, 1, 2)


def test_one_sided_null(spark):
    # constant series: every point ties the mean -> no kept rows at all
    got = _run(spark, {"a": [3, 3, 3], "b": [1, 2, 3]})
    assert "a" not in got           # all ties filtered: no output row
    assert got["b"].ratio_ppm is not None


def test_order_by_t_not_insert_order(spark):
    from picogeojson_spark.operators.forecast import runs_test

    rows = [("k", 2, 9), ("k", 0, 1), ("k", 1, 9), ("k", 3, 1)]
    df = spark.createDataFrame(rows, "key string, t long, v long")
    [r] = runs_test(df).collect()
    # in t order: 1,9,9,1 (mean 5) -> signs -,+,+,- -> 3 runs
    assert r.runs == 3
