"""simpson_diversity: exact rational diversity indices on hand cases."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, rows):
    from picogeojson_spark.operators.stats import simpson_diversity

    df = spark.createDataFrame(rows, "key string, cat string")
    return {r.key: r for r in simpson_diversity(df).collect()}


def test_monoculture_zero(spark):
    r = _run(spark, [("k", "a")] * 6)["k"]
    assert (r.n, r.n_cats) == (6, 1)
    assert r.simpson_ppm == 0
    assert r.inv_simpson_ppm == 1_000_000  # one effective category


def test_uniform_two_categories(spark):
    # 3+3: sum n_i(n_i-1) = 12, n(n-1) = 30 -> simpson = 1 - 0.4 = 0.6
    r = _run(spark, [("k", "a")] * 3 + [("k", "b")] * 3)["k"]
    assert r.simpson_ppm == 600_000
    assert r.inv_simpson_ppm == 2_000_000  # exactly 2 effective cats


def test_all_distinct_max_diversity(spark):
    r = _run(spark, [("k", c) for c in "abcde"])["k"]
    assert r.simpson_ppm == 1_000_000
    assert r.inv_simpson_ppm == 5_000_000


def test_skew_hand_value(spark):
    # 4+1+1: s2w = 12, n(n-1) = 30 -> 1 - 12/30 = 0.6; s2 = 18,
    # inv = 36/18 = 2.0
    r = _run(spark, [("k", "a")] * 4 + [("k", "b"), ("k", "c")])["k"]
    assert r.simpson_ppm == 600_000
    assert r.inv_simpson_ppm == 2_000_000


def test_single_row_null_simpson(spark):
    r = _run(spark, [("k", "a")])["k"]
    assert r.simpson_ppm is None
    assert r.inv_simpson_ppm == 1_000_000
