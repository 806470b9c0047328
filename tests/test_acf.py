"""autocorrelation: exact positional-lag ACF on crafted series."""

import math
from fractions import Fraction as Fr

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, series, lags=(1, 2, 3)):
    from picogeojson_spark.operators.forecast import autocorrelation

    rows = [(k, t, v) for k, vs in series.items()
            for t, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "key string, t long, v long")
    out = autocorrelation(df, lags=lags).collect()
    return {r.key: r for r in out}


def _expect_ppm(xs, k):
    n = len(xs)
    if k >= n:
        return None
    s = sum(xs)
    den = sum((n * x - s) ** 2 for x in xs)
    if den == 0:
        return None
    num = sum((n * xs[t] - s) * (n * xs[t + k] - s) for t in range(n - k))
    return math.floor(Fr(1_000_000 * num, den))


def test_alternating_series_negative_lag1(spark):
    xs = [1, 9, 1, 9, 1, 9, 1, 9]
    r = _run(spark, {"a": xs})["a"]
    assert r.acf1_ppm == _expect_ppm(xs, 1)
    assert r.acf1_ppm < 0          # alternation -> strong negative
    assert r.acf2_ppm == _expect_ppm(xs, 2)
    assert r.acf2_ppm > 0          # period 2 -> positive at lag 2


def test_linear_trend_replay(spark):
    xs = list(range(1, 11))
    r = _run(spark, {"a": xs})["a"]
    for k, col in [(1, r.acf1_ppm), (2, r.acf2_ppm), (3, r.acf3_ppm)]:
        assert col == _expect_ppm(xs, k)


def test_constant_series_null(spark):
    r = _run(spark, {"a": [5, 5, 5, 5]})["a"]
    assert r.acf1_ppm is None


def test_lag_beyond_length_null(spark):
    r = _run(spark, {"a": [1, 2]})["a"]
    assert r.acf1_ppm is not None
    assert r.acf2_ppm is None and r.acf3_ppm is None


def test_lags_validated(spark):
    from picogeojson_spark.operators.forecast import autocorrelation

    df = spark.createDataFrame([("a", 0, 1)], "key string, t long, v long")
    with pytest.raises(ValueError):
        autocorrelation(df, lags=(0,))
