"""holt_forecast: python replay of the exact integer recurrence, linear
ramp recovers the slope, constant series has zero trend, declining series
goes negative (the floor-division trap territory), single-point series."""

import math

import pytest

from picogeojson_spark.operators.forecast import holt_forecast

pytestmark = pytest.mark.usefixtures("spark")


def _py_holt(counts, a=300, bcoef=100):
    l, b = counts[0] * 1000, 0
    for x in counts[1:]:
        lp = math.floor((a * x * 1000 + (1000 - a) * (l + b)) / 1000)
        b = math.floor((bcoef * (lp - l) + (1000 - bcoef) * b) / 1000)
        l = lp
    return l, b


def _series_df(spark, counts, key="k"):
    rows = []
    eid = 0
    for h, n in enumerate(counts):
        day, hod = 1 + h // 24, h % 24
        for _ in range(n):
            rows.append((eid, key, f"2024-01-{day:02d} {hod:02d}:30:00"))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, event_type string, s string"
    ).selectExpr("event_id", "event_type",
                 "cast(s as timestamp_ntz) as ts")


def _run(spark, counts):
    r = holt_forecast(_series_df(spark, counts)).collect()[0]
    return r


def test_matches_python_replay(spark):
    counts = [5, 8, 3, 12, 7, 9, 15, 4, 11, 6]
    r = _run(spark, counts)
    l, b = _py_holt(counts)
    assert (r.level_milli, r.trend_milli) == (l, b)
    assert r.forecast_next_milli == l + b
    assert r.n_hours == len(counts)


def test_constant_series_zero_trend(spark):
    r = _run(spark, [7] * 12)
    assert r.level_milli == 7000 and r.trend_milli == 0
    assert r.forecast_next_milli == 7000


def test_declining_series_negative_trend(spark):
    counts = list(range(20, 2, -1))
    r = _run(spark, counts)
    l, b = _py_holt(counts)
    assert b < 0
    assert (r.level_milli, r.trend_milli) == (l, b)


def test_ramp_trend_approaches_slope(spark):
    counts = list(range(1, 40))  # slope +1/hour
    r = _run(spark, counts)
    assert 500 < r.trend_milli <= 1100  # converging toward 1000 milli


def test_single_hour_series(spark):
    r = _run(spark, [9])
    assert (r.n_hours, r.level_milli, r.trend_milli) == (1, 9000, 0)


def test_validates_params(spark):
    df = _series_df(spark, [1])
    with pytest.raises(ValueError):
        holt_forecast(df, alpha_milli=0)
    with pytest.raises(ValueError):
        holt_forecast(df, beta_milli=2000)
