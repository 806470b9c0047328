"""linear_attribution: hand-computed credit splits, window edges
(strictly-before, at-window boundary), remainder truncation, the direct
bucket, and cross-user isolation."""

import pytest

from picogeojson_spark.operators.attribution import linear_attribution

pytestmark = pytest.mark.usefixtures("spark")

_DDL = "event_id long, user_id long, event_type string, s string"


def _ev(spark, rows):
    return spark.createDataFrame(rows, _DDL).selectExpr(
        "event_id", "user_id", "event_type",
        "cast(s as timestamp_ntz) as ts")


def _run(spark, rows, **kw):
    return {r.touch_type: r
            for r in linear_attribution(_ev(spark, rows), **kw).collect()}


def test_equal_split_three_touches(spark):
    got = _run(spark, [
        (1, 7, "click", "2024-01-01 00:00:00"),
        (2, 7, "view", "2024-01-02 00:00:00"),
        (3, 7, "view", "2024-01-03 00:00:00"),
        (4, 7, "purchase", "2024-01-04 00:00:00"),
    ])
    # 3 touches -> 333333 ppm each (remainder dropped)
    assert got["click"].credit_ppm_sum == 333333
    assert got["view"].credit_ppm_sum == 666666
    assert got["view"].n_touches == 2 and got["view"].n_conversions == 1
    assert "(none)" not in got


def test_touch_at_conversion_instant_excluded(spark):
    got = _run(spark, [
        (1, 7, "click", "2024-01-04 00:00:00"),
        (2, 7, "purchase", "2024-01-04 00:00:00"),
    ])
    assert set(got) == {"(none)"}
    assert got["(none)"].credit_ppm_sum == 1000000


def test_window_boundary_inclusive(spark):
    # exactly window_us before the conversion: attributed
    got = _run(spark, [
        (1, 7, "click", "2024-01-01 00:00:00"),
        (2, 7, "purchase", "2024-01-08 00:00:00"),
    ], window_us=7 * 86_400_000_000)
    assert got["click"].credit_ppm_sum == 1000000
    # one microsecond further out: direct
    got2 = _run(spark, [
        (1, 7, "click", "2023-12-31 23:59:59.999999"),
        (2, 7, "purchase", "2024-01-08 00:00:00"),
    ], window_us=7 * 86_400_000_000)
    assert set(got2) == {"(none)"}


def test_users_do_not_cross(spark):
    got = _run(spark, [
        (1, 7, "click", "2024-01-01 00:00:00"),
        (2, 8, "purchase", "2024-01-02 00:00:00"),
    ])
    assert set(got) == {"(none)"}


def test_multiple_conversions_each_credit_independently(spark):
    got = _run(spark, [
        (1, 7, "click", "2024-01-01 00:00:00"),
        (2, 7, "purchase", "2024-01-02 00:00:00"),
        (3, 7, "view", "2024-01-03 00:00:00"),
        (4, 7, "purchase", "2024-01-04 00:00:00"),
    ])
    # conv 2: click only (1e6); conv 4: click + view (500000 each)
    assert got["click"].credit_ppm_sum == 1500000
    assert got["click"].n_conversions == 2
    assert got["view"].credit_ppm_sum == 500000


def test_non_touch_types_ignored(spark):
    got = _run(spark, [
        (1, 7, "error", "2024-01-01 00:00:00"),
        (2, 7, "purchase", "2024-01-02 00:00:00"),
    ])
    assert set(got) == {"(none)"}
