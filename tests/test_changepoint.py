"""cusum_changepoints: closed-form CUSUM identity on crafted series."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, vals, **kw):
    from picogeojson_spark.operators.changepoint import cusum_changepoints

    rows = [("a", i + 1, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_type string, hour_id long, n long")
    out = cusum_changepoints(df, **kw).orderBy("hour_id").collect()
    return out


def test_level_shift_detected(spark):
    # mean 15, slack 1: the shifted half accumulates +4/bucket.
    out = _run(spark, [10, 10, 10, 10, 20, 20, 20, 20], threshold_x=0)
    assert [r.mu for r in out] == [15] * 8
    assert [r.level for r in out] == [0, 0, 0, 0, 4, 8, 12, 16]
    assert [r.changed for r in out] == [0, 0, 0, 0, 1, 1, 1, 1]


def test_virtual_s0_first_bucket_positive(spark):
    # S1 = +4 must measure against the virtual S0 = 0, not against
    # itself (the max(0, .) reset of the textbook recurrence).
    out = _run(spark, [20, 10])
    assert [r.level for r in out] == [4, 0]


def test_reset_after_dip_matches_recurrence(spark):
    # replay the sequential recurrence in python and compare.
    vals = [5, 30, 2, 2, 40, 40, 1, 25]
    mu = sum(vals) // len(vals)
    slack = mu * 10 // 100
    c, expect = 0, []
    for v in vals:
        c = max(0, c + (v - mu - slack))
        expect.append(c)
    out = _run(spark, vals)
    assert [r.level for r in out] == expect


def test_stationary_series_never_flags(spark):
    out = _run(spark, [10] * 6, threshold_x=3)
    assert all(r.changed == 0 for r in out)
    assert all(r.level == 0 for r in out)
