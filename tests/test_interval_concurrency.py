"""interval_concurrency: +1/-1 sweep on crafted integer intervals."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, ivs):
    from picogeojson_spark.operators.stats import interval_concurrency

    df = spark.createDataFrame(ivs, "t1 long, t2 long")
    out = interval_concurrency(df).orderBy("t").collect()
    return [(r.t, r.delta, r.active) for r in out]


def test_single_interval(spark):
    assert _run(spark, [(5, 7)]) == [(5, 1, 1), (8, -1, 0)]


def test_stacked_overlap_peak(spark):
    # [1,4], [2,6], [3,5]: active peaks at 3
    got = dict((t, a) for t, _, a in _run(spark, [(1, 4), (2, 6), (3, 5)]))
    assert got[1] == 1 and got[2] == 2 and got[3] == 3
    assert got[5] == 2          # [1,4] expired at 5
    assert got[7] == 0


def test_same_day_start_and_expiry_nets(spark):
    # [1,2] expires at 3; [3,4] starts at 3 -> delta nets to 0, active 1
    got = _run(spark, [(1, 2), (3, 4)])
    assert (3, 0, 1) in got


def test_closed_interval_inclusive_end(spark):
    # a point interval [4,4] is active ON day 4
    got = dict((t, a) for t, _, a in _run(spark, [(4, 4)]))
    assert got[4] == 1 and got[5] == 0


def test_inverted_interval_dropped(spark):
    assert _run(spark, [(9, 3)]) == []
