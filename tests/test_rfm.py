"""rfm_segments: hand-computed quintile cutoffs, tie semantics, plan."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")

_DAY = 86_400_000_000


def _run(spark, rows):
    from picogeojson_spark.operators.rfm import rfm_segments

    df = spark.createDataFrame(
        rows, "user_id long, ts_us long, cents long")
    out = rfm_segments(df).collect()
    return {r.user_id: r for r in out}


def test_hand_computed_buckets(spark):
    # 5 users, one purchase each: last_day/monetary are 10,20,30,40,50
    # (distinct) -> cutoff positions (p*n+99)//100 = 1,2,3,4 -> buckets
    # 1..5. freq is 1 for everyone -> all tie into f_bucket 1.
    rows = [(u, u * 10 * _DAY, u * 10) for u in (1, 2, 3, 4, 5)]
    got = _run(spark, rows)
    for u in (1, 2, 3, 4, 5):
        r = got[u]
        assert (r.r_bucket, r.f_bucket, r.m_bucket) == (u, 1, u)
        assert r.rfm_code == u * 100 + 10 + u
        assert r.freq == 1 and r.monetary == u * 10
        assert r.last_day == u * 10


def test_ties_share_lower_bucket(spark):
    # all users identical -> every cutoff equals the value -> bucket 1.
    rows = [(u, 5 * _DAY, 100) for u in range(1, 6)]
    got = _run(spark, rows)
    assert all(got[u].rfm_code == 111 for u in got)


def test_multi_event_aggregation(spark):
    rows = [
        (1, 1 * _DAY, 100), (1, 9 * _DAY, 250),   # freq 2, mon 350, day 9
        (2, 4 * _DAY, 50),
    ]
    got = _run(spark, rows)
    assert got[1].freq == 2 and got[1].monetary == 350
    assert got[1].last_day == 9 and got[2].last_day == 4
    # user 1 beats user 2 on all metrics -> strictly higher buckets
    assert got[1].rfm_code > got[2].rfm_code


def test_no_user_table_global_sort(spark):
    from picogeojson_spark.operators.rfm import rfm_segments

    df = spark.createDataFrame(
        [(u, u * _DAY, u) for u in range(30)],
        "user_id long, ts_us long, cents long")
    plan = rfm_segments(df)._jdf.queryExecution().executedPlan().toString()
    # the only BNLJs are the 1-row cutoff scalar attaches
    assert plan.count("BroadcastNestedLoopJoin") <= 3
    assert "CartesianProduct" not in plan
