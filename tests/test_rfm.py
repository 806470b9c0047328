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


# ------------------------------------------------------- decayed_activity

def test_decayed_activity_hand_values(spark):
    from picogeojson_spark.operators.rfm import decayed_activity

    # half-life 1 day, ref 2024-01-10: ages 0, 1, 3; plus a future event
    rows = [
        (1, "2024-01-09 12:00:00"),   # age 0 -> 1024
        (1, "2024-01-08 12:00:00"),   # age 1 -> 512
        (1, "2024-01-06 12:00:00"),   # age 3 -> 128
        (2, "2024-01-10 00:00:00"),   # age 0 (boundary) -> 1024
        (2, "2024-01-11 00:00:00"),   # future -> dropped
        (3, "2024-01-12 00:00:00"),   # all-future user -> no row
    ]
    df = spark.createDataFrame(rows, "user_id long, s string").selectExpr(
        "user_id", "cast(s as timestamp_ntz) as ts")
    got = {r.user_id: r for r in decayed_activity(
        df, ref_ts="2024-01-10 00:00:00",
        half_life_us=86_400_000_000, scale_bits=10).collect()}
    assert set(got) == {1, 2}
    assert (got[1].n_events, got[1].decayed_score, got[1].newest_age) == (
        3, 1024 + 512 + 128, 0)
    assert (got[2].n_events, got[2].decayed_score, got[2].newest_age) == (
        1, 1024, 0)


def test_decayed_activity_deep_age_clamps_to_zero(spark):
    from picogeojson_spark.operators.rfm import decayed_activity

    df = spark.createDataFrame(
        [(1, "1924-01-01 00:00:00")], "user_id long, s string"
    ).selectExpr("user_id", "cast(s as timestamp_ntz) as ts")
    r = decayed_activity(df, ref_ts="2024-01-10 00:00:00",
                         half_life_us=86_400_000_000,
                         scale_bits=10).collect()[0]
    assert r.decayed_score == 0 and r.n_events == 1


def test_decayed_activity_no_join_no_window_plan(spark):
    from picogeojson_spark.operators.rfm import decayed_activity

    df = spark.createDataFrame(
        [(1, "2024-01-09 00:00:00")], "user_id long, s string"
    ).selectExpr("user_id", "cast(s as timestamp_ntz) as ts")
    plan = decayed_activity(df, ref_ts="2024-01-10 00:00:00")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan


def test_decayed_activity_scale_bits_bounds(spark):
    import pytest as _pytest

    from picogeojson_spark.operators.rfm import decayed_activity

    df = spark.createDataFrame(
        [(1, "2024-01-09 00:00:00")], "user_id long, s string"
    ).selectExpr("user_id", "cast(s as timestamp_ntz) as ts")
    with _pytest.raises(ValueError):
        decayed_activity(df, ref_ts="2024-01-10 00:00:00", scale_bits=63)


def test_decayed_activity_drops_sub_halflife_future_events(spark):
    # ADVICE r4 (high): an event AFTER ref_ts but within one half-life
    # has raw delta in (-h, 0) -> truncated age 0; the old age-based
    # filter kept it at FULL weight.  The contract (and the oracle)
    # filter the raw delta.
    from picogeojson_spark.operators.rfm import decayed_activity

    rows = [
        (1, "2024-01-10 12:00:00"),   # 0.5 half-lives AFTER ref -> drop
        (1, "2024-01-09 12:00:00"),   # age 0 -> 1024
        (2, "2024-01-10 00:00:01"),   # 1s after ref -> drop, user 2 gone
    ]
    df = spark.createDataFrame(rows, "user_id long, s string").selectExpr(
        "user_id", "cast(s as timestamp_ntz) as ts")
    got = {r.user_id: r for r in decayed_activity(
        df, ref_ts="2024-01-10 00:00:00",
        half_life_us=86_400_000_000, scale_bits=10).collect()}
    assert set(got) == {1}
    assert (got[1].n_events, got[1].decayed_score) == (1, 1024)
