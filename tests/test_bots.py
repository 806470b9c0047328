"""bot_scores: metronome / burst / rate classifications, human negative,
single-event user, and the one-shuffle plan."""

import pytest

from picogeojson_spark.operators.bots import bot_scores

pytestmark = pytest.mark.usefixtures("spark")

_DDL = "event_id long, user_id long, event_type string, s string"


def _ev(spark, rows):
    return spark.createDataFrame(rows, _DDL).selectExpr(
        "event_id", "user_id", "event_type",
        "cast(s as timestamp_ntz) as ts")


def test_metronome_flags_regular(spark):
    rows = [(i, 1, "view", f"2024-01-01 00:{i:02d}:00") for i in range(6)]
    r = bot_scores(_ev(spark, rows)).collect()[0]
    assert r.is_regular and r.is_bot
    assert r.min_gap_us == r.max_gap_us == 60_000_000
    assert r.span_s == 300 and r.n_events == 6


def test_four_regular_events_below_floor(spark):
    rows = [(i, 1, "view", f"2024-01-01 0{i}:00:00") for i in range(4)]
    r = bot_scores(_ev(spark, rows)).collect()[0]
    assert not r.is_regular and not r.is_bot


def test_burst_same_instant(spark):
    rows = [(i, 1, "click", "2024-01-01 00:00:00") for i in range(12)]
    r = bot_scores(_ev(spark, rows)).collect()[0]
    assert r.span_s == 0 and r.rate_milli == 0
    assert not r.is_regular  # zero gaps ARE equal, but burst is the flag
    assert r.is_bot


def test_high_rate_irregular(spark):
    # 20 events over 19 seconds with alternating 0.5s/1.5s gaps
    rows, t = [], 0.0
    for i in range(20):
        rows.append((i, 1, "view",
                     f"2024-01-01 00:00:{t:09.6f}"))
        t += 0.5 if i % 2 == 0 else 1.5
    r = bot_scores(_ev(spark, rows)).collect()[0]
    assert not r.is_regular
    assert r.rate_milli == 20 * 3_600_000 // r.span_s
    assert r.is_bot  # far over 60 events/hour


def test_human_pace_negative(spark):
    rows = [(i, 1, ["view", "click", "purchase"][i % 3],
             f"2024-01-0{i + 1} 0{i}:0{i * 7 % 10}:00") for i in range(5)]
    r = bot_scores(_ev(spark, rows)).collect()[0]
    assert not r.is_bot and r.n_types == 3


def test_single_event_user(spark):
    r = bot_scores(_ev(spark, [(1, 1, "view", "2024-01-01 00:00:00")])
                   ).collect()[0]
    assert (r.n_events, r.span_s, r.rate_milli) == (1, 0, 0)
    assert r.min_gap_us is None and not r.is_bot


def test_one_shuffle_plan(spark):
    df = bot_scores(_ev(spark, [(1, 1, "view", "2024-01-01 00:00:00")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
