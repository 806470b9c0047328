"""Unit tests: event funnel (ordered conversion within a gap)."""

import pytest


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts_us long")


def test_funnel_hand_computed(spark):
    """u1 completes all 3; u2 stalls at click (purchase too late); u3 has
    the purchase BEFORE the click (order matters); u4 never clicks."""
    from picogeojson_spark.operators.funnel import funnel_counts

    gap = 100
    rows = [
        (1, "view", 0), (1, "click", 50), (1, "purchase", 120),
        (2, "view", 0), (2, "click", 50), (2, "purchase", 500),
        (3, "purchase", 10), (3, "view", 20), (3, "click", 60),
        (4, "view", 0),
    ]
    got = {r["step"]: r["n_users"]
           for r in funnel_counts(_ev(spark, rows),
                                  ["view", "click", "purchase"],
                                  gap).collect()}
    assert got == {"view": 4, "click": 3, "purchase": 1}


def test_funnel_earliest_completion_greedy(spark):
    """Greedy takes the EARLIEST step-2 match even when a later one would
    let step 3 succeed — the documented deterministic semantics."""
    from picogeojson_spark.operators.funnel import funnel_counts

    gap = 100
    rows = [
        # earliest click at 10 -> purchase window (10, 110]; purchase at
        # 200 misses it, though the click at 150 would have caught it
        (1, "view", 0), (1, "click", 10), (1, "click", 150),
        (1, "purchase", 200),
    ]
    got = {r["step"]: r["n_users"]
           for r in funnel_counts(_ev(spark, rows),
                                  ["view", "click", "purchase"],
                                  gap).collect()}
    assert got == {"view": 1, "click": 1, "purchase": 0}


def test_funnel_matches_duckdb(spark):
    import duckdb

    from picogeojson_spark.operators.funnel import (
        funnel_counts,
        funnel_oracle_sql,
    )

    rows = [(u, t, (u * 37 + i * 13) % 500)
            for u in range(30)
            for i, t in enumerate(
                ["view", "click", "view", "purchase", "click"])]
    df = _ev(spark, rows)
    con = duckdb.connect()
    con.register("evs", df.toPandas())
    want = [tuple(r) for r in con.execute(funnel_oracle_sql(
        "SELECT user_id, event_type, ts_us FROM evs",
        ["view", "click", "purchase"], 120)).fetchall()]
    got = [tuple(r) for r in funnel_counts(
        df, ["view", "click", "purchase"], 120).collect()]
    assert got == want


def test_funnel_validation(spark):
    from picogeojson_spark.operators.funnel import funnel_counts

    df = _ev(spark, [(1, "view", 0)])
    with pytest.raises(ValueError):
        funnel_counts(df, [], 100)
    with pytest.raises(ValueError):
        funnel_counts(df, ["view"], 0)


# ------------------------------------------------------- cohort retention

def test_cohort_hand_computed(spark):
    """Week length = 7*86400*1e6 us. u1 first week 0, active weeks 0,1,3;
    u2 first week 1, active weeks 1,2; u3 only week 0."""
    from picogeojson_spark.operators.cohort import _WEEK_US, cohort_retention

    rows = [
        (1, 0), (1, _WEEK_US + 5), (1, 3 * _WEEK_US),
        (2, _WEEK_US), (2, 2 * _WEEK_US + 7),
        (3, 10),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long")
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in cohort_retention(ev, max_offset=8).collect()}
    assert got == {(0, 0): 2, (0, 1): 1, (0, 3): 1,
                   (1, 0): 1, (1, 1): 1}


def test_cohort_offset_window_clips(spark):
    from picogeojson_spark.operators.cohort import _WEEK_US, cohort_retention

    rows = [(1, 0), (1, 5 * _WEEK_US)]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long")
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in cohort_retention(ev, max_offset=2).collect()}
    assert got == {(0, 0): 1}  # week-5 activity clipped by max_offset=2


def test_cohort_negative_ts_matches_oracle(spark):
    """Pre-1970 (negative) timestamps: Spark `div` and DuckDB's integer `//`
    BOTH truncate toward zero (measured: -7//2 = -3 in DuckDB), so the
    operator and its oracle agree on negative ts_us with plain div — this
    pins the parity so neither side silently switches to floor semantics."""
    import duckdb

    from picogeojson_spark.operators.cohort import (
        _WEEK_US,
        cohort_oracle_sql,
        cohort_retention,
    )

    rows = [
        (1, -_WEEK_US // 2),           # week 0 truncated (-1 if floored)
        (1, _WEEK_US // 2),            # week 0
        (2, -3 * _WEEK_US - 1),        # week -3 truncated (-4 if floored)
        (2, -2 * _WEEK_US),            # week -2
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long")
    got = [tuple(r) for r in cohort_retention(ev, max_offset=8).collect()]
    con = duckdb.connect()
    con.register("evts", ev.toPandas())
    want = [tuple(r) for r in con.execute(cohort_oracle_sql(
        "SELECT user_id, ts_us FROM evts", max_offset=8)).fetchall()]
    assert got == want
    # truncation semantics, identical on both sides:
    assert (0, 0, 1) in got and (-3, 0, 1) in got and (-3, 1, 1) in got


def test_cohort_matches_duckdb(spark):
    import duckdb

    from picogeojson_spark.operators.cohort import (
        _WEEK_US,
        cohort_oracle_sql,
        cohort_retention,
    )

    rows = [(u, ((u * 13 + i * 5) % 11) * _WEEK_US + u * 1000)
            for u in range(25) for i in range(4)]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long")
    con = duckdb.connect()
    con.register("evts", ev.toPandas())
    want = [tuple(r) for r in con.execute(cohort_oracle_sql(
        "SELECT user_id, ts_us FROM evts", max_offset=8)).fetchall()]
    got = [tuple(r) for r in cohort_retention(ev, max_offset=8).collect()]
    assert got == want and got
