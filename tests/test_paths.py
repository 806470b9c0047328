"""session_paths: hand-built sessions (gap split, k-truncation, short
sessions), cross-user counting, ordering determinism, one-shuffle plan."""

import pytest

from picogeojson_spark.operators.paths import session_paths

pytestmark = pytest.mark.usefixtures("spark")

_DDL = "event_id long, user_id long, event_type string, s string"


def _ev(spark, rows):
    return spark.createDataFrame(rows, _DDL).selectExpr(
        "event_id", "user_id", "event_type",
        "cast(s as timestamp_ntz) as ts")


def test_gap_split_and_truncation(spark):
    rows = [
        # user 1 session A: view > click > purchase > view (truncated at 3)
        (1, 1, "view", "2024-01-01 10:00:00"),
        (2, 1, "click", "2024-01-01 10:05:00"),
        (3, 1, "purchase", "2024-01-01 10:10:00"),
        (4, 1, "view", "2024-01-01 10:15:00"),
        # gap > 30 min -> session B: click alone
        (5, 1, "click", "2024-01-01 11:00:01"),
        # user 2 mirrors session A's first three
        (6, 2, "view", "2024-01-02 09:00:00"),
        (7, 2, "click", "2024-01-02 09:01:00"),
        (8, 2, "purchase", "2024-01-02 09:02:00"),
    ]
    got = {r.path: r for r in session_paths(_ev(spark, rows), k=3).collect()}
    assert got["view>click>purchase"].n_sessions == 2
    assert got["view>click>purchase"].n_users == 2
    assert got["click"].n_sessions == 1 and got["click"].n_users == 1
    assert set(got) == {"view>click>purchase", "click"}


def test_same_user_repeated_path_counts_sessions_not_users(spark):
    rows = []
    for s in range(3):
        base = f"2024-01-0{s + 1}"
        rows.append((s * 2 + 1, 7, "view", f"{base} 10:00:00"))
        rows.append((s * 2 + 2, 7, "click", f"{base} 10:01:00"))
    got = session_paths(_ev(spark, rows), k=3).collect()
    assert len(got) == 1
    assert (got[0].path, got[0].n_sessions, got[0].n_users) == (
        "view>click", 3, 1)


def test_exact_gap_boundary_same_session(spark):
    rows = [
        (1, 1, "view", "2024-01-01 10:00:00"),
        (2, 1, "click", "2024-01-01 10:30:00"),   # exactly 30 min: same
    ]
    got = session_paths(_ev(spark, rows)).collect()
    assert got[0].path == "view>click"


def test_tie_breaks_on_event_id(spark):
    rows = [
        (2, 1, "b", "2024-01-01 10:00:00"),
        (1, 1, "a", "2024-01-01 10:00:00"),
    ]
    got = session_paths(_ev(spark, rows)).collect()
    assert got[0].path == "a>b"


def test_one_shuffle_before_path_agg(spark):
    df = session_paths(_ev(spark, [(1, 1, "view", "2024-01-01 10:00:00")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # user-window exchange + the path-key exchange; no third shuffle
    assert plan.count("Exchange hashpartitioning") == 2


def test_validates_k(spark):
    with pytest.raises(ValueError):
        session_paths(_ev(spark, [(1, 1, "v", "2024-01-01 10:00:00")]), k=0)
