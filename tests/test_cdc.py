"""apply_changes (CDC MERGE) unit pins: upsert/delete/latest-wins,
null-overwrite, pass-through, plan shape (WindowGroupLimit + no cross)."""

from pyspark.sql import functions as F

from picogeojson_spark.operators.cdc import apply_changes


def _apply(spark, snap_rows, change_rows):
    snap = spark.createDataFrame(snap_rows, "key long, val string, n long")
    ch = spark.createDataFrame(
        change_rows, "key long, ts long, seq long, op string, "
        "val string, n long")
    out = apply_changes(snap, ch, keys=("key",))
    return {r.key: (r.val, r.n) for r in out.collect()}


def test_apply_changes_upsert_delete_passthrough(spark):
    out = _apply(
        spark,
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        [
            (2, 5, 1, "U", "b2", 21),          # update existing
            (3, 5, 1, "D", None, None),        # delete existing
            (4, 5, 1, "I", "d", 40),           # insert new key
            (5, 5, 1, "D", None, None),        # delete absent key: no-op
        ])
    assert out == {1: ("a", 10), 2: ("b2", 21), 4: ("d", 40)}


def test_apply_changes_latest_wins_ts_then_seq(spark):
    out = _apply(
        spark,
        [(1, "a", 10)],
        [
            (1, 5, 1, "U", "old", 11),
            (1, 9, 2, "U", "newer", 12),
            (1, 9, 3, "D", None, None),        # same ts, higher seq wins
            (2, 1, 1, "D", None, None),
            (2, 2, 2, "I", "back", 22),        # later insert resurrects
        ])
    assert out == {2: ("back", 22)}


def test_apply_changes_null_payload_overwrites(spark):
    out = _apply(
        spark,
        [(1, "a", 10)],
        [(1, 5, 1, "U", None, 99)])
    assert out == {1: (None, 99)}


def test_apply_changes_plan_shape(spark):
    snap = spark.createDataFrame([(1, "a")], "key long, val string")
    ch = spark.createDataFrame(
        [(1, 1, 1, "U", "b")], "key long, ts long, seq long, op string, "
        "val string")
    plan = apply_changes(snap, ch)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
