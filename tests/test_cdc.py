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


# ---------------------------------------------------------------- diff

def _snap(spark, rows):
    return spark.createDataFrame(rows, "key long, val string, n long")


def test_snapshot_diff_classifies(spark):
    from picogeojson_spark.operators.cdc import snapshot_diff

    old = _snap(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30),
                        (4, None, 40), (5, None, 50)])
    new = _snap(spark, [(2, "b", 20),      # unchanged -> omitted
                        (3, "cc", 30),     # update (value change)
                        (4, None, 40),     # NULL == NULL -> omitted
                        (5, "e", 50),      # NULL -> value: update
                        (6, "f", 60)])     # insert
    got = {r.key: r for r in snapshot_diff(old, new, keys=["key"]).collect()}
    assert set(got) == {1, 3, 5, 6}
    assert got[1].op == "D" and got[1].val == "a"
    assert got[3].op == "U" and got[3].val == "cc"
    assert got[5].op == "U" and got[5].val == "e"
    assert got[6].op == "I" and got[6].val == "f"


def test_snapshot_diff_value_to_null_is_update(spark):
    from picogeojson_spark.operators.cdc import snapshot_diff

    old = _snap(spark, [(1, "a", 10)])
    new = _snap(spark, [(1, None, 10)])
    rows = snapshot_diff(old, new, keys=["key"]).collect()
    assert len(rows) == 1 and rows[0].op == "U" and rows[0].val is None


def test_snapshot_diff_apply_round_trip(spark):
    """apply_changes(old, snapshot_diff(old, new)) == new — the pair is
    closed, including NULL-overwriting updates and deletes."""
    from pyspark.sql import functions as F

    from picogeojson_spark.operators.cdc import apply_changes, snapshot_diff

    old = _snap(spark, [(i, None if i % 13 == 0 else f"v{i % 7}", i * 3)
                        for i in range(1, 200) if i % 10 != 0])
    new = _snap(spark, [(i,
                         None if i % 11 == 0 else f"v{i % 5}",
                         i * 3 + (5 if i % 3 == 0 else 0))
                        for i in range(1, 200) if i % 7 != 0])
    diff = snapshot_diff(old, new, keys=["key"]).withColumn(
        "ts", F.lit(1).cast("long")).withColumn(
        "seq", F.col("key").cast("long"))
    replayed = apply_changes(old, diff, keys=["key"])
    a = {tuple(r) for r in replayed.collect()}
    b = {tuple(r) for r in new.collect()}
    assert a == b


def test_snapshot_diff_mismatched_payload_raises(spark):
    from picogeojson_spark.operators.cdc import snapshot_diff

    old = _snap(spark, [(1, "a", 10)])
    new = old.select("key", "val")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        snapshot_diff(old, new, keys=["key"])
