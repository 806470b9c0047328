"""Trajectory mining, Markov transitions, and the stream-stream interval
join — unit pins for the closed-form cases plus stream==batch parity."""

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.geotext import trajectory_measures


def _traj_rows(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r.doc_id: r for r in trajectory_measures(df).collect()}


def test_trajectory_closed_form(spark):
    """3-4-5 triangle in micro-degrees: (0.25,0.25) -> (3.25,4.25) is
    dx=4e6, dy=3e6 -> segment exactly 5e6; then straight back to start."""
    out = _traj_rows(spark, [
        (1, "go 0.25, 0.25 then 3.25, 4.25 then 0.25, 0.25 end"),
    ])
    r = out[1]
    assert r.n_pts == 3
    assert r.path_len_u == 10_000_000
    assert r.disp_u == 0
    assert (r.lat_min_u, r.lat_max_u) == (250_000, 3_250_000)
    assert (r.lon_min_u, r.lon_max_u) == (250_000, 4_250_000)


def test_trajectory_off_lattice_floor(spark):
    """General decimals (not on the test lattice): floor(lat*1e6) exactness
    is the operator's contract, not the lattice."""
    out = _traj_rows(spark, [(7, "from 1.5, 2.25 to 4.5, 6.25 .")])
    r = out[7]
    assert r.n_pts == 2
    assert r.path_len_u == 5_000_000  # dx=4e6, dy=3e6
    assert r.disp_u == 5_000_000


def test_trajectory_trap_splices(spark):
    """An out-of-range mention BETWEEN two valid ones is dropped and the
    polyline splices across it (one segment, not two broken ones)."""
    spliced = _traj_rows(spark, [
        (1, "a 0.25, 0.25 bad 999.5, 12.25 b 3.25, 4.25"),
    ])[1]
    direct = _traj_rows(spark, [(1, "a 0.25, 0.25 b 3.25, 4.25")])[1]
    assert spliced.n_pts == direct.n_pts == 2
    assert spliced.path_len_u == direct.path_len_u == 5_000_000


def test_trajectory_short_docs_excluded(spark):
    out = _traj_rows(spark, [
        (1, "only one 0.25, 0.25 here"),
        (2, "no coordinates at all"),
        (3, "pair 0.25, 0.25 and 1.25, 1.25"),
    ])
    assert set(out) == {3}


def test_transitions_ppm_truncates(spark):
    """1 of 3 -> 333333 ppm (truncating integer division both engines)."""
    import __spark_entry__ as e
    rows = [
        (1, "2024-01-01 00:00:01", 10, "view"),
        (2, "2024-01-01 00:00:02", 10, "click"),
        (3, "2024-01-01 00:00:03", 10, "view"),
        (4, "2024-01-01 00:00:04", 10, "view"),
        (5, "2024-01-01 00:00:05", 10, "click"),
        (6, "2024-01-01 00:00:06", 10, "error"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id",
                                      "event_type"]).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz"))

    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (df.withColumn("prev_type", F.lag("event_type").over(w))
             .filter(F.col("prev_type").isNotNull()))
    trans = pairs.groupBy("prev_type",
                          F.col("event_type").alias("next_type")).agg(
        F.count("*").cast("long").alias("n"))
    tw = Window.partitionBy("prev_type")
    out = {(r.prev_type, r.next_type): (r.n, r.p_ppm)
           for r in trans.withColumn("row_total", F.sum("n").over(tw))
           .select("prev_type", "next_type", "n",
                   F.expr("div(n * 1000000, row_total)").cast("long")
                   .alias("p_ppm")).collect()}
    # view -> {click: 2, view: 1}: 2/3 and 1/3 truncate
    assert out[("view", "click")] == (2, 666666)
    assert out[("view", "view")] == (1, 333333)
    assert out[("click", "view")] == (1, 500000)
    assert out[("click", "error")] == (1, 500000)


def test_stream_attribution_equals_batch(spark):
    """The watermarked stream-stream interval join emits exactly the batch
    interval join's pairs (inner join: nothing dropped, nothing extra)."""
    import __spark_entry__ as e
    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r.user_id, r.click_id, r.buy_id, r.lag_us)
        for r in e.queries()["stream_attribution"](spark, sf).collect()
    )
    ev = spark.read.parquet(sf + "/events.parquet")
    a = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("a_ts"))
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"),
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"))
    batch = a.join(b, (F.col("user_id") == F.col("b_user"))
                   & (F.col("b_ts") >= F.col("a_ts"))
                   & (F.col("b_ts") <= F.col("a_ts")
                      + F.expr("INTERVAL 2 HOURS")))
    want = sorted(
        (r.user_id, r.click_id, r.buy_id, r.lag_us)
        for r in batch.select(
            "user_id", "click_id", "buy_id",
            F.expr("timestampdiff(MICROSECOND, a_ts, b_ts)")
            .cast("long").alias("lag_us")).collect()
    )
    assert got == want and len(got) > 0


def test_od_flows_hand_computed_and_splice(spark):
    from picogeojson_spark.operators.geotext import od_flows

    docs = spark.createDataFrame(
        [
            # cell pitch 10 deg: (5.25,5.25)->cell(0,0); (15.25,5.25)->(1,0)
            (1, "go 5.25, 5.25 then 5.25, 15.25 back to 5.25, 5.25"),
            # dwell: both mentions in cell (0,0) -> no flow
            (2, "at 5.25, 5.25 then 6.25, 6.25"),
            # splice: invalid 999.5 mention mid-path must connect ends
            (3, "a 5.25, 5.25 x 999.5, 12.25 b 5.25, 15.25"),
        ],
        "doc_id long, text string",
    )
    rows = {((r.from_cx, r.from_cy), (r.to_cx, r.to_cy)):
            (r.n_trips, r.n_docs) for r in od_flows(docs).collect()}
    # doc1 contributes both directions; doc3 splices into (0,0)->(1,0)
    assert rows[((0, 0), (1, 0))] == (2, 2)
    assert rows[((1, 0), (0, 0))] == (1, 1)
    assert len(rows) == 2  # dwell dropped, nothing else


def _stay_rows(spark, rows, **kw):
    from picogeojson_spark.operators.geotext import staypoints

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return sorted(
        staypoints(df, **kw).collect(),
        key=lambda r: (r.doc_id, r.run_id))


def test_staypoints_runs_and_min_pts(spark):
    """Three mentions in cell (0,0), one hop to cell (2,1), two back-to-
    back in (2,1): runs of 3 and 3? No — the hop and the two that follow
    share cell (2,1) so it's runs of 3 then 3; with min_pts=2 both emit;
    then a lone trailing cell -> filtered."""
    txt = ("a 1.25, 2.25 b 3.25, 4.25 c 5.25, 6.25 "   # cell (0,0) x3
           "d 15.25, 26.25 e 16.25, 27.25 f 17.25, 28.25 "  # cell (2,1) x3
           "g 55.25, 66.25")                            # lone -> dropped
    out = _stay_rows(spark, [(1, txt)])
    assert [(r.cx, r.cy, r.n_mentions, r.first_idx, r.last_idx)
            for r in out] == [(0, 0, 3, 0, 2), (2, 1, 3, 3, 5)]
    # min_pts=1 keeps the lone trailing stay too
    out1 = _stay_rows(spark, [(1, txt)], min_pts=1)
    assert [(r.cx, r.cy, r.n_mentions) for r in out1] == [
        (0, 0, 3), (2, 1, 3), (6, 5, 1)]


def test_staypoints_trap_splices_run(spark):
    """An out-of-range mention INSIDE a same-cell run is dropped and must
    NOT break the run (its valid neighbours stay consecutive)."""
    spliced = _stay_rows(spark, [
        (1, "a 1.25, 2.25 bad 999.5, 12.25 b 3.25, 4.25 c 5.25, 6.25"),
    ])
    assert [(r.cx, r.cy, r.n_mentions) for r in spliced] == [(0, 0, 3)]


def test_staypoints_revisit_is_new_run(spark):
    """Leaving a cell and coming back is a NEW stay (run-length, not
    groupBy-cell)."""
    out = _stay_rows(spark, [
        (1, "a 1.25, 2.25 b 3.25, 4.25 "      # (0,0) x2
            "c 15.25, 26.25 d 16.25, 27.25 "  # (2,1) x2
            "e 5.25, 6.25 f 7.25, 8.25"),     # (0,0) again x2
    ])
    assert [(r.cx, r.cy, r.n_mentions) for r in out] == [
        (0, 0, 2), (2, 1, 2), (0, 0, 2)]
    assert [r.run_id for r in out] == [1, 2, 3]
