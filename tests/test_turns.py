"""trajectory_turns: hand-computed turn classifications (square loop,
mirror, collinear, U-turn), consecutive-duplicate collapse, trap splice,
and the <3-point floor."""

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.geotext import trajectory_turns

pytestmark = pytest.mark.usefixtures("spark")


def _doc(spark, doc_id, pts):
    text = " then ".join(f"{lat}, {lon}" for lat, lon in pts)
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def _one(spark, pts):
    rows = trajectory_turns(_doc(spark, 1, pts)).collect()
    assert len(rows) <= 1
    return rows[0] if rows else None


def test_square_loop_all_left(spark):
    # east, north, west, south: every interior corner is a left turn
    r = _one(spark, [(0.25, 0.25), (0.25, 1.25), (1.25, 1.25),
                     (1.25, 0.25), (0.25, 0.25)])
    assert (r.n_interior, r.n_left, r.n_right) == (3, 3, 0)
    assert r.net_turns == 3


def test_mirror_square_all_right(spark):
    r = _one(spark, [(0.25, 0.25), (1.25, 0.25), (1.25, 1.25),
                     (0.25, 1.25), (0.25, 0.25)])
    assert (r.n_interior, r.n_left, r.n_right) == (3, 0, 3)
    assert r.net_turns == -3


def test_collinear_is_straight(spark):
    r = _one(spark, [(0.25, 0.25), (0.25, 1.25), (0.25, 2.25)])
    assert (r.n_interior, r.n_straight, r.n_left, r.n_right) == (1, 1, 0, 0)


def test_backtrack_is_reversal(spark):
    r = _one(spark, [(0.25, 0.25), (0.25, 1.25), (0.25, 0.25)])
    assert (r.n_interior, r.n_reversal) == (1, 1)


def test_consecutive_duplicates_collapse(spark):
    # duplicate middle point must NOT create zero-length segments
    r = _one(spark, [(0.25, 0.25), (0.25, 1.25), (0.25, 1.25),
                     (1.25, 1.25)])
    assert (r.n_interior, r.n_left) == (1, 1)


def test_out_of_range_mention_splices(spark):
    # the dropped 999.5 trap removes the middle point entirely: the
    # remaining 3 points make one straight interior vertex
    r = _one(spark, [(0.25, 0.25), (999.5, 12.25), (0.25, 1.25),
                     (0.25, 2.25)])
    assert (r.n_interior, r.n_straight) == (1, 1)


def test_fewer_than_three_points_no_row(spark):
    assert _one(spark, [(0.25, 0.25), (0.25, 1.25)]) is None
    assert _one(spark, [(0.25, 0.25)]) is None


def test_one_shuffle_plan(spark):
    df = trajectory_turns(_doc(spark, 1, [(0.25, 0.25), (0.25, 1.25),
                                          (1.25, 1.25)]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_python_brute_replay(spark):
    """Differential vs an independent python classifier over a batch of
    synthesized multi-waypoint docs (lattice + off-lattice coords)."""
    import re

    docs = [
        (i, " ".join(
            f"go {((i * 61 + j * 97) % 360) / 2 - 90 + 0.25}, "
            f"{((i * 37 + j * 131) % 720) / 2 - 180 + 0.25};"
            for j in range(2 + i % 4)))
        for i in range(1, 60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in trajectory_turns(df).collect()}

    rx = re.compile(r"(-?[0-9]{1,3}\.[0-9]+)\s*,\s*(-?[0-9]{1,3}\.[0-9]+)")
    import math
    for doc_id, text in docs:
        pts = []
        for a, o in rx.findall(text):
            lat, lon = float(a), float(o)
            if abs(lat) < 90 and abs(lon) < 180:
                p = (math.floor(lat * 1e6), math.floor(lon * 1e6))
                if not pts or pts[-1] != p:
                    pts.append(p)
        counts = {"left": 0, "right": 0, "straight": 0, "reversal": 0}
        for k in range(1, len(pts) - 1):
            v1 = (pts[k][1] - pts[k - 1][1], pts[k][0] - pts[k - 1][0])
            v2 = (pts[k + 1][1] - pts[k][1], pts[k + 1][0] - pts[k][0])
            cross = v1[0] * v2[1] - v1[1] * v2[0]
            dot = v1[0] * v2[0] + v1[1] * v2[1]
            counts["left" if cross > 0 else "right" if cross < 0
                   else "straight" if dot > 0 else "reversal"] += 1
        if len(pts) >= 3:
            r = got[doc_id]
            assert (r.n_left, r.n_right, r.n_straight, r.n_reversal) == (
                counts["left"], counts["right"], counts["straight"],
                counts["reversal"])
        else:
            assert doc_id not in got
