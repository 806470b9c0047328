"""geofence_events: hand transitions, overlap, negatives, brute differential."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from picogeojson_spark.operators.geofence import geofence_events

FENCES_SCHEMA = ("fence_id long, lat_min_u long, lat_max_u long, "
                 "lon_min_u long, lon_max_u long")
POINTS_SCHEMA = "entity_id long, seq long, lat_u long, lon_u long"


def _run(spark, points, fences, **kw):
    got = geofence_events(
        spark.createDataFrame(points, POINTS_SCHEMA),
        spark.createDataFrame(fences, FENCES_SCHEMA),
        **kw,
    ).collect()
    return {(r.entity_id, r.seq, r.fence_id, r.event) for r in got}


def _brute(points, fences):
    from collections import defaultdict

    by_e = defaultdict(list)
    for e, s, la, lo in points:
        by_e[e].append((s, la, lo))
    out = set()
    for e, pts in by_e.items():
        prev = set()
        for s, la, lo in sorted(pts):
            cur = {fid for fid, a0, a1, o0, o1 in fences
                   if a0 <= la <= a1 and o0 <= lo <= o1}
            out |= {(e, s, fid, "enter") for fid in cur - prev}
            out |= {(e, s, fid, "exit") for fid in prev - cur}
            prev = cur
    return out


def test_enter_exit_hand_case(spark):
    fences = [(1, 0, 10_000_000, 0, 10_000_000)]
    pts = [
        (7, 1, -5_000_000, 5_000_000),   # outside
        (7, 2, 5_000_000, 5_000_000),    # inside -> enter
        (7, 3, 9_000_000, 1_000_000),    # still inside -> nothing
        (7, 4, 15_000_000, 1_000_000),   # outside -> exit
    ]
    assert _run(spark, pts, fences) == {
        (7, 2, 1, "enter"), (7, 4, 1, "exit")}


def test_first_point_inside_enters_and_no_eos_exit(spark):
    fences = [(3, -1_000_000, 1_000_000, -1_000_000, 1_000_000)]
    pts = [(1, 10, 0, 0), (1, 11, 500_000, -500_000)]  # inside, inside
    assert _run(spark, pts, fences) == {(1, 10, 3, "enter")}


def test_overlapping_fences_and_closed_bounds(spark):
    fences = [
        (1, 0, 10, 0, 10),
        (2, 5, 20, 5, 20),
    ]
    pts = [
        (9, 1, 7, 7),    # inside both -> two enters
        (9, 2, 10, 10),  # boundary of 1 (closed), inside 2 -> nothing
        (9, 3, 11, 11),  # left 1 -> exit 1
        (9, 4, 21, 21),  # left 2 -> exit 2
    ]
    assert _run(spark, pts, fences) == {
        (9, 1, 1, "enter"), (9, 1, 2, "enter"),
        (9, 3, 1, "exit"), (9, 4, 2, "exit")}


def test_negative_coordinates_cell_alignment(spark):
    # fence straddling the origin and negative cells: floor-division cell
    # keys must agree between the fence cover and the point side.
    fences = [(5, -25_000_000, -15_000_000, -25_000_000, 15_000_000)]
    pts = [
        (2, 1, -20_000_000, -20_000_000),  # inside (negative cell)
        (2, 2, -20_000_000, 10_000_000),   # inside (positive lon cell)
        (2, 3, -10_000_000, 10_000_000),   # outside
    ]
    assert _run(spark, pts, fences) == {
        (2, 1, 5, "enter"), (2, 3, 5, "exit")}


def test_brute_differential_lattice(spark):
    fences = [
        (1, -40, 10, -40, 10),
        (2, 0, 35, -10, 60),
        (3, 5, 15, 5, 15),
        (4, -90, -50, 20, 80),
    ]
    pts = [
        (i % 5, i, (i * 37) % 181 - 90, (i * 53) % 181 - 90)
        for i in range(400)
    ]
    assert _run(spark, pts, fences, cell_udeg=25) == _brute(pts, fences)


def test_cover_guard_raises(spark):
    fences = [(1, -80_000_000, 80_000_000, -170_000_000, 170_000_000)]
    pts = [(1, 1, 0, 0)]
    with pytest.raises(Exception, match="cells"):
        geofence_events(
            spark.createDataFrame(pts, POINTS_SCHEMA),
            spark.createDataFrame(fences, FENCES_SCHEMA),
            cell_udeg=1_000_000, max_cover_cells=100,
        ).collect()


def test_validation(spark):
    with pytest.raises(ValueError):
        geofence_events(
            spark.createDataFrame([], POINTS_SCHEMA),
            spark.createDataFrame([], FENCES_SCHEMA),
            cell_udeg=0,
        )
