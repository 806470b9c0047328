"""snap_to_segments: exact point-segment matching vs a python oracle."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _brute(points, segs, radius):
    """Python replay of the exact integer-rational contract."""
    out = {}
    for pid, px, py in points:
        best = None
        for sid, ax, ay, bx, by in segs:
            l2 = (bx - ax) ** 2 + (by - ay) ** 2
            ap2 = (px - ax) ** 2 + (py - ay) ** 2
            bp2 = (px - bx) ** 2 + (py - by) ** 2
            tnum = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
            if l2 == 0 or tnum <= 0:
                d2, t = ap2, 0
            elif tnum >= l2:
                d2, t = bp2, 1000000
            else:
                d2 = (ap2 * l2 - tnum * tnum) // l2
                t = tnum * 1000000 // l2
            if d2 <= radius * radius and (
                    best is None or (d2, sid) < (best[2], best[1])):
                best = (pid, sid, d2, t)
        if best:
            out[pid] = best
    return out


def _run(spark, points, segs, radius, **kw):
    from picogeojson_spark.operators.snap import snap_to_segments

    p = spark.createDataFrame(points, "point_id long, px long, py long")
    s = spark.createDataFrame(
        segs, "seg_id long, ax long, ay long, bx long, by long")
    got = snap_to_segments(p, s, radius, **kw).collect()
    return {r.point_id: (r.point_id, r.seg_id, r.d2_udeg2, r.t_ppm)
            for r in got}


def test_interior_projection(spark):
    # horizontal segment y=0, point above its middle.
    got = _run(spark, [(1, 500, 300)], [(7, 0, 0, 1000, 0)], 1000)
    assert got == {1: (1, 7, 90000, 500000)}


def test_endpoint_clamp_before_a_and_past_b(spark):
    segs = [(7, 0, 0, 1000, 0)]
    got = _run(spark, [(1, -200, 0), (2, 1300, 100)], segs, 1000)
    assert got[1] == (1, 7, 40000, 0)
    assert got[2] == (2, 7, 100000, 1000000)


def test_degenerate_zero_length_segment(spark):
    got = _run(spark, [(1, 30, 40)], [(7, 0, 0, 0, 0)], 100)
    assert got == {1: (1, 7, 2500, 0)}


def test_radius_excludes(spark):
    got = _run(spark, [(1, 0, 5000)], [(7, 0, 0, 100, 0)], 1000)
    assert got == {}


def test_nearest_wins_tie_by_seg_id(spark):
    segs = [(9, 0, 100, 1000, 100), (3, 0, -100, 1000, -100)]
    got = _run(spark, [(1, 500, 0)], segs, 1000)
    assert got[1][1] == 3  # equal d2 -> lower seg_id


def test_differential_vs_python_oracle(spark):
    pts = [(i, ((i * 37) % 40) * 500 - 10000, ((i * 61) % 40) * 500 - 10000)
           for i in range(80)]
    segs = []
    for j in range(25):
        ax = ((j * 53) % 40) * 500 - 10000
        ay = ((j * 29) % 40) * 500 - 10000
        segs.append((j, ax, ay,
                     ax + ((j * 17) % 9 - 4) * 300,
                     ay + ((j * 11) % 9 - 4) * 300))
    radius = 2000
    got = _run(spark, pts, segs, radius)
    assert got == _brute(pts, segs, radius)


def test_cell_guard_raises_on_monster_segment(spark):
    with pytest.raises(Exception):
        _run(spark, [(1, 0, 0)],
             [(7, -10**8, -10**8, 10**8, 10**8)], 1000, max_cells=16)
