"""resample_trajectory: exact interpolation + partition-of-indices."""

import math

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _segs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, seg_id long, ax long, ay long, bx long, by long")


def _run(spark, rows, step):
    from picogeojson_spark.operators.segjoin import resample_trajectory

    out = resample_trajectory(_segs(spark, rows), step_u=step).collect()
    return sorted((r.doc_id, r.sample_idx, r.x, r.y) for r in out)


def test_axis_aligned_exact_samples(spark):
    # single horizontal segment of length 10 at step 3 -> samples at
    # 0, 3, 6, 9 (endpoint at 10 not emitted: 10 not a multiple of 3)
    rows = [(1, 1, 0, 5, 10, 5)]
    got = _run(spark, rows, 3)
    assert got == [(1, 0, 0, 5), (1, 1, 3, 5), (1, 2, 6, 5), (1, 3, 9, 5)]


def test_multi_segment_and_negative_direction(spark):
    # two segments: east 10 then WEST 6; cumulative 10, 16; step 4 ->
    # j=0,1,2 on seg1 (0,4,8), j=3 at cum 12 -> 2 into seg2 going west
    rows = [(1, 1, 0, 0, 10, 0), (1, 2, 10, 0, 4, 0)]
    got = _run(spark, rows, 4)
    assert got == [(1, 0, 0, 0), (1, 1, 4, 0), (1, 2, 8, 0),
                   (1, 3, 8, 0)]


def test_endpoint_emitted_when_multiple(spark):
    # length 12 at step 4: j in 0..2 from the segment, endpoint at 12 IS
    # a multiple but j*step < cum is strict -> j=3 NOT emitted (doc rule)
    rows = [(1, 1, 0, 0, 12, 0)]
    got = _run(spark, rows, 4)
    assert [g[1] for g in got] == [0, 1, 2]


def test_python_replay_diagonal(spark):
    rows = [(1, 1, 0, 0, 3_000_000, 4_000_000),
            (1, 2, 3_000_000, 4_000_000, 3_000_000, 0)]
    step = 700_000
    got = _run(spark, rows, step)
    # pure-python replay of the documented integer contract
    want = []
    cum = 0
    for _, _, ax, ay, bx, by in rows:
        ln = math.floor(math.sqrt((bx - ax) ** 2 + (by - ay) ** 2))
        cp, cum = cum, cum + ln
        j0 = -((-cp) // step)
        j1 = -((-cum) // step) - 1
        for j in range(j0, j1 + 1):
            off = j * step - cp
            xo = (abs(bx - ax) * off) // ln
            yo = (abs(by - ay) * off) // ln
            want.append((1, j, ax + (xo if bx >= ax else -xo),
                         ay + (yo if by >= ay else -yo)))
    assert got == sorted(want)


def test_zero_length_segments_skipped(spark):
    rows = [(1, 1, 0, 0, 6, 0), (1, 2, 6, 0, 6, 0), (1, 3, 6, 0, 12, 0)]
    got = _run(spark, rows, 4)
    assert [g[1] for g in got] == [0, 1, 2]
    assert got[2] == (1, 2, 8, 0)


def test_step_validation(spark):
    from picogeojson_spark.operators.segjoin import resample_trajectory

    with pytest.raises(ValueError):
        resample_trajectory(_segs(spark, [(1, 1, 0, 0, 1, 1)]), step_u=0)
