"""compact_cells: single-block promotion, recursive promotion, partial
blocks, z_min floor, randomized round-trip coverage equality."""

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.tiling import compact_cells

pytestmark = pytest.mark.usefixtures("spark")


def _cells(spark, xy):
    return spark.createDataFrame(list(xy), "x long, y long")


def _expand(rows, z_max):
    """Expand mixed-resolution (z,x,y) back to the z_max cell set."""
    out = set()
    for z, x, y in rows:
        f = 1 << (z_max - z)
        for dx in range(f):
            for dy in range(f):
                out.add((x * f + dx, y * f + dy))
    return out


def test_full_block_promotes(spark):
    xy = {(4, 6), (5, 6), (4, 7), (5, 7)}
    out = {tuple(r) for r in
           compact_cells(_cells(spark, xy), z_max=3).collect()}
    assert out == {(2, 2, 3)}


def test_recursive_promotion_two_levels(spark):
    xy = {(x, y) for x in range(4, 8) for y in range(8, 12)}
    out = {tuple(r) for r in
           compact_cells(_cells(spark, xy), z_max=4).collect()}
    assert out == {(2, 1, 2)}


def test_partial_block_stays(spark):
    xy = {(0, 0), (1, 0), (0, 1)}
    out = {tuple(r) for r in
           compact_cells(_cells(spark, xy), z_max=2).collect()}
    assert out == {(2, 0, 0), (2, 1, 0), (2, 0, 1)}


def test_z_min_floor_stops_promotion(spark):
    xy = {(x, y) for x in range(2) for y in range(2)}
    out = {tuple(r) for r in
           compact_cells(_cells(spark, xy), z_max=1, z_min=1).collect()}
    assert out == {(1, 0, 0), (1, 1, 0), (1, 0, 1), (1, 1, 1)}
    with pytest.raises(ValueError):
        compact_cells(_cells(spark, xy), z_max=1, z_min=2)


def test_round_trip_coverage(spark):
    xy = {(x, y) for x in range(8) for y in range(8)
          if (x, y) not in {(7, 7), (0, 5), (3, 2)}}
    out = compact_cells(_cells(spark, xy), z_max=4).collect()
    assert _expand([tuple(r) for r in out], 4) == xy
    # and it actually compacted something (dense 16x16-ish input)
    assert len(out) < len(xy)


def test_duplicate_inputs_deduped(spark):
    rows = [(0, 0), (0, 0), (1, 0), (0, 1), (1, 1)]
    out = {tuple(r) for r in
           compact_cells(_cells(spark, rows), z_max=1).collect()}
    assert out == {(0, 0, 0)}


def test_uncompact_round_trip(spark):
    from picogeojson_spark.operators.tiling import uncompact_cells

    xy = {(x, y) for x in range(8) for y in range(8)
          if (x + y) % 7 != 3}
    compacted = compact_cells(_cells(spark, xy), z_max=3)
    back = {(r.x, r.y) for r in uncompact_cells(compacted, 3).collect()}
    assert back == xy


def test_uncompact_single_parent(spark):
    from picogeojson_spark.operators.tiling import uncompact_cells

    df = spark.createDataFrame([(1, 2, 3)], "z int, x long, y long")
    out = {(r.x, r.y) for r in uncompact_cells(df, 3).collect()}
    assert out == {(x, y) for x in range(8, 12) for y in range(12, 16)}


def test_uncompact_finer_than_target_raises(spark):
    import pytest as _pytest

    from picogeojson_spark.operators.tiling import uncompact_cells

    df = spark.createDataFrame([(5, 0, 0)], "z int, x long, y long")
    with _pytest.raises(Exception):
        uncompact_cells(df, 3).collect()
