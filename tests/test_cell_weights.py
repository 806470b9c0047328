"""bbox_cell_weights pins: exact partition-of-area, sub-cell boxes,
cell-aligned boxes, degenerate boxes, the loud max_cells guard."""

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.tiling import bbox_cell_weights

SCHEMA = ("id long, lon_min_u long, lat_min_u long, "
          "lon_max_u long, lat_max_u long")


def _w(spark, rows, **kw):
    return bbox_cell_weights(
        spark.createDataFrame(rows, SCHEMA), **kw).collect()


def test_weights_partition_box_area(spark):
    """2.5 x 1.5-cell box straddling the origin: per-cell areas sum to
    the exact box area and each cell's area is the hand-computable
    clip."""
    c = 10_000_000
    rows = _w(spark, [(1, -5_000_000, -5_000_000, 20_000_000, 10_000_000)])
    got = {(r.cx, r.cy): r.area_u2 for r in rows}
    half, full = 5_000_000, 10_000_000
    assert got == {
        (-1, -1): half * half, (0, -1): full * half, (1, -1): full * half,
        (-1, 0): half * full, (0, 0): full * full, (1, 0): full * full,
    }
    assert sum(got.values()) == 25_000_000 * 15_000_000
    assert all(r.box_area_u2 == 25_000_000 * 15_000_000 for r in rows)


def test_weights_subcell_and_aligned(spark):
    rows = _w(spark, [
        (1, 1_000_000, 2_000_000, 3_000_000, 5_000_000),    # inside (0,0)
        (2, 10_000_000, 10_000_000, 30_000_000, 20_000_000),  # 2 full cells
        (3, 4_000_000, 4_000_000, 4_000_000, 9_000_000),    # zero width
    ])
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    assert [(r.cx, r.cy, r.area_u2) for r in by_id[1]] == [
        (0, 0, 2_000_000 * 3_000_000)]
    assert sorted((r.cx, r.cy, r.area_u2) for r in by_id[2]) == [
        (1, 1, 10_000_000 * 10_000_000), (2, 1, 10_000_000 * 10_000_000)]
    assert 3 not in by_id


def test_weights_negative_coords_floor(spark):
    """Floor (not truncate-toward-zero) cell indexing for negative
    coordinates: a box just west/south of the origin is in cell
    (-1, -1)."""
    rows = _w(spark, [(1, -3_000_000, -2_000_000, -1_000_000, -500_000)])
    assert [(r.cx, r.cy, r.area_u2) for r in rows] == [
        (-1, -1, 2_000_000 * 1_500_000)]


def test_weights_max_cells_guard_raises(spark):
    with pytest.raises(Exception):
        _w(spark, [(1, -150_000_000, -80_000_000,
                    150_000_000, 80_000_000)], max_cells=16)
