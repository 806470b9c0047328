"""Invariant tests for the cell index, tile scheme, and vectorized PIP."""

import random

import numpy as np

from picogeojson_spark.geo import loads
from picogeojson_spark.geo.cells import (
    DEFAULT_LEVEL,
    cell_bounds,
    cell_of,
    cell_to_level_xy,
    cover_bbox,
    k_ring,
    parent,
    ring_at,
)
from picogeojson_spark.geo.dateline import winding_number
from picogeojson_spark.geo.pip import points_in_geometry, winding_numbers
from picogeojson_spark.geo.tiles import tile_cover_bbox, tile_of, tile_unpack, tile_xy


def test_cell_roundtrip_and_containment():
    rng = random.Random(1)
    lons = np.array([rng.uniform(-180, 180) for _ in range(1000)])
    lats = np.array([rng.uniform(-90, 90) for _ in range(1000)])
    cells = cell_of(lons, lats, DEFAULT_LEVEL)
    x0, y0, x1, y1 = cell_bounds(cells)
    assert ((lons >= x0) & (lons <= x1)).all()
    assert ((lats >= y0) & (lats <= y1)).all()
    level, x, y = cell_to_level_xy(cells)
    assert (level == DEFAULT_LEVEL).all()


def test_cell_hierarchy():
    c = cell_of(12.5, 47.5, 12)
    p = parent(c)
    level, _, _ = cell_to_level_xy(p)
    assert int(level) == 11
    # parent of the cell computed directly at the coarser level agrees
    assert int(p) == int(cell_of(12.5, 47.5, 11))


def test_k_ring_sizes_and_wrap():
    c = int(cell_of(0.0, 0.0, 10))
    assert len(k_ring(c, 1)) == 9
    assert len(k_ring(c, 2)) == 25
    assert len(ring_at(c, 2)) == 16
    # dateline wrap: the ring of a cell at lon=-179.99 includes cells at +180 side
    edge = int(cell_of(-179.99, 0.0, 10))
    ring = k_ring(edge, 1)
    _, xs, _ = cell_to_level_xy(ring)
    nx = 2**11
    assert 0 in xs.tolist() and (nx - 1) in xs.tolist()


def test_cover_bbox_contains_points():
    cells = set(cover_bbox(10.0, 40.0, 12.0, 42.0, 12).tolist())
    for lon, lat in [(10.0, 40.0), (11.5, 41.7), (12.0, 42.0)]:
        assert int(cell_of(lon, lat, 12)) in cells


def test_cover_bbox_level_fallback():
    # a world-spanning bbox must fall back to a coarser level, never explode
    cells = cover_bbox(-180, -90, 180, 90, 20, max_cells=256)
    assert len(cells) <= 256


def test_tile_known_values():
    # zoom 0: everything is tile (0,0)
    x, y = tile_xy(np.array([0.0]), np.array([0.0]), 0)
    assert (int(x[0]), int(y[0])) == (0, 0)
    # zoom 1: lon/lat (0+eps, 0-eps) -> (1, 1)
    x, y = tile_xy(np.array([0.1]), np.array([-0.1]), 1)
    assert (int(x[0]), int(y[0])) == (1, 1)
    # a classic golden: (lon=13.4, lat=52.52, z=10) -> (550, 335) [Berlin]
    x, y = tile_xy(np.array([13.4]), np.array([52.52]), 10)
    assert (int(x[0]), int(y[0])) == (550, 335)


def test_tile_pack_unpack():
    tid = tile_of(np.array([13.4]), np.array([52.52]), 10)
    z, x, y = tile_unpack(tid)
    assert (int(z[0]), int(x[0]), int(y[0])) == (10, 550, 335)


def test_tile_cover_bbox():
    tids = tile_cover_bbox(13.0, 52.0, 14.0, 53.0, 10)
    z, xs, ys = tile_unpack(tids)
    assert (z == 10).all()
    t = tile_of(np.array([13.4]), np.array([52.52]), 10)
    assert int(t[0]) in set(tids.tolist())


def test_vectorized_winding_matches_scalar():
    rng = random.Random(3)
    ring = [[0, 0], [4, 0], [4, 4], [2, 6], [0, 4], [0, 0]]
    xs = np.array([rng.uniform(-1, 5) for _ in range(500)])
    ys = np.array([rng.uniform(-1, 7) for _ in range(500)])
    vec = winding_numbers(xs, ys, ring)
    for i in range(len(xs)):
        assert vec[i] == winding_number(ring, xs[i], ys[i]), (xs[i], ys[i])


def test_pip_polygon_with_hole():
    g = loads(
        '{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]],'
        "[[4,4],[6,4],[6,6],[4,6],[4,4]]]}"
    )
    xs = np.array([5.0, 1.0, 11.0, 4.5])
    ys = np.array([5.0, 1.0, 5.0, 4.5])
    got = points_in_geometry(xs, ys, g).tolist()
    assert got == [False, True, False, False]  # 5,5 in hole; 4.5,4.5 in hole


def test_pip_multipolygon():
    g = loads(
        '{"type":"MultiPolygon","coordinates":[[[[0,0],[2,0],[2,2],[0,2],[0,0]]],'
        "[[[10,10],[12,10],[12,12],[10,12],[10,10]]]]}"
    )
    xs = np.array([1.0, 11.0, 5.0])
    ys = np.array([1.0, 11.0, 5.0])
    assert points_in_geometry(xs, ys, g).tolist() == [True, True, False]


def test_cover_bbox_ints_and_level_jump_match_linear_walk():
    """cover_bbox_ints must return exactly cover_bbox's cells, and the
    predicted-jump level fit must equal the original linear walk's
    first-fitting level for bboxes of every size class."""
    from picogeojson_spark.geo.cells import (
        LEVEL_SHIFT,
        _bbox_cell_range,
        cover_bbox,
        cover_bbox_ints,
    )

    cases = []
    for k in range(40):
        w = 0.01 * (1.7 ** (k % 12))           # 0.01 .. ~2000 degrees wide
        h = 0.005 * (1.9 ** (k % 10))
        x0 = -170.0 + (k * 7.3) % 330.0
        y0 = -80.0 + (k * 11.7) % 150.0
        cases.append((x0, y0, min(x0 + w, 179.9), min(y0 + h, 89.9)))
    for (xmin, ymin, xmax, ymax) in cases:
        for max_cells in (4, 32, 4096):
            arr = cover_bbox(xmin, ymin, xmax, ymax, 12, max_cells)
            lst = cover_bbox_ints(xmin, ymin, xmax, ymax, 12, max_cells)
            assert [int(c) for c in arr] == lst, (xmin, ymin, xmax, ymax)
            # reference first-fit: linear walk from the top
            lv = 12
            r = _bbox_cell_range(xmin, ymin, xmax, ymax, lv)
            while lv > 0 and (r[1] - r[0] + 1) * (r[3] - r[2] + 1) > max_cells:
                lv -= 1
                r = _bbox_cell_range(xmin, ymin, xmax, ymax, lv)
            got_level = lst[0] >> LEVEL_SHIFT
            assert got_level == lv, (xmin, ymin, xmax, ymax, got_level, lv)
