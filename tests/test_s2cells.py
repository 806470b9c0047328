"""Invariants of the cube-face (S2-style) cell encoder."""

import random

import numpy as np

from picogeojson_spark.geo.s2cells import (
    s2_cell_of,
    s2_level,
    s2_parent,
)


def _rand_pts(n, seed=4):
    rng = random.Random(seed)
    return (
        np.array([rng.uniform(-180, 180) for _ in range(n)]),
        np.array([rng.uniform(-89.9, 89.9) for _ in range(n)]),
    )


def test_determinism_and_level_tag():
    lon, lat = _rand_pts(500)
    c1 = s2_cell_of(lon, lat, 12)
    c2 = s2_cell_of(lon, lat, 12)
    assert (c1 == c2).all()
    assert (s2_level(c1) == 12).all()


def test_hierarchy_prefix_property():
    lon, lat = _rand_pts(500)
    child = s2_cell_of(lon, lat, 14)
    parent_direct = s2_cell_of(lon, lat, 12)
    assert (s2_parent(child, 14, 2) == parent_direct).all()


def test_nearby_points_share_cells_far_points_do_not():
    base = s2_cell_of(np.array([13.4]), np.array([52.52]), 8)
    near = s2_cell_of(np.array([13.4001]), np.array([52.5201]), 8)
    far = s2_cell_of(np.array([-70.0]), np.array([-30.0]), 8)
    assert int(base[0]) == int(near[0])
    assert int(base[0]) != int(far[0])


def test_faces_partition_globe():
    lon, lat = _rand_pts(2000)
    cells = s2_cell_of(lon, lat, 4)
    faces = set((cells >> 58).tolist())
    assert faces <= set(range(6))
    assert len(faces) == 6  # all faces hit with 2000 uniform points


def test_area_uniformity_beats_latlon_grid():
    """Cube-face cells at high latitude stay populated far more evenly than
    equirectangular cells: occupancy count variance check."""
    rng = random.Random(9)
    # points uniform on the sphere (reject via cos weighting)
    lats, lons = [], []
    while len(lats) < 3000:
        la = rng.uniform(-90, 90)
        if rng.random() < abs(np.cos(np.radians(la))):
            lats.append(la)
            lons.append(rng.uniform(-180, 180))
    lon = np.array(lons)
    lat = np.array(lats)
    s2 = s2_cell_of(lon, lat, 4)
    _, s2_counts = np.unique(s2, return_counts=True)
    # every occupied level-4 cube-face cell holds a bounded share of points
    assert s2_counts.max() < len(lats) * 0.05
