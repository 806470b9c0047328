"""Cube-face quadtree cell ids (S2-style), from-scratch in numpy.

This is the area-uniform alternative to the equirectangular grid in
``cells.py`` (which remains the default pruning index because its covers and
k-rings are simpler and SQL-checkable). Layout follows the published S2
geometry design: lon/lat -> unit-sphere xyz -> dominant-axis cube face ->
face-local (u, v) -> quadratic-projection (s, t) -> discrete (i, j) at
``level`` -> Morton-interleaved 64-bit id::

    id = (face << 58) | (morton(i, j) << (58 - 2*level)) | level

(Morton order instead of S2's Hilbert curve: the engine only needs the
hierarchical-prefix property — parent ids are prefixes of child ids — which
Morton provides with pure bit math; Hilbert's locality bonus is irrelevant
for hash-partitioned equi-joins.)

Join output rows never depend on the cell scheme (SURVEY §7.2): cells only
prune, the winding-number kernel decides.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 26  # keeps the Morton code clear of both the sign bit and the level tag
FACE_SHIFT = 58


def _lonlat_to_xyz(lon, lat):
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    cphi = np.cos(phi)
    return cphi * np.cos(lam), cphi * np.sin(lam), np.sin(phi)


def _face_uv(x, y, z):
    """Dominant-axis face selection + gnomonic (u, v), vectorized."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    with np.errstate(divide="ignore", invalid="ignore"):
        per_face = [
            (y / x, z / x),      # face 0: +x
            (-x / y, z / y),     # face 1: +y
            (-x / z, -y / z),    # face 2: +z
            (z / x, y / x),      # face 3: -x
            (z / y, -x / y),     # face 4: -y
            (-y / z, -x / z),    # face 5: -z
        ]
        for f, (uu, vv) in enumerate(per_face):
            m = face == f
            if m.any():
                u[m] = uu[m]
                v[m] = vv[m]
    return face, u, v


def _st_from_uv(u):
    """S2's quadratic projection: evens out cell areas across a face.
    Both np.where branches are evaluated for every element, so each sqrt
    argument is clamped at 0 — the clamped values only occur on the branch
    that is discarded (|u| <= 1 on the selected side)."""
    return np.where(
        u >= 0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def _morton(i, j, level):
    """Interleave j (odd bits) and i (even bits), vectorized 64-bit."""
    out = np.zeros_like(i)
    for b in range(level):
        out |= ((i >> b) & 1) << (2 * b)
        out |= ((j >> b) & 1) << (2 * b + 1)
    return out


def s2_cell_of(lon, lat, level: int = 12):
    """Vectorized point -> cube-face cell id at ``level``."""
    x, y, z = _lonlat_to_xyz(lon, lat)
    face, u, v = _face_uv(x, y, z)
    n = np.int64(1) << level
    i = np.clip((_st_from_uv(u) * n).astype(np.int64), 0, int(n) - 1)
    j = np.clip((_st_from_uv(v) * n).astype(np.int64), 0, int(n) - 1)
    code = _morton(i, j, level)
    return (face << FACE_SHIFT) | (code << (FACE_SHIFT - 2 * level)) | np.int64(level)


def s2_parent(cell, level: int, levels_up: int = 1):
    """Parent id — a pure bit operation thanks to the prefix layout."""
    cell = np.asarray(cell, dtype=np.int64)
    new_level = level - levels_up
    face = cell >> FACE_SHIFT
    code = (cell >> (FACE_SHIFT - 2 * level)) & ((np.int64(1) << (2 * level)) - 1)
    code >>= 2 * levels_up
    return (face << FACE_SHIFT) | (code << (FACE_SHIFT - 2 * new_level)) | np.int64(
        new_level
    )


def s2_level(cell):
    return np.asarray(cell, dtype=np.int64) & 0x1F
