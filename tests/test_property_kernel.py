"""Property-based kernel tests (hypothesis): invariants that must hold for
arbitrary inputs, complementing the golden/differential suites."""

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from picogeojson_spark.geo import (
    cut_dateline,
    dumps,
    loads,
    make_linestring,
    make_polygon,
    ring_is_ccw,
)
from picogeojson_spark.geo.dateline import crossing_latitude, split_path

finite_lon = st.floats(min_value=-179.99, max_value=179.99, allow_nan=False)
finite_lat = st.floats(min_value=-89.0, max_value=89.0, allow_nan=False)
position = st.tuples(finite_lon, finite_lat)


@st.composite
def simple_ring(draw):
    """A star-shaped (hence simple) ring around a random center."""
    cx = draw(st.floats(min_value=-170, max_value=170))
    cy = draw(st.floats(min_value=-80, max_value=80))
    n = draw(st.integers(min_value=3, max_value=10))
    radii = draw(
        st.lists(st.floats(min_value=0.1, max_value=5.0), min_size=n, max_size=n)
    )
    ring = [
        [cx + r * math.cos(2 * math.pi * i / n), cy + r * math.sin(2 * math.pi * i / n)]
        for i, r in enumerate(radii)
    ]
    ring.append(list(ring[0]))
    return ring


@given(simple_ring())
@settings(max_examples=200, deadline=None)
def test_winding_enforcement_idempotent(ring):
    p1 = make_polygon([ring])
    ext = p1["coordinates"][0]
    assert ring_is_ccw(ext)
    # re-normalizing is a no-op
    p2 = make_polygon([list(map(list, ext))])
    assert p2["coordinates"][0] == ext


@given(simple_ring())
@settings(max_examples=200, deadline=None)
def test_reversal_flips_orientation(ring):
    assert ring_is_ccw(ring) != ring_is_ccw(ring[::-1])


@given(st.lists(position, min_size=2, max_size=12))
@settings(max_examples=200, deadline=None)
def test_split_path_preserves_vertices(path):
    """Splitting preserves every original vertex, adds only ±180 cut points,
    and part boundaries carry equal cut latitudes."""
    path = [list(p) for p in path]
    parts = split_path(path)
    flat = [p for part in parts for p in part]
    originals = [p for p in flat if p in path]
    assert len(originals) >= len(path)
    for a, b in zip(parts[:-1], parts[1:]):
        assert a[-1][0] in (180, -180 + 1e-8)
        assert abs(a[-1][1] - b[0][1]) == 0  # shared cut latitude


@given(position, position)
@settings(max_examples=300, deadline=None)
def test_crossing_latitude_bounded(p0, p1):
    lons_apart = abs(p0[0] - p1[0]) > 180
    if not lons_apart:
        return
    y = crossing_latitude(p0, p1)
    assert min(p0[1], p1[1]) - 1e-7 <= y <= max(p0[1], p1[1]) + 1e-7


@given(st.lists(position, min_size=2, max_size=10))
@settings(max_examples=200, deadline=None)
def test_roundtrip_stability(path):
    """parse(serialize(x)) == serialize-stable after one normalization."""
    # first parse injects the default CRS (reference-identical), so compare
    # states *after* one normalization
    ls = make_linestring([list(p) for p in path])
    s1 = dumps(ls, write_crs=True)
    s2 = dumps(loads(s1), write_crs=True)
    s3 = dumps(loads(s2), write_crs=True)
    assert json.loads(s2) == json.loads(s3)


@given(st.lists(position, min_size=4, max_size=10))
@settings(max_examples=150, deadline=None)
def test_cut_dateline_never_crosses_after(path):
    ls = make_linestring([list(p) for p in path])
    cut = cut_dateline(ls)
    coords = (
        [cut["coordinates"]] if cut["type"] == "LineString" else cut["coordinates"]
    )
    for part in coords:
        for a, b in zip(part[:-1], part[1:]):
            assert abs(a[0] - b[0]) <= 180
