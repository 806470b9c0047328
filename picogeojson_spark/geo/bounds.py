"""Bounding-box kernel over geometry dicts.

Observable behavior matches ``/root/reference/picogeojson/bbox.py``:

- bbox layout is ``[min_0, .., min_{n-1}, max_0, .., max_{n-1}]`` with the
  dimensionality taken from the first position;
- a Point's bbox repeats its own coordinates;
- Polygon / MultiPolygon bboxes consider the exterior ring(s) only
  (``bbox.py:10`` / ``bbox.py:23``);
- the Multi* aggregation hardcodes 2-D component indices 0..3 even for 3-D
  members (``bbox.py:15-19,26-30``) — replicated verbatim;
- empty inputs / all-``None`` members yield ``None``;
- Feature-ish types are rejected with ``TypeError`` at the geometry level.
"""

from __future__ import annotations

GEOMETRY_TYPES = frozenset(
    {
        "Point",
        "MultiPoint",
        "LineString",
        "MultiLineString",
        "Polygon",
        "MultiPolygon",
        "GeometryCollection",
    }
)


def coords_bbox(coords):
    """n-dimensional bbox of a flat position sequence; empty -> None."""
    if len(coords) == 0:
        return None
    ndim = len(coords[0])
    if ndim == 2:
        xs = [pt[0] for pt in coords]
        ys = [pt[1] for pt in coords]
        return [min(xs), min(ys), max(xs), max(ys)]
    lo = [min(pt[i] for pt in coords) for i in range(ndim)]
    hi = [max(pt[i] for pt in coords) for i in range(ndim)]
    return lo + hi


def _agg_2d(member_boxes):
    if all(bb is None for bb in member_boxes):
        return None
    present = [bb for bb in member_boxes if bb is not None]
    return [
        min(bb[0] for bb in present),
        min(bb[1] for bb in present),
        max(bb[2] for bb in present),
        max(bb[3] for bb in present),
    ]


def geometry_bbox(geom):
    """bbox of a geometry dict; raises TypeError for Feature-ish inputs."""
    t = geom["type"]
    if t == "Point":
        c = geom["coordinates"]
        ndim = len(c)
        return [c[i % ndim] for i in range(2 * ndim)]
    if t in ("LineString", "MultiPoint"):
        return coords_bbox(geom["coordinates"])
    if t == "Polygon":
        return coords_bbox(geom["coordinates"][0])
    if t == "MultiLineString":
        return _agg_2d([coords_bbox(part) for part in geom["coordinates"]])
    if t == "MultiPolygon":
        return _agg_2d([coords_bbox(poly[0]) for poly in geom["coordinates"]])
    if t == "GeometryCollection":
        return geometry_collection_bbox(geom)
    raise TypeError("type '{}' is not a geometry with a bbox".format(t))


def _agg_nd(member_boxes):
    if len(member_boxes) == 0 or all(bb is None for bb in member_boxes):
        return None
    present = [bb for bb in member_boxes if bb is not None]
    if len(member_boxes[0]) == 4:
        return [
            min(bb[0] for bb in present),
            min(bb[1] for bb in present),
            max(bb[2] for bb in present),
            max(bb[3] for bb in present),
        ]
    ndim = len(member_boxes[0]) // 2
    out = [0 for _ in range(2 * ndim)]
    for d in range(ndim):
        out[d] = min(bb[d] for bb in present)
        out[d + ndim] = max(bb[d + ndim] for bb in present)
    return out


def geometry_collection_bbox(coll):
    return _agg_nd([geometry_bbox(g) for g in coll["geometries"]])


def feature_bbox(feature):
    return geometry_bbox(feature["geometry"])


def feature_collection_bbox(coll):
    return _agg_nd([feature_bbox(f) for f in coll["features"]])


def object_bbox(obj):
    """bbox for any GeoJSON dict (geometry, Feature, or FeatureCollection)."""
    t = obj["type"]
    if t == "Feature":
        return feature_bbox(obj)
    if t == "FeatureCollection":
        return feature_collection_bbox(obj)
    return geometry_bbox(obj)
