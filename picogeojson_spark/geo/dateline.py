"""Antimeridian (dateline) splitting kernel over geometry dicts.

Observable behavior matches ``/root/reference/picogeojson/antimeridian.py``:

- a segment crosses iff ``abs(x0 - x1) > 180`` (``antimeridian.py:10-11``);
- the crossing latitude is the distance-weighted average of the endpoint
  latitudes using offsets ``abs((x + 360) % 360 - 180)`` and is rounded to
  8 decimal places (``antimeridian.py:13-17``);
- east-moving paths end at ``(180, y)`` and restart at ``(-180 + 1e-8, y)``;
  west-moving paths are mirrored (``antimeridian.py:19-41``);
- when a ring splits, the last part is always merged onto the end of the
  first part before re-closing (the reference's guard at
  ``antimeridian.py:50`` compares a position to the scalar 180 and is
  therefore always true — replicated);
- hole assignment after a polygon split uses the any-vertex winding-number
  ``contains`` test with its exact edge rules (``antimeridian.py:72-88``);
- type promotion: LineString -> MultiLineString, Polygon -> MultiPolygon,
  Multi*/GeometryCollection/Feature/FeatureCollection member-wise; objects
  that need no split are returned unchanged (identity), except Multi* which
  are rebuilt member-wise like the reference.
"""

from __future__ import annotations

EDGE_EPS = 1e-8


def segment_crosses(x0, x1) -> bool:
    return abs(x0 - x1) > 180


def crossing_latitude(pt0, pt1):
    d0 = float(abs((pt0[0] + 360) % 360 - 180))
    d1 = float(abs((pt1[0] + 360) % 360 - 180))
    return round((d0 * pt0[1] + d1 * pt1[1]) / (d0 + d1), 8)


def split_path(coordinates):
    """Cut a position list at every dateline crossing; returns list of parts."""
    parts = []
    current = [coordinates[0]]
    for i in range(len(coordinates) - 1):
        a = coordinates[i]
        b = coordinates[i + 1]
        if segment_crosses(a[0], b[0]):
            y = crossing_latitude(a, b)
            if a[0] > 0:  # travelling east across the line
                current.append([180, y])
                parts.append(current)
                current = [[-180 + EDGE_EPS, y], b]
            else:  # travelling west
                current.append([-180 + EDGE_EPS, y])
                parts.append(current)
                current = [[180, y], b]
        else:
            current.append(b)
    parts.append(current)
    return parts


def path_crosses(coordinates) -> bool:
    # hot pre-check on every serialize: plain loop, no generator frames
    if not coordinates:
        return False
    prev = coordinates[0][0]
    for pt in coordinates[1:]:
        x = pt[0]
        if (x - prev > 180) or (prev - x > 180):
            return True
        prev = x
    return False


def _reclose(part):
    if part[0] != part[-1]:
        part.append(part[0])
    return part


def split_ring(ring):
    parts = split_path(ring)
    if len(parts) != 1:
        # the reference's "already starts at the line" guard can never fire
        # (position-vs-scalar compare), so the wrap-around merge is
        # unconditional for split rings
        tail = parts.pop()
        parts[0] = parts[0] + tail
    return [_reclose(p) for p in parts]


def ring_contains_any_vertex(ring, probe) -> bool:
    """Any-vertex winding-number containment with the reference edge rules.

    ``ring`` is a closed position list; ``probe`` is a position list.  True
    iff any probe vertex has nonzero winding number.  Preceded by a bbox
    fast-reject exactly like the reference ``contains``.
    """
    bx0 = min(p[0] for p in ring)
    by0 = min(p[1] for p in ring)
    bx1 = max(p[0] for p in ring)
    by1 = max(p[1] for p in ring)
    px0 = min(p[0] for p in probe)
    py0 = min(p[1] for p in probe)
    px1 = max(p[0] for p in probe)
    py1 = max(p[1] for p in probe)
    if bx0 > px1 or bx1 < px0 or by0 > py1 or by1 < py0:
        return False

    for p in probe:
        if winding_number(ring, p[0], p[1]) != 0:
            return True
    return False


def winding_number(ring, x, y) -> int:
    """Winding number of point ``(x, y)`` w.r.t. closed ``ring``.

    Edge rules replicate the reference exactly: upward crossings count when
    ``y0 <= y < y1`` and the point is strictly left; downward crossings when
    ``y0 >= y > y1`` and the point is not strictly left
    (``/root/reference/picogeojson/antimeridian.py:72-88``).
    """
    wn = 0
    for i in range(len(ring) - 1):
        x0, y0 = ring[i][0], ring[i][1]
        x1, y1 = ring[i + 1][0], ring[i + 1][1]
        left = (x1 - x0) * (y - y0) - (x - x0) * (y1 - y0) > 0
        if y0 <= y < y1:
            if left:
                wn += 1
        elif y0 >= y > y1:
            if not left:
                wn -= 1
    return wn


def cut_dateline(obj):
    """Split a GeoJSON dict wherever it crosses the antimeridian.

    Type promotion and identity-return behavior per the reference
    ``antimeridian_cut`` (``/root/reference/picogeojson/antimeridian.py:99-161``).
    """
    from .algebra import make_polygon, make_multipolygon  # cycle-free import

    t = obj["type"]
    if t == "LineString":
        coords = obj["coordinates"]
        if path_crosses(coords):
            return {
                "type": "MultiLineString",
                "coordinates": split_path(coords),
                "crs": obj.get("crs"),
            }
        return obj
    if t == "Polygon":
        rings = obj["coordinates"]
        if path_crosses(rings[0]):
            shells = split_ring(rings[0])
            holes = []
            for hole in rings[1:]:
                holes.extend(split_ring(hole))
            polys = []
            for shell in shells:
                poly = [shell]
                for hole in holes:
                    if ring_contains_any_vertex(shell, hole):
                        poly.append(hole)
                polys.append(poly)
            return make_multipolygon(polys, obj.get("crs"))
        return obj
    if t == "MultiLineString":
        out = []
        for part in obj["coordinates"]:
            if path_crosses(part):
                out.extend(split_path(part))
            else:
                out.append(part)
        return {"type": "MultiLineString", "coordinates": out, "crs": obj.get("crs")}
    if t == "MultiPolygon":
        # the reference wraps each member in a fresh Polygon (re-running ring
        # closure + winding) before cutting, then flattens split results
        out = []
        for poly_coords in obj["coordinates"]:
            cut = cut_dateline(make_polygon(poly_coords, None))
            if cut["type"] == "Polygon":
                out.append(cut["coordinates"])
            else:
                out.extend(cut["coordinates"])
        return make_multipolygon(out, obj.get("crs"))
    if t == "GeometryCollection":
        return {
            "type": "GeometryCollection",
            "geometries": [cut_dateline(g) for g in obj["geometries"]],
            "crs": obj.get("crs"),
        }
    if t == "Feature":
        out = dict(obj)
        out["geometry"] = cut_dateline(obj["geometry"])
        return out
    if t == "FeatureCollection":
        out = dict(obj)
        out["features"] = [cut_dateline(f) for f in obj["features"]]
        return out
    return obj
