"""GeoJSON parse/serialize kernel over plain dicts.

Parse semantics match ``/root/reference/picogeojson/deserializer.py``:

- every object level (including members nested in GeometryCollections,
  Feature geometries, and FeatureCollection features) gets the default CRS
  injected when its dict lacks a ``crs`` member
  (``deserializer.py:61`` et seq.; default at ``crs.py:2-3``);
- Polygon / MultiPolygon rings are auto-closed and winding-enforced;
- FeatureCollection members are parsed *as Features* directly (a non-Feature
  member fails on the missing ``geometry`` key, like the reference);
- an unrecognized ``type`` raises ``TypeError("Unrecognized type ...")``.

Serialize semantics match ``/root/reference/picogeojson/serializer.py``:

- defaults ``antimeridian_cutting=True, write_bbox=True, write_crs=False,
  precision=None`` (``serializer.py:41``);
- dateline cutting applies on the bare-geometry path only (Point/MultiPoint
  are never cut) and may promote the type;
- bbox/crs are written at the root only — except FeatureCollection, whose
  bbox write lacks the root guard (``serializer.py:121``), and except that
  the Feature / GeometryCollection dispatch hardcodes ``root=True``
  (``serializer.py:57-62``) — all three quirks replicated;
- Feature/collection bboxes are computed on the *uncut* tree and are not
  precision-rounded; bare-geometry bboxes are computed on the *cut* geometry
  and are rounded (``serializer.py:77-80,95-97``);
- ``precision`` uses Python ``round`` (banker's rounding) recursively
  (``serializer.py:157-163``).

The JSON string form uses stdlib ``json``; the reference's tests assert
structural (``json.loads``) equality, so the backend is not observable.
"""

from __future__ import annotations

import json

from .algebra import (
    make_feature,
    make_feature_collection,
    make_geometry_collection,
    make_linestring,
    make_multilinestring,
    make_multipoint,
    make_multipolygon,
    make_point,
    make_polygon,
)
from .bounds import (
    feature_bbox,
    feature_collection_bbox,
    geometry_bbox,
    geometry_collection_bbox,
)
from .dateline import cut_dateline

DEFAULT_CRS = {
    "type": "name",
    "properties": {"name": "urn:ogc:def:crs:OGC:1.3:CRS84"},
}

_CUTTABLE = frozenset(
    {
        "LineString",
        "Polygon",
        "MultiLineString",
        "MultiPolygon",
        "GeometryCollection",
        "Feature",
        "FeatureCollection",
    }
)


# -------------------------------------------------------------------- parse

def parse_object(d, defaultcrs=None, _listify=True):
    """dict (as loaded from JSON) -> normalized geometry/feature dict.

    ``_listify=False`` is the ``loads`` fast path: ``json.loads`` output is
    fresh nested lists already, so the reference's ``as_nested_lists``
    converter is an identity copy there (positions keep their type either
    way — observationally equivalent, measurably faster).
    """
    if defaultcrs is None:
        defaultcrs = DEFAULT_CRS
    t = d["type"]
    crs = d.get("crs", defaultcrs)
    if t == "Point":
        return make_point(d["coordinates"], crs)
    if t == "MultiPoint":
        return make_multipoint(d["coordinates"], crs, _listify=_listify)
    if t == "LineString":
        return make_linestring(d["coordinates"], crs, _listify=_listify)
    if t == "MultiLineString":
        return make_multilinestring(d["coordinates"], crs, _listify=_listify)
    if t == "Polygon":
        return make_polygon(d["coordinates"], crs, _listify=_listify)
    if t == "MultiPolygon":
        return make_multipolygon(d["coordinates"], crs, _listify=_listify)
    if t == "GeometryCollection":
        members = [parse_object(g, defaultcrs, _listify) for g in d["geometries"]]
        return make_geometry_collection(members, crs)
    if t == "Feature":
        return _parse_feature(d, defaultcrs, _listify)
    if t == "FeatureCollection":
        feats = [_parse_feature(f, defaultcrs, _listify) for f in d["features"]]
        return make_feature_collection(feats, crs)
    raise TypeError("Unrecognized type {0}".format(t))


def _parse_feature(d, defaultcrs, _listify=True):
    crs = d.get("crs", defaultcrs)
    geom = parse_object(d["geometry"], defaultcrs, _listify)
    return make_feature(geom, d["properties"], d.get("id", None), crs)


def loads(s, defaultcrs=None):
    """JSON string -> normalized GeoJSON dict."""
    return parse_object(json.loads(s), defaultcrs, _listify=False)


# ---------------------------------------------------------------- serialize

def round_coords(a, prec=6):
    """Recursive fixed-precision rounding with Python half-even ``round``."""
    if hasattr(a, "__iter__"):
        return [round_coords(el, prec=prec) for el in a]
    return round(a, prec)


class SerializeOptions:
    __slots__ = ("antimeridian_cutting", "write_bbox", "write_crs", "precision")

    def __init__(
        self,
        antimeridian_cutting: bool = True,
        write_bbox: bool = True,
        write_crs: bool = False,
        precision=None,
    ):
        self.antimeridian_cutting = antimeridian_cutting
        self.write_bbox = write_bbox
        self.write_crs = write_crs
        self.precision = precision

    def prep(self, coords):
        if self.precision is None:
            return coords
        return round_coords(coords, self.precision)


def to_dict(obj, opts=None, root=True):
    """Normalized GeoJSON dict -> output dict per the serializer contract."""
    if opts is None:
        opts = SerializeOptions()
    t = obj["type"]
    if t == "Feature":
        return _feature_dict(obj, opts, root=True)
    if t == "GeometryCollection":
        return _gc_dict(obj, opts, root=True)
    if t == "FeatureCollection":
        return _fc_dict(obj, opts, root=True)

    geom = obj
    if opts.antimeridian_cutting and t in _CUTTABLE:
        geom = cut_dateline(geom)

    d = {"type": geom["type"], "coordinates": opts.prep(geom["coordinates"])}
    if root and opts.write_bbox:
        bb = geometry_bbox(geom)
        if bb is not None:
            d["bbox"] = opts.prep(bb)
    if root and opts.write_crs and geom.get("crs") is not None:
        d["crs"] = geom["crs"]
    return d


def _feature_dict(feature, opts, root=True):
    d = {
        "type": "Feature",
        "geometry": to_dict(feature["geometry"], opts, root=False),
        "properties": feature["properties"],
    }
    if feature.get("id") is not None:
        d["id"] = feature["id"]
    if root and opts.write_bbox:
        bb = feature_bbox(feature)
        if bb is not None:
            d["bbox"] = bb
    if root and opts.write_crs and feature.get("crs") is not None:
        d["crs"] = feature["crs"]
    return d


def _gc_dict(coll, opts, root=True):
    d = {
        "type": "GeometryCollection",
        "geometries": [to_dict(g, opts, root=False) for g in coll["geometries"]],
    }
    if root and opts.write_bbox:
        bb = geometry_collection_bbox(coll)
        if bb is not None:
            d["bbox"] = bb
    if root and opts.write_crs and coll.get("crs") is not None:
        d["crs"] = coll["crs"]
    return d


def _fc_dict(coll, opts, root=True):
    d = {
        "type": "FeatureCollection",
        "features": [_feature_dict(f, opts, root=False) for f in coll["features"]],
    }
    # NB: no ``root and`` guard on the bbox write — reference quirk
    if opts.write_bbox:
        bb = feature_collection_bbox(coll)
        if bb is not None:
            d["bbox"] = bb
    if root and opts.write_crs and coll.get("crs") is not None:
        d["crs"] = coll["crs"]
    return d


def dumps(obj, **opts) -> str:
    """Normalized GeoJSON dict -> canonical JSON string."""
    return json.dumps(to_dict(obj, SerializeOptions(**opts)), separators=(",", ":"))
