"""Drop-in API compatibility with the reference's public surface.

A picogeojson user switching to this engine can keep their call sites::

    from picogeojson_spark.geo import compat as picogeojson
    result = picogeojson.fromstring(s)
    for pt in result.points: ...
    out = picogeojson.tostring(result.raw, precision=6)

Names and keyword arguments mirror the reference exactly
(``picogeojson/deserializer.py:137-155``, ``serializer.py:130-155``,
``geojson.py:8-100``, ``transformations.py:6-95``); geometry "objects" are
the engine's normalized dicts instead of attrs instances (access fields by
key rather than attribute — the one intentional difference, since the
engine's kernel is dict-based for Arrow friendliness).
"""

from __future__ import annotations

import io
import os

from . import codec
from .algebra import burst, merge  # noqa: F401  (same names as reference)
from .codec import SerializeOptions
from .query import extract, extract_features, map_features, map_type, propmatch  # noqa: F401


class GeoJSON:
    """Query wrapper mirroring ``picogeojson.geojson.GeoJSON``."""

    def __init__(self, raw):
        self.raw = raw

    def extract(self, geometry_type):
        return extract(self.raw, geometry_type)

    def extract_features(self, geometry_type=None, properties=None):
        return extract_features(self.raw, geometry_type, properties)

    def map(self, func, geometry_type):
        return GeoJSON(map_type(self.raw, func, geometry_type))

    def map_features(self, func, geometry_type=None, properties=None):
        return GeoJSON(map_features(self.raw, func, geometry_type, properties))

    # typed extract shortcuts (reference geojson.py:68-96)
    @property
    def points(self):
        return self.extract("Point")

    @property
    def multipoints(self):
        return self.extract("MultiPoint")

    @property
    def linestrings(self):
        return self.extract("LineString")

    @property
    def multilinestrings(self):
        return self.extract("MultiLineString")

    @property
    def polygons(self):
        return self.extract("Polygon")

    @property
    def multipolygons(self):
        return self.extract("MultiPolygon")


def fromstring(s: str, **kw) -> GeoJSON:
    return GeoJSON(codec.loads(s, **kw))


def fromdict(d, **kw) -> GeoJSON:
    return GeoJSON(codec.parse_object(d, **kw))


def fromfile(f, **kw) -> GeoJSON:
    if isinstance(f, (str, os.PathLike)):
        with open(f) as fh:
            return fromstring(fh.read(), **kw)
    if isinstance(f, io.IOBase) or hasattr(f, "read"):
        return fromstring(f.read(), **kw)
    raise TypeError("expected a path or file object, got {!r}".format(f))


def todict(geom, antimeridian_cutting=True, write_bbox=True, write_crs=False,
           precision=None):
    return codec.to_dict(
        geom,
        SerializeOptions(antimeridian_cutting=antimeridian_cutting,
                         write_bbox=write_bbox, write_crs=write_crs,
                         precision=precision),
    )


def tostring(geom, **kw) -> str:
    return codec.dumps(geom, **kw)


def tofile(geom, f, **kw) -> None:
    if isinstance(f, (str, os.PathLike)):
        with open(f, "w") as fh:
            fh.write(tostring(geom, **kw))
        return
    f.write(tostring(geom, **kw))
