"""Tree-query surface over GeoJSON dicts.

Matches the reference ``GeoJSON`` wrapper (``/root/reference/picogeojson/geojson.py``):

- ``extract`` runs an explicit-stack LIFO DFS that descends
  *GeometryCollections only* (never Features / FeatureCollections) and yields
  geometries of the requested type in the same pop order;
- ``extract_features`` runs the same DFS over FeatureCollections with
  geometry-type and property-subset predicates;
- ``propmatch`` is the dict-subset predicate (all required keys present and
  equal);
- ``map_features`` implements the *intended* semantics: the reference's
  ``geometry_type`` arm compares a class to a string and can never match
  (``geojson.py:35``, untested there) — here the type-name comparison is done
  correctly, which agrees with the reference on every case its tests cover.
"""

from __future__ import annotations

from .algebra import after


def extract(obj, geom_type):
    """Yield geometries of ``geom_type`` (a type-name string), DFS/LIFO."""
    stack = [obj]
    while stack:
        node = stack.pop()
        if node["type"] == geom_type:
            yield node
        elif node["type"] == "GeometryCollection":
            for member in node["geometries"]:
                stack.append(member)


def propmatch(testing: dict, required: dict) -> bool:
    return all(k in testing for k in required) and all(
        testing[k] == v for k, v in required.items()
    )


def extract_features(obj, geometry_type=None, properties=None):
    """Yield Features matching the predicates, DFS/LIFO over collections."""
    stack = [obj]
    while stack:
        node = stack.pop()
        if node["type"] == "Feature":
            ok = geometry_type is None or node["geometry"]["type"] == geometry_type
            if ok and (properties is None or propmatch(node["properties"], properties)):
                yield node
        elif node["type"] == "FeatureCollection":
            for feat in node["features"]:
                stack.append(feat)


def map_type(obj, fn, geom_type):
    """Apply ``fn`` to every node whose type name is ``geom_type``."""
    return after(obj, fn, lambda o: o["type"] == geom_type)


def map_features(obj, fn, geometry_type=None, properties=None):
    """Apply ``fn`` to Features matching the predicates (intended semantics)."""

    def cond(o):
        if o["type"] != "Feature":
            return False
        if geometry_type is not None and o["geometry"]["type"] != geometry_type:
            return False
        if properties is not None and not propmatch(o["properties"], properties):
            return False
        return True

    return after(obj, fn, cond)
