"""Differential conformance for the object algebra: transform / map /
flatmap / after / map_features against the reference implementations."""

import json

from picogeojson_spark.geo import (
    after,
    concat,
    loads,
    make_linestring,
    make_point,
    to_dict,
)
from picogeojson_spark.geo.algebra import (
    fc_flatmap,
    fc_map,
    feature_map_geometry,
    feature_map_properties,
    gc_flatmap,
    gc_map,
    transform,
)
from picogeojson_spark.geo.codec import SerializeOptions

_OPTS = SerializeOptions(antimeridian_cutting=False, write_bbox=False,
                         write_crs=True)


def _dump_eng(obj):
    return json.loads(json.dumps(to_dict(obj, _OPTS)))


def _dump_ref(oracle, obj):
    return json.loads(
        oracle.tostring(obj, antimeridian_cutting=False, write_bbox=False,
                        write_crs=True)
    )


def _shift(pos):
    return tuple(c + 1.0 for c in pos)


def test_transform_differential(oracle, fixture_docs):
    for name in ["point", "linestring", "polygon", "multipoint",
                 "multilinestring", "multipolygon", "geometrycollection"]:
        eng = transform(loads(fixture_docs[name]), _shift)
        ref = oracle.fromstring(fixture_docs[name]).raw.transform(_shift)
        assert _dump_eng(eng) == _dump_ref(oracle, ref), name


def test_transform_reruns_winding():
    # a transform that mirrors x flips orientation; constructors re-enforce
    p = loads('{"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,2],[0,0]]]}')
    mirrored = transform(p, lambda pos: [-pos[0], pos[1]])
    from picogeojson_spark.geo import ring_is_ccw

    assert ring_is_ccw(mirrored["coordinates"][0])


def test_after_differential(oracle, fixture_docs):
    def eng_fn(g):
        out = dict(g)
        out["crs"] = {"marked": True}
        return out

    def ref_fn(obj):
        obj.crs = {"marked": True}
        return obj

    def eng_cond(g):
        return g["type"] == "Point"

    def ref_cond(obj):
        return type(obj).__name__ == "Point"

    for name in ["geometrycollection", "featurecollection", "feature"]:
        eng = after(loads(fixture_docs[name]), eng_fn, eng_cond)
        ref = oracle.fromstring(fixture_docs[name]).raw.after(ref_fn, ref_cond)
        assert _dump_eng(eng) == _dump_ref(oracle, ref), name


def test_gc_map_flatmap_differential(oracle, fixture_docs):
    gc_eng = loads(fixture_docs["geometrycollection"])
    gc_ref = oracle.fromstring(fixture_docs["geometrycollection"]).raw

    eng = gc_map(gc_eng, lambda g: transform(g, _shift))
    ref = gc_ref.map(lambda g: g.transform(_shift))
    assert _dump_eng(eng) == _dump_ref(oracle, ref)

    def eng_flat(g):
        return {"type": "GeometryCollection",
                "geometries": [g, transform(g, _shift)], "crs": None}

    def ref_flat(g):
        return oracle.GeometryCollection([g, g.transform(_shift)])

    eng = gc_flatmap(gc_eng, eng_flat)
    ref = gc_ref.flatmap(ref_flat)
    assert _dump_eng(eng) == _dump_ref(oracle, ref)


def test_fc_map_drops_crs_differential(oracle, fixture_docs):
    fc_eng = loads(fixture_docs["featurecollection"])
    fc_ref = oracle.fromstring(fixture_docs["featurecollection"]).raw

    eng = fc_map(fc_eng, lambda f: feature_map_properties(f, lambda p: {"n": 1}))
    ref = fc_ref.map(lambda f: f.map_properties(lambda p: {"n": 1}))
    # the reference's FeatureCollection.map drops crs (types.py:180)
    assert eng["crs"] is None
    assert _dump_eng(eng) == _dump_ref(oracle, ref)


def test_feature_map_geometry_differential(oracle, fixture_docs):
    f_eng = loads(fixture_docs["feature"])
    f_ref = oracle.fromstring(fixture_docs["feature"]).raw
    eng = feature_map_geometry(f_eng, lambda g: transform(g, _shift))
    ref = f_ref.map_geometry(lambda g: g.transform(_shift))
    assert _dump_eng(eng) == _dump_ref(oracle, ref)


def test_concat_differential(oracle):
    a_eng = loads('{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[1,2]}]}')
    b_eng = loads('{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[3,4]}]}')
    eng = concat(a_eng, b_eng)
    a_ref = oracle.fromstring('{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[1,2]}]}').raw
    b_ref = oracle.fromstring('{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[3,4]}]}').raw
    ref = a_ref + b_ref
    assert _dump_eng(eng) == _dump_ref(oracle, ref)


def test_extract_features_filters_differential(oracle, fixture_docs):
    from picogeojson_spark.geo import extract_features

    fc = fixture_docs["featurecollection"]
    eng = [f["properties"] for f in extract_features(loads(fc), geometry_type="Point")]
    ref = [
        f.properties
        for f in oracle.fromstring(fc).extract_features(geometry_type=oracle.Point)
    ]
    assert eng == ref

    eng = [
        f["properties"]
        for f in extract_features(loads(fc), properties={"prop0": "value0"})
    ]
    ref = [
        f.properties
        for f in oracle.fromstring(fc).extract_features(properties={"prop0": "value0"})
    ]
    assert eng == ref
    assert len(eng) > 0
