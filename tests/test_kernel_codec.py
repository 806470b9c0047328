"""Kernel conformance: parse/serialize against golden values from the
reference test suite (/root/reference/tests/tests.py) plus structural
round-trips on every fixture document."""

import json

import pytest

from picogeojson_spark.geo import (
    DEFAULT_CRS,
    dumps,
    loads,
    make_feature,
    make_linestring,
    make_point,
    make_polygon,
    parse_object,
    to_dict,
)


def test_parse_point(fixture_docs):
    g = loads(fixture_docs["point"])
    assert g["type"] == "Point"
    assert g["coordinates"] == [100.0, 0.0]
    assert g["crs"] == DEFAULT_CRS


def test_parse_polygon_ring_closure():
    # unclosed ring is auto-closed on parse (deserializer.py:76-82)
    s = '{"type": "Polygon", "coordinates": [[[0,0],[1,0],[1,1],[0,1]]]}'
    g = loads(s)
    assert g["coordinates"][0][0] == g["coordinates"][0][-1]
    assert len(g["coordinates"][0]) == 5


def test_parse_winding_enforced():
    # CW exterior is reversed to CCW; CCW hole reversed to CW (types.py:30-36)
    s = json.dumps(
        {
            "type": "Polygon",
            "coordinates": [
                [[0, 0], [0, 2], [2, 2], [2, 0], [0, 0]],  # CW exterior
                [[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5], [0.5, 0.5]],  # CCW hole
            ],
        }
    )
    g = loads(s)
    ext, hole = g["coordinates"]
    assert ext == [[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]
    assert hole == [[0.5, 0.5], [0.5, 1.5], [1.5, 1.5], [1.5, 0.5], [0.5, 0.5]]


def test_parse_unknown_type_raises():
    with pytest.raises(TypeError):
        loads('{"type": "Blob", "coordinates": [1, 2]}')


def test_parse_feature_id_and_nested_properties(fixture_docs):
    fc = loads(fixture_docs["featurecollection"])
    assert fc["type"] == "FeatureCollection"
    assert fc["features"][0]["geometry"]["type"] == "Point"
    assert fc["features"][2]["properties"] == {
        "prop0": "value0",
        "prop1": {"this": "that"},
    }


def test_serialize_point_no_crs_by_default():
    pt = make_point((44.0, 17.0), DEFAULT_CRS)
    d = json.loads(dumps(pt))
    assert tuple(d["coordinates"]) == (44.0, 17.0)
    assert "crs" not in d
    d = json.loads(dumps(pt, write_crs=True))
    assert d["crs"] == DEFAULT_CRS


def test_serialize_polygon_antimeridian_promotes():
    poly = make_polygon([[(172, -20), (-179, -20), (-177, -25), (172, -25), (172, -20)]])
    d = json.loads(dumps(poly))
    assert d["type"] == "MultiPolygon"


def test_bbox_root_only_in_featurecollection(fixture_docs):
    fc = loads(fixture_docs["featurecollection"])
    d = to_dict(fc)
    assert "bbox" in d
    for feat in d["features"]:
        assert "bbox" not in feat
        assert "bbox" not in feat["geometry"]


def test_crs_dedup_counts():
    crs = dict(DEFAULT_CRS)
    feat = make_feature(make_point((1, 2), crs), {"type": "tree"}, id=1, crs=crs)
    s = dumps(feat, write_crs=True)
    assert s.count('"crs"') == 1

    fc = {
        "type": "FeatureCollection",
        "features": [
            make_feature(make_point((1, 2), crs), {"t": "a"}, id=1, crs=crs),
            make_feature(make_linestring([(1, 2), (2, 3)], crs), {"t": "b"}, id=2, crs=crs),
        ],
        "crs": crs,
    }
    assert dumps(fc, write_crs=True).count('"crs"') == 1


def test_precision_point_and_bbox():
    pt = make_point((44.1234567, 17.0987654))
    d = json.loads(dumps(pt, precision=3))
    assert tuple(d["coordinates"]) == (44.123, 17.099)

    ls = make_linestring([(-1.1111111, 2.2222222), (3.3333333, -7.7777777)])
    d = json.loads(dumps(ls, precision=3))
    assert d["bbox"] == [-1.111, -7.778, 3.333, 2.222]


def test_feature_id_written_only_when_present():
    f = make_feature(make_point((1, 2)), {"type": "city"}, id=1)
    assert json.loads(dumps(f))["id"] == 1
    f = make_feature(make_point((1, 2)), {"type": "city"})
    assert "id" not in json.loads(dumps(f))


def test_roundtrip_all_fixtures(fixture_docs):
    for name, text in fixture_docs.items():
        g = loads(text)
        s = dumps(g, write_crs=True)
        g2 = loads(s)
        s2 = dumps(g2, write_crs=True)
        assert json.loads(s) == json.loads(s2), name


def test_3d_bbox_ordering():
    # [xmin, ymin, zmin, xmax, ymax, zmax] per tests.py:471-476
    ls = make_linestring([(1, 2, 3), (4, 5, 6), (-1, -2, -3)])
    d = to_dict(ls)
    assert d["bbox"] == [-1, -2, -3, 4, 5, 6]


def test_parse_3d_point():
    g = parse_object({"type": "Point", "coordinates": [1.0, 2.0, 3.0]})
    assert to_dict(g)["bbox"] == [1.0, 2.0, 3.0, 1.0, 2.0, 3.0]
