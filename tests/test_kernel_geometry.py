"""Kernel conformance: winding, dateline, bbox, merge/burst goldens from the
reference suite (/root/reference/tests/tests.py:385-714)."""

import pytest

from picogeojson_spark.geo import (
    burst,
    cut_dateline,
    geometry_bbox,
    loads,
    make_feature,
    make_feature_collection,
    make_geometry_collection,
    make_linestring,
    make_multilinestring,
    make_multipoint,
    make_multipolygon,
    make_point,
    make_polygon,
    merge,
    ring_is_ccw,
)
from picogeojson_spark.geo.dateline import ring_contains_any_vertex


def test_isccw():
    assert ring_is_ccw([(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)])
    assert not ring_is_ccw([(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)])


def test_contains():
    assert not ring_contains_any_vertex(
        [(0, 0), (0, 1), (1, 1), (1, 0), (0, 0)],
        [(2, 0), (2, 1), (3, 1), (3, 0), (2, 0)],
    )
    assert ring_contains_any_vertex(
        [(0, 0), (0, 2), (2, 2), (2, 0), (0, 0)],
        [(1, 1), (1, 3), (3, 3), (3, 1), (1, 1)],
    )


def test_linestring_split():
    res = cut_dateline(make_linestring([(172, 34), (178, 36), (-179, 37), (-177, 39)]))
    assert res["type"] == "MultiLineString"
    assert len(res["coordinates"]) == 2
    assert res["coordinates"][0][-1] == [180, 36.33333333]
    assert res["coordinates"][1][0] == [-179.99999999, 36.33333333]


def test_polygon_split():
    res = cut_dateline(
        make_polygon([[(172, -20), (-179, -20), (-177, -25), (172, -25), (172, -20)]])
    )
    assert res["type"] == "MultiPolygon"
    assert len(res["coordinates"]) == 2


def test_polygon_split_holes():
    res = cut_dateline(
        make_polygon(
            [
                [(172, -20), (-179, -20), (-177, -25), (172, -25), (172, -20)],
                [(174, -22), (-179, -22), (-179, -23), (174, -22)],
            ]
        )
    )
    assert res["type"] == "MultiPolygon"
    assert len(res["coordinates"]) == 2
    assert len(res["coordinates"][0]) == 2
    assert len(res["coordinates"][1]) == 2


def test_multilinestring_split():
    res = cut_dateline(
        make_multilinestring(
            [
                [(172, 34), (178, 36), (-179, 37), (-177, 39)],
                [(172, -34), (178, -36), (-179, -37), (-177, -39)],
            ]
        )
    )
    assert len(res["coordinates"]) == 4


def test_featurecollection_split():
    fc = make_feature_collection(
        [
            make_feature(
                make_linestring([(172, 34), (178, 36), (-179, 37), (-177, 39)]),
                {"desc": "dateline linestring"},
            ),
            make_feature(make_point((1, 2)), {"desc": "point"}),
            make_feature(
                make_geometry_collection(
                    [
                        make_polygon([[(178, 3), (-178, 5), (-178, 7), (178, 5), (178, 3)]]),
                        make_linestring([(172, -34), (178, -36), (-179, -37), (-177, -39)]),
                    ]
                ),
                {"desc": "geometry collection"},
            ),
        ]
    )
    res = cut_dateline(fc)
    assert res["type"] == "FeatureCollection"
    assert len(res["features"]) == 3
    assert res["features"][0]["geometry"]["type"] == "MultiLineString"
    assert res["features"][2]["geometry"]["type"] == "GeometryCollection"
    assert res["features"][2]["geometry"]["geometries"][0]["type"] == "MultiPolygon"


def test_coordstring_bbox_2d_3d():
    from picogeojson_spark.geo import coords_bbox

    cs = [[i, j] for i in range(0, 30, 3) for j in range(10, -10, -2)]
    assert coords_bbox(cs) == [0, -8, 27, 10]
    cs3 = [[i, j, k] for i in range(0, 30, 3) for j in range(10, -10, -2) for k in range(1, 5)]
    assert coords_bbox(cs3) == [0, -8, 1, 27, 10, 4]


def test_polygon_bbox_exterior_only():
    p = make_polygon(
        [
            [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
            [(2, 2), (3, 2), (3, 3), (2, 3), (2, 2)],
        ]
    )
    assert geometry_bbox(p) == [0, 0, 10, 10]


def test_geometrycollection_bbox():
    gc = make_geometry_collection(
        [make_point((-1, -2)), make_linestring([(3, 4), (5, 6)])]
    )
    assert geometry_bbox(gc) == [-1, -2, 5, 6]


# ------------------------------------------------------------ merge matrix

def test_merge_points():
    res = merge([make_point((1, 2)), make_point((3, 4))])
    assert res["type"] == "MultiPoint"
    assert res["coordinates"] == [(1, 2), (3, 4)]


def test_merge_empty_raises():
    with pytest.raises(ValueError):
        merge([])


def test_merge_singleton_identity():
    pt = make_point((1, 2))
    assert merge([pt]) is pt


def test_merge_crs_mismatch_raises():
    from picogeojson_spark.geo import DEFAULT_CRS

    with pytest.raises(ValueError):
        merge([make_point((1, 2), None), make_point((3, 4), DEFAULT_CRS)])


def test_merge_mixed_geometries():
    res = merge([make_point((1, 2)), make_linestring([(1, 2), (3, 4)])])
    assert res["type"] == "GeometryCollection"
    assert len(res["geometries"]) == 2


def test_merge_geometrycollections_not_flattened():
    gc1 = make_geometry_collection([make_point((1, 2))])
    gc2 = make_geometry_collection([make_point((3, 4))])
    res = merge([gc1, gc2])
    assert res["type"] == "GeometryCollection"
    assert [g["type"] for g in res["geometries"]] == [
        "GeometryCollection",
        "GeometryCollection",
    ]


def test_merge_features_and_fc():
    f = make_feature(make_point((1, 2)), {})
    fc = make_feature_collection(
        [make_feature(make_point((3, 4)), {}), make_feature(make_point((5, 6)), {})]
    )
    res = merge([f, fc])
    assert res["type"] == "FeatureCollection"
    assert len(res["features"]) == 3


def test_merge_geometry_with_feature_raises():
    with pytest.raises(TypeError):
        merge([make_point((1, 2)), make_feature(make_point((3, 4)), {})])


# ------------------------------------------------------------ burst matrix

def test_burst_multipoint():
    parts = list(burst(make_multipoint([(1, 2), (3, 4)], crs={"x": 1})))
    assert [p["type"] for p in parts] == ["Point", "Point"]
    assert all(p["crs"] == {"x": 1} for p in parts)


def test_burst_gc_overwrites_child_crs_even_none():
    child = make_point((1, 2), crs={"inner": True})
    gc = make_geometry_collection([child], crs=None)
    parts = list(burst(gc))
    assert parts[0]["crs"] is None


def test_burst_fc_keeps_child_crs_when_parent_none():
    f = make_feature(make_point((1, 2)), {}, crs={"inner": True})
    fc = make_feature_collection([f], crs=None)
    parts = list(burst(fc))
    assert parts[0]["crs"] == {"inner": True}

    fc2 = make_feature_collection([f], crs={"outer": True})
    assert list(burst(fc2))[0]["crs"] == {"outer": True}


def test_burst_multipolygon_reorients():
    mp = make_multipolygon(
        [
            [[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]],
            [[(5, 5), (6, 5), (6, 6), (5, 6), (5, 5)]],
        ]
    )
    parts = list(burst(mp))
    assert [p["type"] for p in parts] == ["Polygon", "Polygon"]


# ------------------------------------------------------------ constructors

def test_invalid_coordinates_raise():
    with pytest.raises(TypeError):
        make_point("not coordinates")
    with pytest.raises(TypeError):
        make_linestring([1, 2, 3])
    with pytest.raises(TypeError):
        make_polygon([[1, 2], [3, 4]])


def test_ring_autoclosure_on_construction():
    p = make_polygon([[(0, 0), (1, 0), (1, 1), (0, 1)]])
    assert p["coordinates"][0][0] == p["coordinates"][0][-1]


def test_gc_member_validation():
    with pytest.raises(TypeError):
        make_geometry_collection([make_feature(make_point((1, 2)), {})])


def test_feature_cannot_wrap_feature():
    f = make_feature(make_point((1, 2)), {})
    with pytest.raises(TypeError):
        make_feature(f, {})
