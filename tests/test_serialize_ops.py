"""Spark write-path operators vs the kernel oracle."""

import json

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.geo import loads as kloads
from picogeojson_spark.operators import mine_features
from picogeojson_spark.operators.serialize import (
    assemble_feature_collections,
    burst_features,
    merge_geometries,
    serialize_features,
)
from picogeojson_spark.sources.synth import pages_dataframe


@pytest.fixture(scope="module")
def features(spark):
    df = mine_features(pages_dataframe(spark, 120, partitions=4)).filter(
        "parse_error is null"
    ).cache()
    df.count()
    return df


def test_serialize_features_roundtrip(spark, features):
    rows = serialize_features(features).select("geometry_json", "geojson").collect()
    assert len(rows) > 50
    for r in rows:
        d = json.loads(r.geojson)
        assert d["type"] == "Feature"
        # round-trip through the kernel is stable
        again = kloads(r.geojson)
        assert again["geometry"]["type"] == json.loads(r.geometry_json)["type"]


def test_serialize_respects_options(spark, features):
    no_bbox = serialize_features(features, write_bbox=False).select("geojson").first()
    assert "bbox" not in json.loads(no_bbox.geojson)
    prec = serialize_features(features, precision=2).select("geojson").first()
    s = prec.geojson

    def max_decimals(obj):
        if isinstance(obj, float):
            txt = repr(obj)
            return len(txt.split(".")[1]) if "." in txt else 0
        if isinstance(obj, list):
            return max((max_decimals(x) for x in obj), default=0)
        return 0

    assert max_decimals(json.loads(s)["geometry"]["coordinates"]) <= 2


def test_assemble_feature_collections(spark, features):
    fcs = assemble_feature_collections(features, key="url").collect()
    per_url = {
        r.url: r.cnt
        for r in features.groupBy("url").agg(F.count("*").alias("cnt")).collect()
    }
    assert len(fcs) == len(per_url)
    for r in fcs:
        d = json.loads(r.feature_collection_json)
        assert d["type"] == "FeatureCollection"
        assert len(d["features"]) == per_url[r.url]


def test_merge_geometries_matrix(spark):
    rows = [
        ("a", json.dumps({"type": "Point", "coordinates": [1, 2]})),
        ("a", json.dumps({"type": "Point", "coordinates": [3, 4]})),
        ("b", json.dumps({"type": "Point", "coordinates": [1, 2]})),
        ("b", json.dumps({"type": "LineString", "coordinates": [[1, 2], [3, 4]]})),
        ("c", json.dumps({"type": "Point", "coordinates": [9, 9]})),
    ]
    df = spark.createDataFrame(rows, "url string, geometry_json string")
    got = {r.url: json.loads(r.merged_json) for r in merge_geometries(df).collect()}
    assert got["a"]["type"] == "MultiPoint"
    assert got["a"]["coordinates"] == [[1, 2], [3, 4]]
    assert got["b"]["type"] == "GeometryCollection"
    assert got["c"]["type"] == "Point"  # singleton passthrough


def test_burst_features_crs_rules(spark):
    crs = json.dumps({"name": "custom"}, sort_keys=True)
    rows = [
        ("a", json.dumps({"type": "MultiPoint", "coordinates": [[1, 2], [3, 4]]}), crs),
        ("b", json.dumps({"type": "Polygon",
                          "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]}), None),
    ]
    df = spark.createDataFrame(rows, "url string, geometry_json string, crs string")
    got = burst_features(df).select("url", "part_type", "part_json").collect()
    a_parts = [r for r in got if r.url == "a"]
    assert [r.part_type for r in a_parts] == ["Point", "Point"]
    # Multi* parts inherit the parent crs (transformations.py:78-90)
    assert all(json.loads(r.part_json)["crs"] == {"name": "custom"} for r in a_parts)
    b_parts = [r for r in got if r.url == "b"]
    assert [r.part_type for r in b_parts] == ["Polygon"]
