"""Write-path operators: features -> GeoJSON strings / FeatureCollections,
plus DataFrame-level merge and burst (SURVEY §2.1 sinks, §2.4 composition).

All serializer options (antimeridian_cutting, write_bbox, write_crs,
precision — reference defaults) pass through to the kernel, which replicates
the reference write path exactly (bbox at root only, FC bbox quirk, crs
dedup, half-even precision rounding).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo import codec
from ..geo.algebra import burst as kernel_burst
from ..geo.algebra import make_feature, make_feature_collection, merge as kernel_merge
from ._util import spread_small_scans as _spread


def _feature_from_row(geometry_json, props_json, feature_id, crs_json):
    geom = json.loads(geometry_json)
    props = json.loads(props_json) if props_json else {}
    fid = feature_id
    if fid is not None:
        try:
            fid = int(fid)
        except (TypeError, ValueError):
            pass
    crs = json.loads(crs_json) if crs_json else None
    geom["crs"] = crs
    return make_feature(geom, props, fid, crs)


def serialize_features(features: DataFrame, **opts) -> DataFrame:
    """Add a ``geojson`` column: the canonical Feature JSON string per row
    (reference write-path semantics, options as keyword args)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def ser(geometry_json, props_json, feature_id, crs):
        out = []
        for gj, pj, fid, cj in zip(geometry_json, props_json, feature_id, crs):
            if gj is None:
                out.append(None)
                continue
            feat = _feature_from_row(gj, pj, fid, cj)
            out.append(codec.dumps(feat, **opts))
        return pd.Series(out)

    return features.withColumn(
        "geojson",
        ser(F.col("geometry_json"), F.col("props_json"), F.col("feature_id"),
            F.col("crs")),
    )


def assemble_feature_collections(features: DataFrame, key: str = "url",
                                 **opts) -> DataFrame:
    """Re-assemble exploded features into one FeatureCollection JSON per key
    (the groupBy(collect_list) realization of the reference's FC tree)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def assemble(geoms, props, fids, crss):
        out = []
        for gl, pl, fl, cl in zip(geoms, props, fids, crss):
            feats = [
                _feature_from_row(g, p, f, c)
                for g, p, f, c in zip(gl, pl, fl, cl)
                if g is not None
            ]
            out.append(codec.dumps(make_feature_collection(feats), **opts))
        return pd.Series(out)

    grouped = features.groupBy(key).agg(
        F.collect_list("geometry_json").alias("geoms"),
        F.collect_list(F.coalesce("props_json", F.lit("{}"))).alias("props"),
        F.collect_list(F.coalesce("feature_id", F.lit(""))).alias("fids"),
        F.collect_list(F.coalesce("crs", F.lit(""))).alias("crss"),
    )
    return grouped.select(
        key,
        assemble(F.col("geoms"), F.col("props"), F.col("fids"),
                 F.col("crss")).alias("feature_collection_json"),
    )


def merge_geometries(features: DataFrame, key: str = "url") -> DataFrame:
    """Kernel ``merge`` per group: most specific single container
    (Points -> MultiPoint, mixed -> GeometryCollection, ... reference
    transformations.py:6-62 matrix)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def do_merge(geoms):
        out = []
        for gl in geoms:
            items = []
            for g in gl:
                if g is None:
                    continue
                d = json.loads(g)
                d.setdefault("crs", None)
                items.append(d)
            if not items:
                out.append(None)
                continue
            try:
                out.append(
                    codec.dumps(kernel_merge(items), antimeridian_cutting=False,
                                write_bbox=False)
                )
            except (TypeError, ValueError) as e:
                out.append(json.dumps({"merge_error": str(e)}))
        return pd.Series(out)

    return (
        features.groupBy(key)
        .agg(F.collect_list("geometry_json").alias("geoms"))
        .select(key, do_merge(F.col("geoms")).alias("merged_json"))
    )


def burst_features(features: DataFrame) -> DataFrame:
    """Kernel ``burst`` as a UDF + explode: composite rows become one row per
    atomic part, crs propagation per the reference's asymmetric rules."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def do_burst(geoms, crss):
        out = []
        for g, c in zip(geoms, crss):
            if g is None:
                out.append([])
                continue
            d = json.loads(g)
            d["crs"] = json.loads(c) if c else None
            parts = [
                codec.dumps(p, antimeridian_cutting=False, write_bbox=False,
                            write_crs=True)
                for p in kernel_burst(d)
            ]
            out.append(parts)
        return pd.Series(out)

    # tiny scan inputs would run the burst kernel single-task (see
    # spread_small_scans — a no-op at production scan sizes)
    return (
        _spread(features).withColumn(
            "part_json", F.explode(do_burst(F.col("geometry_json"), F.col("crs")))
        )
        .withColumn("part_type", F.get_json_object("part_json", "$.type"))
    )
