"""spark-submit entry: point-in-polygon join of a features table against a
polygons table.

Usage:
    spark-submit --py-files picogeojson_spark.zip \
        picogeojson_spark/jobs/pip_join_job.py \
        --points <points parquet> --polygons <polygons parquet> \
        --out /data/pip_pairs [--salt 1] [--level 12]

NB: engine imports happen *after* SparkSession creation — spark-submit adds
--py-files to sys.path only once the context starts.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", required=True)
    ap.add_argument("--polygons", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--salt", type=int, default=1)
    ap.add_argument("--level", type=int, default=12)
    ap.add_argument("--no-broadcast", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("pip_join_job")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )

    from picogeojson_spark.operators.pip_join import pip_join
    from picogeojson_spark.plans.checkpoint import ResumableJob

    points = spark.read.parquet(args.points)
    polygons = spark.read.parquet(args.polygons)
    pairs = pip_join(
        points, polygons, level=args.level,
        broadcast_polys=not args.no_broadcast, salt=args.salt,
    )
    job = ResumableJob(spark, args.out)
    summary = job.run(pairs, key_col="point_id")
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
