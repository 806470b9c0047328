"""spark-submit entry: point-in-polygon join of a features table against a
polygons table.

Usage:
    spark-submit --py-files picogeojson_spark.zip \
        -m picogeojson_spark.jobs.pip_join_job \
        --points <features parquet> --polygons <polygons parquet> \
        --out /data/pip_pairs [--salt 1] [--level 12]
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
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from ..operators.pip_join import pip_join
    from ..plans.checkpoint import ResumableJob
    from ..session import get_spark

    spark = get_spark(app_name="pip_join_job", master=args.master)
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
