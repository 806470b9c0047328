"""spark-submit entry: mine features from a pages table, resumably.

Usage:
    spark-submit --py-files picogeojson_spark.zip \
        picogeojson_spark/jobs/mine_job.py \
        --pages <parquet dir | synth:N> --out /data/features \
        [--buckets 64] [--waves 8] [--level 12]

Re-running after a failure resumes from the last completed bucket wave
(see plans.checkpoint.ResumableJob).

NB: engine imports happen *after* SparkSession creation — spark-submit adds
--py-files to sys.path only once the context starts.
"""

from __future__ import annotations

import argparse
import json


def _bootstrap_session(app_name):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True,
                    help="pages parquet dir, or synth:N for N generated rows")
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--waves", type=int, default=8)
    ap.add_argument("--level", type=int, default=12)
    args = ap.parse_args(argv)

    spark = _bootstrap_session("mine_job")

    from picogeojson_spark.operators.features import mine_features
    from picogeojson_spark.plans.checkpoint import ResumableJob
    from picogeojson_spark.sources.synth import pages_dataframe

    if args.pages.startswith("synth:"):
        pages = pages_dataframe(spark, int(args.pages.split(":", 1)[1]))
    else:
        pages = spark.read.parquet(args.pages)

    feats = mine_features(pages, level=args.level)
    job = ResumableJob(spark, args.out, buckets=args.buckets, waves=args.waves)
    summary = job.run(feats, key_col="url")
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
