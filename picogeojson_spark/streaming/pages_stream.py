"""Structured Streaming surface: incremental GeoJSON mining.

The reference has no streaming (SURVEY §2.9); this is the engine-level
incremental path for a continuously-crawled pages table: a file-source
stream of pages parquet → the same fused mining UDF → watermarked windowed
rollups. The batch and streaming paths share ``mine_features`` verbatim, so
semantics cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.features import mine_features
from ..sources.synth import PAGES_SCHEMA_DDL


def stream_mine_features(spark, pages_dir: str,
                         max_files_per_trigger: int = 4) -> DataFrame:
    """readStream over a pages parquet directory -> streaming features."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )
    return mine_features(pages)


def stream_feature_counts(features: DataFrame, ts_col_source: DataFrame = None):
    """Per-geometry-type rolling counts (stateful streaming aggregation)."""
    return features.groupBy("geom_type").count()


def run_stream_to_memory(spark, pages_dir: str, query_name: str = "feat_counts"):
    """Drive the stream into an in-memory sink (tests / demos); returns the
    StreamingQuery — caller awaits and inspects ``spark.sql(query_name)``."""
    feats = stream_mine_features(spark, pages_dir)
    counts = stream_feature_counts(feats)
    return (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def stream_windowed_counts(spark, pages_dir: str,
                           window: str = "1 hour",
                           watermark: str = "2 hours"):
    """Watermarked event-time rollup: mined feature counts per
    (warc_ts window, geom_type). Late pages beyond the watermark are
    dropped, bounding state for an unbounded crawl."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )
    # keep warc_ts through the mining UDF by joining it back on url
    feats = mine_features(pages.select("url", "text"))
    with_ts = feats.join(pages.select("url", "warc_ts"), on="url")
    return (
        with_ts.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), F.col("geom_type"))
        .count()
    )
