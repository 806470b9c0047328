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


def stream_pip_join(spark, pages_dir: str, polygons: DataFrame,
                    max_files_per_trigger: int = 4) -> DataFrame:
    """Streaming spatial join: incoming pages are mined and their Point
    features joined against a STATIC polygon table — the continuous-crawl
    shape of the engine's headline spine.

    Works unchanged because ``pip_join`` is fully lazy (no count/persist/
    collect): the stream side flows through ancestors -> equi-join against
    the broadcast polygon cover -> vectorized refine, all supported in
    stream-static joins. Output is an append stream of (point_id, poly_id)
    pairs; equality with the batch ``pip_join`` over the same parquet is
    asserted in tests (the two paths share every operator).
    """
    from ..operators.pip_join import pip_join

    feats = stream_mine_features(spark, pages_dir, max_files_per_trigger)
    pts = feats.filter(F.col("geom_type") == "Point").select(
        (F.pmod(F.col("doc_id"), F.lit(2**40)) * 100
         + F.col("feature_idx")).alias("point_id"),
        "lon", "lat",
    )
    return pip_join(pts, polygons)


def stream_knn_foreach_batch(spark, pages_dir: str, candidates: DataFrame,
                             out_path: str, checkpoint: str, k: int = 3,
                             max_files_per_trigger: int = 4):
    """Streaming kNN via ``foreachBatch`` — the standard pattern for
    operators a stream can't express directly (kNN needs a global per-query
    window plus an eager candidate count, both batch-only): each micro-batch
    of mined Point features runs the BATCH ``knn_join`` against the static
    candidate table and appends to parquet.

    Exactness note: kNN is per-query independent, so batch-at-a-time
    execution returns exactly what one batch run over the union would —
    asserted in tests. Returns the started StreamingQuery.
    """
    from ..operators.features import mine_features
    from ..operators.knn import knn_join

    feats = mine_features(
        spark.readStream.schema(PAGES_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )
    pts = feats.filter(F.col("geom_type") == "Point").select(
        (F.pmod(F.col("doc_id"), F.lit(2**40)) * 100
         + F.col("feature_idx")).alias("query_id"),
        "lon", "lat",
    )

    def run_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        knn_join(batch_df, candidates, k=k, level=6).write.mode(
            "append"
        ).parquet(out_path)

    return (
        pts.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
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


def stream_sessionize_events(stream_src, gap: str = "30 minutes",
                             watermark: str = "0 seconds"):
    """Gap-based sessionization on a STREAM via Spark's native
    ``session_window`` aggregation — the structured-streaming twin of the
    batch lag+running-sum sessionizer (``q_events_sessionize``).

    ``stream_src`` is a streaming events DataFrame (event_id, ts NTZ,
    user_id, event_type, value, ...). The NTZ wall time is pinned to a UTC
    instant via pure-NTZ epoch micros (the repo's session-tz-proof
    pattern); state is keyed by (user_id, merging session window), so a
    billion users shard across executors like any keyed aggregate and the
    watermark bounds state size — expired sessions leave the store.

    Emits one row per CLOSED session (append mode downstream): sessions
    only flush once the watermark passes their end, so a bounded run needs
    a flush sentinel past the last real event (see q_stream_sessions) —
    exactly the production pattern for finite backfills.

    ``n_flush`` counts sentinel rows (event_type = '__flush__') inside the
    session so callers can drop sentinel-only sessions.
    """
    from pyspark.sql import functions as F

    def ntz_epoch_us(col):
        # pure-NTZ epoch micros (session-tz-proof; see __spark_entry__)
        return F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', {})".format(col))

    ts_i = F.timestamp_micros(ntz_epoch_us("ts"))
    return (
        stream_src.withColumn("ts_i", ts_i)
        .withWatermark("ts_i", watermark)
        .groupBy(F.col("user_id"), F.session_window("ts_i", gap).alias("sw"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .alias("cents_sum"),
            F.sum((F.col("event_type") == "__flush__").cast("long"))
            .alias("n_flush"),
            F.min(ntz_epoch_us("ts")).alias("start_us"),
            F.max(ntz_epoch_us("ts")).alias("last_us"),
        )
    )
