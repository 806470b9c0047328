"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scans(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the plan gives fewer partitions
    than cores.

    Spark sizes scan partitions by bytes, so a small parquet input caps
    every downstream narrow stage — including CPU-heavy Arrow UDFs and
    hash/explode work — at 1-2 tasks. At production scale the scan has far
    more partitions than cores and this is a no-op (the probe reads the
    planned partition count; no job runs, no shuffle is added)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
