"""Table catalog shim: Iceberg in production, partitioned parquet here.

The production deployment reads the pages corpus as an Iceberg table::

    CREATE TABLE crawl.pages (
        url      string,
        warc_ts  timestamp,
        html     binary,
        text     string,
        lang     string
    ) USING iceberg
    PARTITIONED BY (days(warc_ts), truncate(lang, 2))

and benefits from hidden partitioning (days/lang pruning pushes into the
scan), snapshot isolation for the resumable jobs, and metadata-level file
skipping on ``warc_ts`` min/max. No Iceberg runtime jar ships in this
sandbox, so ``read_pages`` transparently falls back to parquet with the same
schema; the query code is identical either way because both are plain
``spark.read`` DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGES_ICEBERG_DDL = """
CREATE TABLE IF NOT EXISTS {catalog}.crawl.pages (
    url      string,
    warc_ts  timestamp,
    html     binary,
    text     string,
    lang     string
) USING iceberg
PARTITIONED BY (days(warc_ts), truncate(lang, 2))
"""


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def read_pages(spark: SparkSession, location: str) -> DataFrame:
    """Read the pages table: Iceberg identifier (``cat.db.tbl``) when the
    runtime is present, else a parquet path with the identical schema."""
    if "/" not in location and iceberg_available(spark):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)
