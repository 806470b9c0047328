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

# The mined-features table is spatially laid out: the coarse ancestor cell
# (plans/spatial_layout.py computes it as a bit-shift of the fine cell) is a
# stored partition column here, and an Iceberg identity/truncate transform in
# production — bbox queries prune at the manifest level before any file read,
# and sorting by the fine cell gives row-group-level pruning inside files.
FEATURES_ICEBERG_DDL = """
CREATE TABLE IF NOT EXISTS {catalog}.crawl.features (
    url          string,
    doc_id       bigint,
    feature_idx  int,
    geom_type    string,
    geometry_json string,
    props        map<string, string>,
    bbox         struct<xmin: double, ymin: double, xmax: double, ymax: double>,
    lon          double,
    lat          double,
    cell         bigint,
    cell_p       bigint
) USING iceberg
PARTITIONED BY (cell_p)
TBLPROPERTIES ('write.sort-order' = 'cell ASC')
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
