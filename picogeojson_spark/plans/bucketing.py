"""Bucketed tables for repeated co-located joins (scale lever).

At 100 TB a features table that is repeatedly joined on ``cell`` should be
written bucketed so every subsequent join is exchange-free on that side:

    write_bucketed(df, "features_by_cell", "cell", buckets=512)

Both sides bucketed by the same key and count -> SortMergeJoin with zero
Exchange (verified in tests). This is the persistent complement to the
broadcast path: broadcast for small polygon sets, bucketing for
fact-to-fact joins (e.g. features x features dedup passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 512,
                   sort: bool = True) -> None:
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark, table: str) -> DataFrame:
    return spark.table(table)
