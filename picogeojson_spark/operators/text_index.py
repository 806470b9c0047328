"""Persisted inverted text index: build postings once, query with pruned
reads — the lexical mirror of ``ann_index.build_ivf_index``.

``bm25_topk`` recomputes tokenization over the whole corpus per query; at
100 TB the production shape is an index AT REST: a postings table
(word, doc_id, tf) hive-partitioned by a word hash bucket, plus the
document-length table and corpus scalars. A query's terms then map to at
most ``|terms|`` bucket directories, pruned at FILE-LISTING time (the
bucket filter is a partition filter, same mechanism as the IVF index's
probed-list pruning), and the scan inside a bucket is further cut by the
parquet word dictionary filter. Scoring reuses ``retrieval``'s shared
integer-exact BM25 arithmetic, so indexed results equal the ad-hoc
operator row for row (asserted in tests).

Bucketing uses the repo-standard md5 construction (``sampling.hash_bucket``)
— deterministic, engine-portable, and computable for any query term
without consulting the index.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sampling import hash_bucket


def build_text_index(docs: DataFrame, path: str, n_buckets: int = 64,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> None:
    """One corpus pass writes the three index tables under ``path``:

    - ``postings/`` — (word, doc_id, tf), hive-partitioned by
      ``bucket = md5-hash(word) % n_buckets``;
    - ``doclen/`` — (doc_id, dl);
    - ``scalars/`` — the 1-row (n_docs, sum_dl).

    Tokenization matches ``bm25_topk`` exactly (lower, trim, whitespace
    split, drop empties), so the index answers the same queries.
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("word"),
    ).filter(F.col("word") != "")
    words = words.persist()
    try:
        dl = words.groupBy("doc_id").agg(F.count("*").alias("dl"))
        dl = dl.persist()
        try:
            dl.write.mode("overwrite").parquet(path + "/doclen")
            dl.agg(
                F.count("*").alias("n_docs"),
                F.sum("dl").cast("long").alias("sum_dl"),
            ).write.mode("overwrite").parquet(path + "/scalars")
        finally:
            dl.unpersist()
        (
            words.groupBy("doc_id", "word")
            .agg(F.count("*").alias("tf"))
            .withColumn("bucket", hash_bucket("word", salt="tidx",
                                              buckets=n_buckets))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(path + "/postings")
        )
    finally:
        words.unpersist()


def bm25_query_indexed(spark: SparkSession, path: str,
                       terms: Sequence[str], k: int = 20,
                       n_buckets: int = 64, k1: float = 1.2,
                       b: float = 0.75) -> DataFrame:
    """Query a persisted index: same output contract as ``bm25_topk``
    (``rank, doc_id, n_hit, score_x1e6``), but the corpus-sized work is a
    partition-pruned postings read — at most ``|terms|`` of the
    ``n_buckets`` directories are listed, everything else never touches
    the scan."""
    from .retrieval import _bm25_rank_from_parts

    if not terms:
        raise ValueError("bm25_query_indexed needs at least one query term")
    term_list = sorted(set(t.lower() for t in terms))
    import hashlib

    buckets = sorted({
        int(hashlib.md5("tidx:{}".format(t).encode()).hexdigest()[:8], 16)
        % n_buckets
        for t in term_list
    })
    tf = (
        spark.read.parquet(path + "/postings")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("word").isin(term_list))
        .select("doc_id", "word", "tf")
    )
    dl = spark.read.parquet(path + "/doclen")
    # The persisted scalars table IS 1 row, but a raw scan carries no
    # static row bound (Catalyst maxRows = unknown), so attach_scalar's
    # structural guard — and the gate's plan invariant, which admits only
    # a keys=[] aggregate as a BNLJ build side — would reject it.
    # Re-aggregating the 1-row table is a no-op on values and restores
    # the provable Some(1) bound without collecting or breaking laziness.
    scalars = spark.read.parquet(path + "/scalars").groupBy().agg(
        F.max("n_docs").alias("n_docs"), F.max("sum_dl").alias("sum_dl"))
    return _bm25_rank_from_parts(tf, dl, scalars, k=k, k1=k1, b=b)
