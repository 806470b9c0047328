"""Persistent IVF index: build once, query many, read storage-pruned.

At 100 TB an ANN corpus is indexed ONCE (offline quantizer training + one
assignment pass over the corpus) and then queried millions of times.
``ann_ivf_topk`` re-assigns the whole corpus on every call — right for
ad-hoc use, wasteful as a serving path. ``build_ivf_index`` persists:

    {path}/centroids/   (list_id int, centroid array<double>)  nlist rows
    {path}/lists/       (neighbor_id long, v array<float>)
                        PARTITIONED BY (list_id)

so a query batch reads ONLY its probed list directories: the probed set is
collected to the driver — bounded by ``nlist``, which is small by
construction, NOT by the query count — and pushed as an ``isin()``
partition filter that Spark prunes at file-listing time, before any task
launches (``PartitionFilters`` in the scan, asserted in tests).

Results are IDENTICAL to ``ann_ivf_topk(centroids=<same quantizer>)``:
the assignment UDF, the exact scoring fold, and the tie-breaks are the
same shared code (equality-tested end to end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import (
    _exact_cos_for_pairs,
    cosine_topk_tail,
    ivf_assign,
    ivf_centroids,
    ivf_kmeans_centroids,
)


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    nlist: int = 16,
    quantizer: str = "kmeans",
    iters: int = 5,
    sample: int = 50000,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train the coarse quantizer, assign every corpus vector to its
    nearest list, and write the two index tables. Returns the centroid
    matrix (also persisted). One corpus pass; the per-list parquet layout
    doubles as the clustered storage ANN literature calls the 'inverted
    file' — vectors of a list are colocated in its directory."""
    spark = corpus.sparkSession
    if quantizer == "kmeans":
        cmat = ivf_kmeans_centroids(corpus, nlist, iters, sample,
                                    corpus_id, vec_col)
    else:
        _, cmat = ivf_centroids(corpus, nlist, corpus_id, vec_col)
    bc = spark.sparkContext.broadcast(cmat)
    assigned = ivf_assign(
        corpus.select(F.col(corpus_id).alias("neighbor_id"),
                      F.col(vec_col).alias("v")),
        bc, "neighbor_id", 1,
    )
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(
        path + "/lists"
    )
    cent_rows = [(int(i), [float(x) for x in row])
                 for i, row in enumerate(cmat)]
    cents = spark.createDataFrame(
        cent_rows, "list_id int, centroid array<double>"
    )
    cents.coalesce(1).write.mode("overwrite").parquet(path + "/centroids")
    return cmat


def ann_ivf_query(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    query_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVF index: assign each query to its ``nprobe``
    nearest lists, scan ONLY those list partitions, score exactly, return
    the canonical ranked top-k."""
    import numpy as np

    cents = spark.read.parquet(path + "/centroids").orderBy("list_id").collect()
    cmat = (np.asarray([r["centroid"] for r in cents], dtype=np.float64)
            if cents else np.zeros((0, 0)))
    bc = spark.sparkContext.broadcast(cmat)

    q = ivf_assign(
        queries.select(F.col(query_id).alias("query_id"),
                       F.col(vec_col).alias("v")),
        bc, "query_id", nprobe,
    ).select("query_id", "list_id", F.col("v").alias("qv"))
    # consumed twice (probed-set extraction + the scoring join) — and the
    # probed set itself has at most nlist members no matter how many
    # queries there are, so this driver action is bounded by design
    q = q.localCheckpoint(eager=True)
    probed = sorted(
        r["list_id"] for r in q.select("list_id").distinct().collect()
    )

    lists = (
        spark.read.parquet(path + "/lists")
        .filter(F.col("list_id").isin(probed))
        .select("neighbor_id", "list_id", F.col("v").alias("cv"))
    )
    scored = _exact_cos_for_pairs(
        q.join(lists, on="list_id"), "query_id", "neighbor_id", "qv", "cv"
    )
    return cosine_topk_tail(scored, k)
