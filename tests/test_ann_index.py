"""Persistent IVF index: build/query equality with the ad-hoc path, and
the storage-pruning scale shape."""

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.ann_index import ann_ivf_query, build_ivf_index
from picogeojson_spark.operators.similarity import (
    ann_ivf_topk,
    ivf_kmeans_centroids,
)

EMB = [
    (
        i,
        [float((i * 7 + j * 3) % 11 - 5) / 5.0 + (i / 64.0 if j == 0 else 0.0)
         for j in range(8)],
    )
    for i in range(1, 41)
]


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.createDataFrame(EMB, "vec_id long, embedding array<float>")


def test_index_query_equals_adhoc_path(spark, embeddings, tmp_path):
    """Query-through-index == ann_ivf_topk with the same quantizer: same
    assignments, same exact scores, same tie-breaks, row for row."""
    path = str(tmp_path / "ivf")
    cmat = build_ivf_index(embeddings, path, nlist=8, quantizer="kmeans",
                           sample=1000)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_x1e6)
        for r in ann_ivf_query(spark, path, embeddings, k=3,
                               nprobe=3).collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_x1e6)
        for r in ann_ivf_topk(embeddings, embeddings, k=3, nprobe=3,
                              centroids=cmat).collect()
    }
    assert got == want
    assert len(got) == 40 * 3


def test_index_query_scan_is_partition_pruned(spark, embeddings, tmp_path):
    """The lists scan must carry a list_id partition filter — only the
    probed directories are read, pruned at file-listing time."""
    path = str(tmp_path / "ivf")
    build_ivf_index(embeddings, path, nlist=8, quantizer="md5", sample=1000)
    one_query = embeddings.filter(F.col("vec_id") == 1)
    out = ann_ivf_query(spark, path, one_query, k=3, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    # nprobe=2 for one query probes exactly 2 of the 8 list directories
    assert out.count() == 3


def test_index_layout_on_disk(spark, embeddings, tmp_path):
    """Centroids table is tiny and complete; lists are hive-partitioned by
    list_id so each inverted list is a colocated directory."""
    import os

    path = str(tmp_path / "ivf")
    cmat = build_ivf_index(embeddings, path, nlist=8, quantizer="kmeans",
                           sample=1000)
    cents = spark.read.parquet(path + "/centroids")
    assert cents.count() == len(cmat) == 8
    dirs = [d for d in os.listdir(path + "/lists")
            if d.startswith("list_id=")]
    assert len(dirs) >= 1
    # every corpus vector is in exactly one list
    total = spark.read.parquet(path + "/lists").count()
    assert total == 40
