"""rrf_fuse + tf_topk: hand-computed fusion scores, one-arm-only docs,
tie-break, python replay over real arms."""

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.retrieval import bm25_topk, rrf_fuse, tf_topk

pytestmark = pytest.mark.usefixtures("spark")


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "rank long, doc_id long")


def test_hand_computed_fusion(spark):
    a = _ranking(spark, [(1, 10), (2, 20), (3, 30)])
    b = _ranking(spark, [(1, 20), (2, 40)])
    got = {r.doc_id: r for r in rrf_fuse(
        [("a", a), ("b", b)], k_rrf=60, top_k=10).collect()}
    # doc 20: 1e6//62 + 1e6//61 = 16129 + 16393 = 32522
    assert got[20].rrf_ppm == 1000000 // 62 + 1000000 // 61
    assert got[20].rank_fused == 1
    # doc 10: arm a only
    assert got[10].rrf_ppm == 1000000 // 61 and got[10].rank_b is None
    # doc 40: arm b only
    assert got[40].rrf_ppm == 1000000 // 62 and got[40].rank_a is None


def test_tie_breaks_by_doc_id(spark):
    a = _ranking(spark, [(1, 7), (2, 3)])
    b = _ranking(spark, [(1, 3), (2, 7)])
    rows = rrf_fuse([("a", a), ("b", b)]).collect()
    assert [r.doc_id for r in rows] == [3, 7]  # equal scores -> id order


def test_top_k_truncates(spark):
    a = _ranking(spark, [(i, i * 10) for i in range(1, 31)])
    b = _ranking(spark, [(i, i * 10) for i in range(1, 31)])
    rows = rrf_fuse([("a", a), ("b", b)], top_k=5).collect()
    assert len(rows) == 5 and rows[0].doc_id == 10


def test_tf_topk_counts_and_ranks(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta"), (3, "gamma gamma")],
        "doc_id long, text string")
    rows = tf_topk(docs, ["alpha", "beta"], k=10).collect()
    assert [(r.rank, r.doc_id, r.tf_sum) for r in rows] == [
        (1, 1, 3), (2, 2, 1)]


def test_fusion_over_real_arms_python_replay(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["hash"] * (i % 4) + ["join"] * (i % 3)
                      + ["filler"] * 3)) for i in range(1, 40)],
        "doc_id long, text string")
    bm = bm25_topk(docs, ["hash", "join"], k=15)
    tf = tf_topk(docs, ["hash", "join"], k=15)
    fused = rrf_fuse([("bm25", bm), ("tf", tf)], top_k=10).collect()

    bm_r = {r.doc_id: r.rank for r in bm.collect()}
    tf_r = {r.doc_id: r.rank for r in tf.collect()}
    exp = {}
    for d in set(bm_r) | set(tf_r):
        s = 0
        if d in bm_r:
            s += 1000000 // (60 + bm_r[d])
        if d in tf_r:
            s += 1000000 // (60 + tf_r[d])
        exp[d] = s
    order = sorted(exp, key=lambda d: (-exp[d], d))[:10]
    assert [r.doc_id for r in fused] == order
    assert all(r.rrf_ppm == exp[r.doc_id] for r in fused)


def test_validates(spark):
    a = _ranking(spark, [(1, 1)])
    with pytest.raises(ValueError):
        rrf_fuse([("a", a)])
    with pytest.raises(ValueError):
        tf_topk(a.selectExpr("doc_id", "'x' as text"), [])
