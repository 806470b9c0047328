"""Empty-input robustness: every join/aggregation operator must return an
empty (correctly-typed) result — not crash — when either side is empty."""

import pytest  # noqa: F401

from pyspark.sql import functions as F  # noqa: F401


def _pts(spark, rows):
    return spark.createDataFrame(rows, "point_id long, lon double, lat double")


def test_pip_join_empty_sides(spark):
    import json

    from picogeojson_spark.operators import pip_join

    poly = {"type": "Polygon",
            "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]}
    polys = spark.createDataFrame([(1, json.dumps(poly))],
                                  "poly_id long, geometry_json string")
    no_polys = polys.filter("poly_id < 0")
    pts = _pts(spark, [(1, 5.0, 5.0)])
    no_pts = pts.filter("point_id < 0")

    assert pip_join(no_pts, polys).count() == 0
    assert pip_join(pts, no_polys).count() == 0
    assert pip_join(no_pts, no_polys).count() == 0


def test_knn_join_empty_sides(spark):
    from picogeojson_spark.operators import knn_join

    q = _pts(spark, [(1, 5.0, 5.0)]).withColumnRenamed("point_id", "query_id")
    c = _pts(spark, [(1, 5.0, 5.0)]).withColumnRenamed("point_id", "neighbor_id")
    no_q = q.filter("query_id < 0")
    no_c = c.filter("neighbor_id < 0")

    assert knn_join(no_q, c, k=1, level=4).count() == 0
    # empty candidates: every query falls to the brute tail, which is empty
    assert knn_join(q, no_c, k=1, level=4).count() == 0


def test_poly_intersection_join_empty_sides(spark):
    import json

    from picogeojson_spark.operators.poly_join import polygon_intersection_join

    poly = {"type": "Polygon",
            "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]}
    a = spark.createDataFrame([(1, json.dumps(poly))],
                              "a_id long, geometry_json string")
    b = spark.createDataFrame([(2, json.dumps(poly))],
                              "b_id long, geometry_json string")
    assert polygon_intersection_join(a.filter("a_id < 0"), b).count() == 0
    assert polygon_intersection_join(a, b.filter("b_id < 0")).count() == 0


def test_asof_and_dedup_empty(spark):
    from picogeojson_spark.operators.asof import asof_join
    from picogeojson_spark.operators.dedup import (
        exact_duplicates,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    left = spark.createDataFrame([], "k long, lid long, ts long")
    right = spark.createDataFrame([(1, 9, 4)], "k long, rid long, ts long")
    assert asof_join(left, right, by="k", ts_col="ts",
                     right_value_cols=["rid"]).count() == 0

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_duplicates(docs).count() == 0
    assert ngram_jaccard_pairs(docs).count() == 0
    assert minhash_lsh_pairs(docs).count() == 0


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_similarity_empty_sides(spark):
    from picogeojson_spark.operators.similarity import (
        ann_bruteforce_topk_np,
        ann_ivf_topk,
        ann_lsh_topk,
        cosine_pairs,
        cosine_pairs_lsh,
    )

    emb = _emb(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])])
    empty = emb.filter("vec_id < 0")

    assert cosine_pairs(empty, 0.5).count() == 0
    assert cosine_pairs_lsh(empty, 0.5, dim=2).count() == 0
    assert ann_bruteforce_topk_np(empty, emb, k=2).count() == 0
    assert ann_bruteforce_topk_np(emb, empty, k=2).count() == 0
    assert ann_lsh_topk(empty, emb, k=2, planes=2, bands=2, dim=2).count() == 0
    assert ann_lsh_topk(emb, empty, k=2, planes=2, bands=2, dim=2).count() == 0
    assert ann_ivf_topk(empty, emb, k=2, nlist=2, nprobe=1).count() == 0
    assert ann_ivf_topk(emb, empty, k=2, nlist=2, nprobe=1).count() == 0


def test_asof_and_textstats_empty(spark):
    from picogeojson_spark.operators.asof import asof_join
    from picogeojson_spark.operators.textstats import gopher_quality_flags

    left = spark.createDataFrame([(1, 10, 5)], "k long, lid long, ts long")
    right = spark.createDataFrame([(1, 7, 3)], "k long, ts long, v int")
    no_left = left.filter("k < 0")
    no_right = right.filter("k < 0")

    assert asof_join(no_left, right, by="k", ts_col="ts",
                     right_value_cols=["v"]).count() == 0
    # empty right side: inner drops everything, left keeps with NULL payload
    assert asof_join(left, no_right, by="k", ts_col="ts",
                     right_value_cols=["v"]).count() == 0
    kept = asof_join(left, no_right, by="k", ts_col="ts",
                     right_value_cols=["v"], how="left").collect()
    assert len(kept) == 1 and kept[0].r_v is None

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert gopher_quality_flags(docs).count() == 0


def test_hll_empty_input(spark):
    from picogeojson_spark.operators.sketches import hll_distinct

    empty = spark.createDataFrame([], "grp string, v string")
    assert hll_distinct(empty, ["grp"], "v", p=6).count() == 0


def test_surprisal_empty_input(spark):
    from picogeojson_spark.operators.textstats import unigram_surprisal

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert unigram_surprisal(empty).count() == 0


def test_bpe_empty_corpus(spark):
    from picogeojson_spark.operators.bpe import bpe_apply, bpe_train

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bpe_train(empty, n_merges=4).count() == 0
    assert bpe_apply(empty, [("a", "b")]).count() == 0


def test_funnel_empty_input(spark):
    from picogeojson_spark.operators.funnel import funnel_counts

    empty = spark.createDataFrame(
        [], "user_id long, event_type string, ts_us long")
    got = {r["step"]: r["n_users"]
           for r in funnel_counts(empty, ["view", "click"], 100).collect()}
    assert got == {"view": 0, "click": 0}


# ------------------------------------------------- round-4 operator sweep

def test_distance_join_empty_sides(spark):
    from picogeojson_spark.operators.knn import distance_join_haversine

    q = _pts(spark, [(1, 5.0, 5.0)]).withColumnRenamed("point_id",
                                                       "query_id")
    c = _pts(spark, [(1, 5.25, 5.25)]).withColumnRenamed("point_id",
                                                         "neighbor_id")
    no_q = q.filter("query_id < 0")
    no_c = c.filter("neighbor_id < 0")
    assert distance_join_haversine(no_q, c, 1_000_000).count() == 0
    assert distance_join_haversine(q, no_c, 1_000_000).count() == 0
    assert distance_join_haversine(no_q, no_c, 1_000_000).count() == 0


def test_polygon_measures_empty(spark):
    from picogeojson_spark.operators.measures import polygon_measures

    df = spark.createDataFrame([], "poly_id long, ring array<array<double>>")
    assert polygon_measures(df).count() == 0


def test_simplify_rings_empty(spark):
    from picogeojson_spark.operators.simplify import simplify_rings

    df = spark.createDataFrame([], "poly_id long, ring array<array<double>>")
    assert simplify_rings(df, 1.0).count() == 0


def test_hits_empty_graph(spark):
    from picogeojson_spark.operators.graph import hits

    edges = spark.createDataFrame([], "src long, dst long")
    assert hits(edges, iterations=2).count() == 0


def test_bigram_surprisal_empty(spark):
    from picogeojson_spark.operators.textstats import bigram_surprisal

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert bigram_surprisal(docs).count() == 0


def test_anchor_text_stats_empty(spark):
    from picogeojson_spark.operators.web import anchor_text_stats

    pages = spark.createDataFrame([], "url string, html string")
    assert anchor_text_stats(pages).count() == 0


def test_compression_ratio_empty(spark):
    from picogeojson_spark.operators.textstats import compression_ratio

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert compression_ratio(docs).count() == 0


def test_table_profile_empty_table(spark):
    from picogeojson_spark.operators.profile import table_profile

    df = spark.createDataFrame([], "k long, s string")
    got = {r["column"]: r for r in table_profile(df, ["k", "s"]).collect()}
    assert set(got) == {"k", "s"}
    assert got["k"]["n_rows"] == 0 and got["k"]["ndv_est"] == 0


def test_decontam_embed_empty_corpus(spark):
    from picogeojson_spark.operators.similarity import decontaminate_embed

    corpus = spark.createDataFrame(
        [], "vec_id long, embedding array<double>")
    evals = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    assert decontaminate_embed(corpus, evals, 500_000).count() == 0


def test_zorder_key_empty(spark):
    from picogeojson_spark.operators.layout import zorder_key

    df = spark.createDataFrame([], "point_id long, lon double, lat double")
    assert df.select(zorder_key(F.col("lon"), F.col("lat"), 8)).count() == 0
