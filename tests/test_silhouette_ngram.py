"""centroid_silhouette + ngram_overlap: hand geometry, tie-breaks,
degenerate points; BLEU clip hand cases, bigram adjacency, python
brute replays."""

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.spatial_cluster import centroid_silhouette
from picogeojson_spark.operators.textstats import ngram_overlap

pytestmark = pytest.mark.usefixtures("spark")


def _pts(spark, rows):
    return spark.createDataFrame(rows, "lat_u long, lon_u long")


def test_silhouette_hand_values(spark):
    # centroids at x=0 and x=1000 (lat fixed 0); point at x=100:
    # a=100, b=900 -> s = 800000 ppm; point at x=500: a=b=500 -> 0
    cents = [(0, 0), (0, 1000)]
    out = {r.cid: r for r in centroid_silhouette(
        _pts(spark, [(0, 100), (0, 500)]), cents).collect()}
    assert out[0].n_points == 2
    assert out[0].max_s_ppm == 800 * 10**6 // 900  # (b-a)/max(a,b)
    assert out[0].min_s_ppm == 0
    assert out[0].mean_s_ppm == (888888 + 0) // 2


def test_silhouette_on_centroid_is_perfect(spark):
    cents = [(0, 0), (0, 1000)]
    out = {r.cid: r for r in centroid_silhouette(
        _pts(spark, [(0, 0), (0, 1000)]), cents).collect()}
    assert out[0].mean_s_ppm == 1000000 and out[1].mean_s_ppm == 1000000


def test_silhouette_tie_assigns_smaller_cid(spark):
    cents = [(0, 0), (0, 200)]
    out = centroid_silhouette(_pts(spark, [(0, 100)]), cents).collect()
    assert len(out) == 1 and out[0].cid == 0 and out[0].mean_s_ppm == 0


def test_silhouette_coincident_centroids_degenerate_zero(spark):
    cents = [(0, 0), (0, 0)]
    out = centroid_silhouette(_pts(spark, [(0, 0)]), cents).collect()
    assert out[0].cid == 0 and out[0].mean_s_ppm == 0


def test_silhouette_k_bounds(spark):
    with pytest.raises(ValueError):
        centroid_silhouette(_pts(spark, [(0, 0)]), [(0, 0)])
    with pytest.raises(ValueError):
        centroid_silhouette(_pts(spark, [(0, 0)]), [(0, i) for i in
                                                    range(65)])


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, cand string, ref string")


def test_ngram_identical_is_perfect(spark):
    d = _docs(spark, [(1, "a b c d", "a b c d")])
    r = ngram_overlap(d).collect()[0]
    assert (r.p1_num, r.p1_den, r.p1_ppm) == (4, 4, 1000000)
    assert (r.p2_num, r.p2_den, r.p2_ppm) == (3, 3, 1000000)


def test_ngram_clip_caps_repeats(spark):
    # classic BLEU clip: cand "the the the", ref has ONE "the"
    d = _docs(spark, [(1, "the the the", "the cat")])
    r = ngram_overlap(d).collect()[0]
    assert (r.p1_num, r.p1_den) == (1, 3)
    assert r.p1_ppm == 10**6 // 3
    # bigrams: "the the" x2, ref has none
    assert (r.p2_num, r.p2_den) == (0, 2) and r.p2_ppm == 0


def test_ngram_per_doc_references(spark):
    # gram present in ANOTHER doc's ref must not count
    d = _docs(spark, [(1, "x y", "a b"), (2, "a b", "x y")])
    r = ngram_overlap(d).collect()[0]
    assert r.p1_num == 0 and r.p2_num == 0 and r.n_docs == 2


def test_ngram_brute_differential(spark):
    from collections import Counter

    rows = []
    for i in range(20):
        ref = " ".join("w%d" % ((i * j + j) % 11) for j in range(10))
        toks = ref.split()
        cand = " ".join(t for p, t in enumerate(toks) if (p + 1) % 4)
        rows.append((i, cand, ref))
    r = ngram_overlap(_docs(spark, rows)).collect()[0]

    def gr(toks, n):
        return Counter(" ".join(toks[i:i + n])
                       for i in range(len(toks) - n + 1))

    num = {1: 0, 2: 0}
    den = {1: 0, 2: 0}
    for _, cand, ref in rows:
        ct, rt = cand.split(), ref.split()
        for n in (1, 2):
            cc, rc = gr(ct, n), gr(rt, n)
            den[n] += sum(cc.values())
            num[n] += sum(min(c, rc.get(g, 0)) for g, c in cc.items())
    assert (r.p1_num, r.p1_den) == (num[1], den[1])
    assert (r.p2_num, r.p2_den) == (num[2], den[2])


def test_ngram_empty_text_null_ppm(spark):
    d = _docs(spark, [(1, "  ", "a b")])
    r = ngram_overlap(d).collect()[0]
    assert r.p1_den == 0 and r.p1_ppm is None
