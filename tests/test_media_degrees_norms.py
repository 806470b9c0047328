"""media_dedup + degree_profile + norm_profile: hash grouping,
canonical pick, min_copies cut; bucket math; zero-norm bucket."""

import hashlib

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.graph import degree_profile
from picogeojson_spark.operators.multimodal import media_dedup
from picogeojson_spark.operators.pca import norm_profile

pytestmark = pytest.mark.usefixtures("spark")


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_media_dedup_groups_and_canonical(spark):
    rows = [(5, b"aaa"), (2, b"aaa"), (9, b"bbb"), (1, b"aaa"),
            (7, b"ccc"), (3, b"ccc")]
    out = {r.payload_md5: r for r in
           media_dedup(_media(spark, rows)).collect()}
    h = hashlib.md5(b"aaa".hex().upper().encode()).hexdigest()
    assert out[h].n_copies == 3 and out[h].canonical_id == 1
    hc = hashlib.md5(b"ccc".hex().upper().encode()).hexdigest()
    assert out[hc].n_copies == 2 and out[hc].canonical_id == 3
    # singleton "bbb" suppressed at min_copies=2
    assert len(out) == 2


def test_media_dedup_long_payload_parity(spark):
    # the digest contract must hold past base64's 57-byte chunk point
    # (Spark base64 MIME-chunks, hex does not — the probed trap)
    p = b"z" * 5000
    rows = [(1, p), (2, p)]
    out = media_dedup(_media(spark, rows)).collect()
    assert len(out) == 1
    assert out[0].payload_md5 == hashlib.md5(
        p.hex().upper().encode()).hexdigest()


def test_media_dedup_min_copies_one_keeps_all(spark):
    rows = [(1, b"x"), (2, b"y")]
    assert len(media_dedup(_media(spark, rows), min_copies=1)
               .collect()) == 2
    with pytest.raises(ValueError):
        media_dedup(_media(spark, rows), min_copies=0)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_degree_profile_star(spark):
    # star: center degree 5 (bucket 2), five leaves degree 1 (bucket 0)
    e = _edges(spark, [(0, i) for i in range(1, 6)])
    out = {r.bucket: r for r in degree_profile(e).collect()}
    assert out[0].n_nodes == 5 and out[0].deg_lo == 1
    assert out[2].n_nodes == 1 and out[2].deg_lo == 4
    assert out[0].share_ppm == 5 * 10**6 // 6


def test_degree_profile_regular(spark):
    # triangle: all degree 2 -> single bucket 1
    e = _edges(spark, [(0, 1), (1, 2), (0, 2)])
    out = degree_profile(e).collect()
    assert len(out) == 1 and out[0].bucket == 1 and out[0].n_nodes == 3
    assert out[0].share_ppm == 1000000


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_norm_profile_buckets_and_zero(spark):
    rows = [(1, [0.0, 0.0]),          # norm2 = 0 -> bucket -1
            (2, [0.001, 0.0]),        # q=(1,0) norm2=1 -> bucket 0
            (3, [0.002, 0.0]),        # q=(2,0) norm2=4 -> bucket 2
            (4, [1.0, 1.0])]          # norm2=2e6 -> bucket 20
    out = {r.bucket: r for r in norm_profile(_vecs(spark, rows)).collect()}
    assert out[-1].n_vecs == 1 and out[-1].norm2_lo == 0
    assert out[0].n_vecs == 1 and out[2].norm2_lo == 4
    assert out[20].n_vecs == 1 and out[20].norm2_lo == 2**20
    assert out[0].share_ppm == 250000


def test_norm_profile_negative_components(spark):
    # negative components square positively; float32 -0.001 promotes to
    # double -0.001000000047 so floor(q*1000) = -2 (the quantization
    # discipline's documented float32 path), norm2 = 4 -> bucket 2
    rows = [(1, [-0.001])]
    out = norm_profile(_vecs(spark, rows)).collect()
    assert len(out) == 1 and out[0].bucket == 2 and out[0].n_vecs == 1


def test_cluster_size_histogram(spark):
    from picogeojson_spark.operators.dedup import cluster_size_histogram

    rows = [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20),
            (21, 20)]
    df = spark.createDataFrame(rows, "doc_id long, rep_id long")
    out = {r.size: r for r in cluster_size_histogram(df).collect()}
    assert out[3].n_clusters == 1 and out[3].docs == 3
    assert out[2].n_clusters == 2 and out[2].docs == 4
    assert set(out) == {2, 3}
