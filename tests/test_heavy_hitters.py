"""heavy_hitters: two-pass candidate/verify semantics."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_exact_counts_full_sample(spark):
    # sample_ppm = 1e6 keeps every doc: candidates == sample == truth,
    # so the result is the plain exact top-k.
    from picogeojson_spark.operators.sketches import heavy_hitters

    texts = ["a a a b b c", "a b c c d", "e a"]
    out = heavy_hitters(_docs(spark, texts), k=3, sample_ppm=10**6,
                        cand_factor=2).collect()
    got = [(r.rnk, r.word, r.n) for r in sorted(out, key=lambda r: r.rnk)]
    assert got == [(1, "a", 5), (2, "b", 3), (3, "c", 3)]
    # full sample -> sample counts equal exact counts
    assert all(r.n == r.n_sample for r in out)


def test_candidate_cap_bounds_output(spark):
    from picogeojson_spark.operators.sketches import heavy_hitters

    texts = ["w%d" % i for i in range(50)]
    out = heavy_hitters(_docs(spark, texts), k=5, sample_ppm=10**6,
                        cand_factor=2).collect()
    assert len(out) == 5
    assert [r.rnk for r in sorted(out, key=lambda r: r.rnk)] == [1, 2, 3, 4, 5]


def test_recount_is_full_corpus_even_if_sample_partial(spark):
    # with a partial sample, any emitted count is the FULL-corpus count
    # (the verify pass never estimates).
    from picogeojson_spark.operators.sketches import heavy_hitters

    texts = ["x y"] * 40
    out = heavy_hitters(_docs(spark, texts), k=2, sample_ppm=300000,
                        cand_factor=2).collect()
    assert {r.word: r.n for r in out} == {"x": 40, "y": 40}
    assert all(r.n_sample < 40 for r in out)


def test_deterministic_across_runs(spark):
    from picogeojson_spark.operators.sketches import heavy_hitters

    texts = [" ".join("t%d" % ((i * j) % 17) for j in range(12))
             for i in range(60)]
    a = heavy_hitters(_docs(spark, texts), k=6).collect()
    b = heavy_hitters(_docs(spark, texts).repartition(7), k=6).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
