"""collocations: integer-lift PMI ranking on crafted corpora."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_glued_pair_outranks_frequent_pair(spark):
    from picogeojson_spark.operators.textstats import collocations

    # "new york" always co-occurs (pure pair); "the cat"/"the dog" share
    # the promiscuous "the" -> lower lift despite equal pair counts.
    texts = (["new york"] * 6
             + ["the cat"] * 6 + ["the dog"] * 6)
    out = collocations(_docs(spark, texts), min_count=5, k=10).collect()
    by = {r.gram: r for r in out}
    n = 36  # total tokens
    ny = by["new york"]
    assert (ny.c_xy, ny.c_x, ny.c_y) == (6, 6, 6)
    assert ny.lift_ppm == 6 * n * 1000000 // 36
    cat = by["the cat"]
    assert (cat.c_xy, cat.c_x, cat.c_y) == (6, 12, 6)
    assert ny.lift_ppm > cat.lift_ppm
    assert out[0].gram == "new york" and out[0].rnk == 1


def test_min_count_prunes_hapax(spark):
    from picogeojson_spark.operators.textstats import collocations

    texts = ["rare pair"] + ["common bigram"] * 5
    out = collocations(_docs(spark, texts), min_count=5, k=10).collect()
    grams = {r.gram for r in out}
    assert "common bigram" in grams and "rare pair" not in grams


def test_cross_doc_bigrams_never_form(spark):
    from picogeojson_spark.operators.textstats import collocations

    # "b a" never occurs inside one doc even though b ends doc i and a
    # starts doc i+1.
    texts = ["a b"] * 5
    out = collocations(_docs(spark, texts), min_count=1, k=10).collect()
    assert {r.gram for r in out} == {"a b"}


def test_rank_ties_lexicographic(spark):
    from picogeojson_spark.operators.textstats import collocations

    texts = ["x y"] * 5 + ["p q"] * 5
    out = collocations(_docs(spark, texts), min_count=5, k=10).collect()
    assert [r.gram for r in sorted(out, key=lambda r: r.rnk)] == \
        ["p q", "x y"]
