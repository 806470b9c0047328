"""lexicon_score + key_uniqueness: polarity counts, negative floor,
empty docs, overlap guard; uniqueness ratios, NULL handling."""

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.profile import key_uniqueness
from picogeojson_spark.operators.textstats import lexicon_score

pytestmark = pytest.mark.usefixtures("spark")

POS = ["good", "great"]
NEG = ["bad", "awful"]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lexicon_counts_and_labels(spark):
    rows = [(1, "Good good stuff but a bit bad"),
            (2, "awful awful bad"),
            (3, "plain text here")]
    out = {r.doc_id: r for r in lexicon_score(
        _docs(spark, rows), POS, NEG).collect()}
    assert (out[1].pos_n, out[1].neg_n, out[1].label) == (2, 1, "pos")
    assert out[2].label == "neg" and out[2].neg_n == 3
    assert out[3].label == "neutral" and out[3].pos_n == 0
    assert out[1].net_ppm == 10**6 * 1 // 7


def test_lexicon_negative_floor(spark):
    # net = -1 over 3 tokens: floor(-1e6/3) = -333334 (not trunc -333333)
    rows = [(1, "bad plain stuff")]
    r = lexicon_score(_docs(spark, rows), POS, NEG).collect()[0]
    assert r.net_ppm == -(10**6 // 3) - 1


def test_lexicon_empty_doc_null(spark):
    rows = [(1, "  ")]
    r = lexicon_score(_docs(spark, rows), POS, NEG).collect()[0]
    assert r.n_tokens == 0 and r.net_ppm is None and r.label == "neutral"


def test_lexicon_guards(spark):
    d = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        lexicon_score(d, [], NEG)
    with pytest.raises(ValueError):
        lexicon_score(d, ["same"], ["same"])


def test_key_uniqueness(spark):
    rows = [(1, "a", None), (2, "a", 10), (3, "b", 11), (4, "c", 11)]
    df = spark.createDataFrame(rows, "id int, k string, v int")
    out = {r.col: r for r in key_uniqueness(df, ["id", "k", "v"])
           .collect()}
    assert out["id"].is_unique and out["id"].uniq_ppm == 1000000
    assert not out["k"].is_unique
    assert out["k"].n_distinct == 3 and out["k"].uniq_ppm == 750000
    assert out["v"].n_nonnull == 3 and out["v"].n_distinct == 2
    assert out["v"].n_rows == 4
    with pytest.raises(ValueError):
        key_uniqueness(df, [])
