"""vocab_stats: Heaps/hapax/TTR profile on crafted corpora."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, docs):
    from picogeojson_spark.operators.textstats import vocab_stats

    df = spark.createDataFrame(
        [(i, t, s) for i, (s, t) in enumerate(docs)],
        "doc_id long, text string, source string")
    out = vocab_stats(df).collect()
    return {r.grp: r for r in out}


def test_hand_counts(spark):
    got = _run(spark, [("s1", "a b a c"), ("s1", "a d")])
    r = got["s1"]
    assert (r.n_docs, r.n_tokens, r.vocab, r.hapax) == (2, 6, 4, 3)
    assert r.ttr_ppm == 666_666       # floor(4e6/6)
    assert r.hapax_ppm == 750_000     # 3/4 (b, c, d each once)


def test_all_unique_tokens(spark):
    r = _run(spark, [("s", "w1 w2 w3 w4")])["s"]
    assert r.ttr_ppm == 1_000_000 and r.hapax_ppm == 1_000_000


def test_fully_repetitive(spark):
    r = _run(spark, [("s", "x x x x x")])["s"]
    assert (r.vocab, r.hapax) == (1, 0)
    assert r.ttr_ppm == 200_000 and r.hapax_ppm == 0


def test_case_folding_and_whitespace(spark):
    # lower(trim(...)) + \s+ split + empty drop: "A  a\ta" is one type
    r = _run(spark, [("s", "  A  a\ta ")])["s"]
    assert (r.n_tokens, r.vocab) == (3, 1)


def test_empty_text_group_zeroes(spark):
    r = _run(spark, [("s", "")])["s"]
    assert (r.n_docs, r.n_tokens, r.vocab) == (1, 0, 0)
    assert r.ttr_ppm is None and r.hapax_ppm is None
