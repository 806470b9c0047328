"""phrase_search: overlap counting, repeated tokens, non-contiguity,
case/trim tokenization parity, validation."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _search(spark, docs, phrase):
    from picogeojson_spark.operators.retrieval import phrase_search

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r.doc_id: (r.n_matches, r.first_pos)
            for r in phrase_search(df, phrase).collect()}


def test_overlapping_matches_count(spark):
    out = _search(spark, [(1, "b b b b"), (2, "b c b")], ["b", "b"])
    assert out == {1: (3, 0)}  # "b b" at 0,1,2; doc 2 non-contiguous


def test_multiword_phrase_and_positions(spark):
    docs = [(1, "the quick fox the quick dog"),
            (2, "quick the fox"),
            (3, "THE  Quick fox")]
    out = _search(spark, docs, ["the", "quick"])
    # doc1 matches at 0 and 3; doc3 matches at 0 (case + ws collapse)
    assert out == {1: (2, 0), 3: (1, 0)}


def test_three_token_phrase(spark):
    docs = [(1, "a b c a b c"), (2, "a b b c")]
    out = _search(spark, docs, ["a", "b", "c"])
    assert out == {1: (2, 0)}


def test_empty_and_missing(spark):
    out = _search(spark, [(1, "   "), (2, "x y")], ["z", "z"])
    assert out == {}


def test_validation(spark):
    from picogeojson_spark.operators.retrieval import phrase_search

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        phrase_search(df, [])
    with pytest.raises(ValueError):
        phrase_search(df, ["a", ""])
