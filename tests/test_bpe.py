"""Unit tests: distributed BPE tokenizer trainer."""

import pytest


def test_bpe_learns_textbook_merges(spark):
    """On the classic low/lower/lowest + new/newer/newest corpus the first
    merges must be the frequent stems (l+o, lo+w, e+w, n+ew)."""
    from picogeojson_spark.operators.bpe import bpe_train

    df = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newer newest"),
         (3, "low low new")], "doc_id long, text string")
    got = [(r["merge_idx"], r["left_sym"], r["right_sym"], r["pair_count"])
           for r in bpe_train(df, n_merges=4).collect()]
    assert got == [(1, "l", "o", 5), (2, "lo", "w", 5),
                   (3, "e", "w", 4), (4, "n", "ew", 4)]


def test_bpe_matches_duckdb_replay(spark):
    import duckdb

    from picogeojson_spark.operators.bpe import (
        bpe_train,
        bpe_train_oracle_sql,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox the quick"), (2, "pack my box with"),
         (3, "the thin thorn then")], "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(df, n_merges=6).collect()]
    con = duckdb.connect()
    con.register("d", df.toPandas())
    want = [tuple(r) for r in con.execute(
        bpe_train_oracle_sql("SELECT text FROM d", 6)).fetchall()]
    assert got == want


def test_bpe_early_stop_when_pairs_exhaust(spark):
    """Single-letter vocabulary has zero pairs -> zero merges, no crash."""
    from picogeojson_spark.operators.bpe import bpe_train

    df = spark.createDataFrame(
        [(1, "a b c a b")], "doc_id long, text string")
    assert bpe_train(df, n_merges=5).count() == 0


def test_bpe_apply_subword_counts(spark):
    """After the low/new merges, 'low lower lowest' is 3 words and
    (low)(low)(er)->wait: low=1, low+er=2, low+e+s+t=4 subwords = 7?
    Hand-derive from the learned rules instead of guessing: apply must
    agree with a pure-Python replay of the same replace chain."""
    from picogeojson_spark.operators.bpe import bpe_apply, bpe_train

    df = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newer newest"),
         (3, "low low new"), (4, "")], "doc_id long, text string")
    rules = [(r["left_sym"], r["right_sym"])
             for r in bpe_train(df, n_merges=6).collect()]

    import re

    def seg(word):
        s = " " + " ".join(word) + " "
        for l, r in rules:
            s = s.replace(" {} {} ".format(l, r), " {}{} ".format(l, r))
        return len(s.split())

    want = {}
    for i, text in [(1, "low lower lowest"), (2, "new newer newest"),
                    (3, "low low new"), (4, "")]:
        words = re.findall("[a-z]+", text.lower())
        want[i] = (len(words), sum(seg(w) for w in words))
    got = {r["doc_id"]: (r["n_words"], r["n_subwords"])
           for r in bpe_apply(df, rules).collect()}
    assert got == want


def test_bpe_invalid_n_merges(spark):
    from picogeojson_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_train(df, n_merges=-1)
