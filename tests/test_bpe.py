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


def _brute_serial_merges(vocab, n_merges):
    """Reference trainer: full pair recount every round (no heap, no
    index) — the unmistakably-correct O(rounds * vocab) replay."""
    syms = {i: s for i, (s, _) in enumerate(vocab)}
    freqs = [f for _, f in vocab]
    out = []
    for i in range(n_merges):
        counts = {}
        for wid, s in syms.items():
            toks = s.strip().split(" ")
            for pr in zip(toks, toks[1:]):
                counts[pr] = counts.get(pr, 0) + freqs[wid]
        if not counts:
            break
        (l, r), cnt = min(counts.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((i + 1, l, r, cnt))
        pat, rep = " {} {} ".format(l, r), " {} ".format(l + r)
        for wid in syms:
            syms[wid] = syms[wid].replace(pat, rep)
    return out


def _as_vocab(words):
    from collections import Counter

    c = Counter(words)
    return [(" " + " ".join(w) + " ", f) for w, f in sorted(c.items())]


def test_local_trainer_matches_brute_serial():
    """The incremental heap+index trainer == full-recount serial replay,
    including repeated-symbol runs (residual re-merge of the same pair)
    and exact count ties."""
    from picogeojson_spark.operators.bpe import _local_train_merges

    corpora = [
        # textbook
        "low lower lowest new newer newest low low new".split(),
        # repeated-symbol runs: 'aaaa' merges (a,a) then its residual again
        "aaaa aaa aa banana bananas abab abab baba".split(),
        # ties everywhere (every pair count 1 -> pure tie-break order)
        "ab cd ef gh ij".split(),
        # re-selecting a pair after residuals: many 'aa' contexts
        ["a" * 8] * 3 + ["a" * 5] * 2 + ["xy"] * 4,
    ]
    for words in corpora:
        vocab = _as_vocab(words)
        for n in (1, 4, 16, 64):
            got = _local_train_merges([list(v) for v in vocab], n)
            want = _brute_serial_merges([list(v) for v in vocab], n)
            assert got == want, (words[:3], n)


def test_bpe_local_matches_distributed(spark):
    """bpe_train's two paths (collected-vocab local trainer vs per-round
    distributed loop) produce identical merge tables."""
    from picogeojson_spark.operators.bpe import bpe_train

    df = spark.createDataFrame(
        [(1, "the quick brown fox the quick aaaa aaa"),
         (2, "pack my box with five dozen aaaa"),
         (3, "the thin thorn then banana bananas")],
        "doc_id long, text string")
    local = [tuple(r) for r in bpe_train(df, n_merges=16).collect()]
    dist = [tuple(r) for r in
            bpe_train(df, n_merges=16, local_vocab_budget=0).collect()]
    assert local == dist
    assert len(local) == 16


def test_bpe_many_merges_constant_jobs(spark):
    """n_merges=256 must NOT cost one Spark job per merge: the local path
    runs the corpus aggregate + vocab collect and trains driver-side.
    Job count is read from the Spark UI REST API (skipped if UI off)."""
    import json
    import urllib.request

    from picogeojson_spark.operators.bpe import bpe_train

    sc = spark.sparkContext
    if not sc.uiWebUrl:
        pytest.skip("spark UI disabled")

    def n_jobs():
        url = "{}/api/v1/applications/{}/jobs?status=succeeded".format(
            sc.uiWebUrl, sc.applicationId)
        return len(json.load(urllib.request.urlopen(url)))

    # a vocabulary rich enough to sustain 256 merges: 400 distinct 6-char
    # pseudo-words (deterministic base-26 encoding)
    def word(i):
        return "".join(chr(97 + (i // 26 ** j) % 26) for j in range(6))

    df = spark.createDataFrame(
        [(i, " ".join(word(37 * i + j) for j in range(20)))
         for i in range(40)], "doc_id long, text string")
    before = n_jobs()
    merges = bpe_train(df, n_merges=256).collect()
    after = n_jobs()
    assert len(merges) == 256
    # vocab count + collect + createDataFrame materialization = O(1);
    # generous bound still catches a per-merge loop (256+ jobs)
    assert after - before <= 8, (before, after)
