"""Unit tests: DSIR-style importance resampling + domain boilerplate."""

import hashlib


def _md5_bucket(salt, tok, n):
    h = int(hashlib.md5("{}:{}".format(salt, tok).encode()).hexdigest()[:8], 16)
    return h % n


def _py_importance(raw_docs, target_docs, cap_ppm, n_buckets, salt):
    """Pure-Python replay of importance_resample's integer arithmetic."""
    PPM = 1_000_000
    H30 = 1 << 30

    def rates(docs):
        cnt = [0] * n_buckets
        for _, text in docs:
            for tok in text.strip().lower().split():
                if tok:
                    cnt[_md5_bucket(salt, tok, n_buckets)] += 1
        denom = sum(cnt) + n_buckets
        return [((c + 1) * PPM) // denom for c in cnt]

    t, r = rates(target_docs), rates(raw_docs)
    ratio = [(t[b] * PPM) // r[b] for b in range(n_buckets)]
    out = {}
    for doc_id, text in raw_docs:
        toks = [w for w in text.strip().lower().split() if w]
        if toks:
            s = sum(ratio[_md5_bucket(salt, w, n_buckets)] for w in toks)
            score = s // len(toks)
        else:
            score = 0
        h30 = int(hashlib.md5("{}|keep|{}".format(salt, doc_id).encode())
                  .hexdigest()[:8], 16) % H30
        keep = h30 * cap_ppm < min(cap_ppm, score) * H30
        out[doc_id] = (len(toks), score, keep)
    return out


def test_importance_matches_python_replay(spark):
    from picogeojson_spark.operators.importance import importance_resample

    raw = [(i, "alpha beta gamma delta"[: 5 + (i * 7) % 18] + " tok{}".format(i % 9))
           for i in range(60)]
    raw += [(100, ""), (101, "   ")]  # token-less docs -> score 0, never kept
    target = [(i, t) for i, t in raw if i % 3 == 0]

    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_ppm"], r["keep"])
        for r in importance_resample(rdf, tdf, cap_ppm=1_500_000,
                                     n_buckets=32, salt="tst").collect()
    }
    want = _py_importance(raw, target, 1_500_000, 32, "tst")
    assert got == want
    assert got[100] == (0, 0, False)
    # self-selection sanity: docs in the target should on average score
    # above PPM (they ARE the target distribution)
    t_scores = [got[i][1] for i, _ in target]
    assert sum(t_scores) / len(t_scores) > 1_000_000


def test_importance_identical_corpora_scores_ppm(spark):
    """raw == target -> every bucket ratio is ~1e6, so every doc's mean
    ratio is ~1e6 (exact up to the integer-division truncation)."""
    from picogeojson_spark.operators.importance import importance_scores

    docs = spark.createDataFrame(
        [(i, "x y z w{}".format(i % 4)) for i in range(20)],
        "doc_id long, text string")
    out = importance_scores(docs, docs, n_buckets=16).collect()
    for r in out:
        assert 990_000 <= r["score_ppm"] <= 1_000_000


def test_domain_boilerplate_flags_shared_grams(spark):
    from picogeojson_spark.operators.web import domain_boilerplate

    rows = [
        # domain A: 'nav home' appears in 3/4 docs -> boilerplate
        (1, "nav home alpha beta", "a.com"),
        (2, "nav home gamma delta", "a.com"),
        (3, "nav home epsilon zeta", "a.com"),
        (4, "eta theta iota kappa", "a.com"),
        # domain B: same gram but only 1/2 docs -> below min_docs
        (5, "nav home solo here", "b.com"),
        (6, "totally different words", "b.com"),
        (7, "", "b.com"),  # empty -> zeros
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: (r["n_grams"], r["n_boiler"], r["boiler_ppm"])
           for r in domain_boilerplate(df, n=2, min_docs=2,
                                       thresh_ppm=500_000).collect()}
    # doc 1: grams {nav home, home alpha, alpha beta}; only 'nav home'
    # clears 50% of a.com's 4 docs... 3/4 = 75% >= 50% -> flagged
    assert got[1] == (3, 1, 333_333)
    assert got[2][1] == 1 and got[3][1] == 1
    assert got[4] == (3, 0, 0)
    assert got[5][1] == 0  # min_docs=2 not met in b.com
    assert got[7] == (0, 0, 0)


def test_domain_boilerplate_scoped_per_domain(spark):
    """The same gram is boilerplate in one domain and clean in another."""
    from picogeojson_spark.operators.web import domain_boilerplate

    rows = [(i, "footer text item{}".format(i), "big.com") for i in range(10)]
    rows += [(100 + j, "footer text only{}".format(j), "small.org")
             for j in range(2)]
    # big.com: 'footer text' in 10/10 docs; small.org: 2/2 docs
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = domain_boilerplate(df, n=2, min_docs=3, thresh_ppm=800_000)
    got = {r["doc_id"]: r["n_boiler"] for r in out.collect()}
    assert all(got[i] == 1 for i in range(10))       # flagged in big.com
    assert all(got[100 + j] == 0 for j in range(2))  # min_docs=3 blocks
