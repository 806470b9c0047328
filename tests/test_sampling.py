"""Deterministic sampling operators: reproducibility, growth stability,
stratified reservoir semantics, and the WindowGroupLimit scale shape."""

import hashlib

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.sampling import (
    BUCKETS,
    hash_bucket,
    hash_sample,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "lang_{}".format(i % 3)) for i in range(1000)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def _py_bucket(value, salt="s0", buckets=BUCKETS):
    h = hashlib.md5("{}:{}".format(salt, value).encode()).hexdigest()
    return int(h[:8], 16) % buckets


def test_hash_bucket_matches_python(spark, corpus):
    got = {r.doc_id: r.b for r in
           corpus.select("doc_id", hash_bucket("doc_id").alias("b")).collect()}
    for doc_id, b in got.items():
        assert b == _py_bucket(doc_id)


def test_hash_sample_is_deterministic_and_fractional(spark, corpus):
    s1 = {r.doc_id for r in hash_sample(corpus, 0.2).collect()}
    s2 = {r.doc_id for r in hash_sample(corpus, 0.2).collect()}
    assert s1 == s2
    assert s1 == {i for i in range(1000) if _py_bucket(i) < 0.2 * BUCKETS}
    # ~20% of 1000, loose bound: the hash is uniform, not exact-count
    assert 120 <= len(s1) <= 280


def test_hash_sample_growth_stable(spark, corpus):
    """Appending rows never changes membership of existing rows, and a
    sample of a subset is exactly the subset of the sample."""
    full = {r.doc_id for r in hash_sample(corpus, 0.3).collect()}
    sub = {r.doc_id for r in
           hash_sample(corpus.filter(F.col("doc_id") < 400), 0.3).collect()}
    assert sub == {d for d in full if d < 400}


def test_hash_sample_salts_are_independent(spark, corpus):
    a = {r.doc_id for r in hash_sample(corpus, 0.5, salt="a").collect()}
    b = {r.doc_id for r in hash_sample(corpus, 0.5, salt="b").collect()}
    assert a != b
    # independence: overlap near 25% of 1000, nowhere near 0 or 50%
    assert 150 <= len(a & b) <= 350


def test_stratified_sample_exact_counts_and_members(spark, corpus):
    out = stratified_sample(corpus, 5, key_col="lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert set(by_lang) == {"lang_0", "lang_1", "lang_2"}
    for lang, members in by_lang.items():
        assert len(members) == 5
        want_pool = [i for i in range(1000)
                     if "lang_{}".format(i % 3) == lang]
        want = set(sorted(want_pool, key=lambda i: (_py_bucket(i), i))[:5])
        assert members == want
    # the _rk helper column is dropped from the output
    assert set(out[0].asDict()) == {"doc_id", "lang"}


def test_stratified_sample_reservoir_never_reshuffles(spark, corpus):
    """Growing a stratum only evicts highest-hash members — survivors of
    the smaller corpus that remain in the bigger one keep their slots."""
    small = stratified_sample(corpus.filter(F.col("doc_id") < 300), 10)
    big = stratified_sample(corpus, 10)
    small_ids = {r.doc_id for r in small.collect()}
    big_ids = {r.doc_id for r in big.collect()}
    # any member of the big-corpus sample with id < 300 must already have
    # been in the small-corpus sample (ranks only grow as rows are added)
    assert {d for d in big_ids if d < 300} <= small_ids


def test_stratified_sample_plan_has_window_group_limit(spark, corpus):
    """The rank<=n filter must trigger WindowGroupLimit so hot strata are
    pre-pruned map-side before the exchange."""
    plan = stratified_sample(corpus, 5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_hash_sample_plan_is_narrow(spark, corpus):
    """No exchange anywhere — the sample is a pure filter."""
    plan = hash_sample(corpus, 0.1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_temperature_sample_flattens_head(spark):
    """alpha=0.5: the smallest source keeps everything; a 100x source
    keeps ~10x the smallest's docs (not 100x); membership is a pure
    (salt, id) function so re-cuts are stable at any parallelism."""
    from picogeojson_spark.operators.sampling import temperature_sample

    rows = [(i, "big") for i in range(10000)] + \
           [(100000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = temperature_sample(df, salt="tt").groupBy("source").count()
    got = {r["source"]: r["count"] for r in kept.collect()}
    assert got["small"] == 100                      # floor source: all kept
    assert 800 <= got["big"] <= 1200                # ~ sqrt(100/10000)=10%
    # deterministic re-cut
    again = {r["source"]: r["count"] for r in
             temperature_sample(df, salt="tt")
             .groupBy("source").count().collect()}
    assert again == got
    # no cross join in the plan (the repo-wide invariant)
    plan = temperature_sample(df, salt="tt") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# balanced_sample
# ---------------------------------------------------------------------------

def test_balanced_equalizes_class_sizes(spark):
    from picogeojson_spark.operators.sampling import balanced_sample

    rows = ([(i, 0) for i in range(20)]
            + [(100 + i, 1) for i in range(7)]
            + [(200 + i, 2) for i in range(13)])
    df = spark.createDataFrame(rows, "vec_id long, label int")
    out = balanced_sample(df).collect()
    sizes = {}
    for r in out:
        sizes[r.label] = sizes.get(r.label, 0) + 1
    assert sizes == {0: 7, 1: 7, 2: 7}


def test_balanced_min_class_kept_whole(spark):
    from picogeojson_spark.operators.sampling import balanced_sample

    rows = [(i, 0) for i in range(9)] + [(50 + i, 1) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, label int")
    kept = {r.vec_id for r in balanced_sample(df).collect()
            if r.label == 1}
    assert kept == {50, 51, 52}


def test_balanced_deterministic_and_partition_stable(spark):
    from picogeojson_spark.operators.sampling import balanced_sample

    rows = [(i, i % 4) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, label int")
    a = sorted(map(tuple, balanced_sample(df).collect()))
    b = sorted(map(tuple, balanced_sample(df.repartition(13)).collect()))
    assert a == b


def test_balanced_append_keeps_prefix_order(spark):
    from picogeojson_spark.operators.sampling import balanced_sample

    # growing the majority class never changes WHICH minority rows stay.
    from picogeojson_spark.operators.sampling import hash_bucket  # noqa: F401

    base = [(i, 0) for i in range(10)] + [(100 + i, 1) for i in range(10)]
    grown = base + [(i, 0) for i in range(10, 30)]
    df1 = spark.createDataFrame(base, "vec_id long, label int")
    df2 = spark.createDataFrame(grown, "vec_id long, label int")
    k1 = {r.vec_id for r in balanced_sample(df1).collect() if r.label == 1}
    k2 = {r.vec_id for r in balanced_sample(df2).collect() if r.label == 1}
    assert k1 == k2  # n_min unchanged (still 10): identical minority keep
