"""Unit tests: count-min sketch build/estimate."""

from collections import Counter

import pytest

from picogeojson_spark.operators.sketches import cms_build, cms_estimate


@pytest.fixture(scope="module")
def cms_docs(spark):
    rows = [
        (1, "apple apple banana cherry"),
        (2, "apple  banana\tbanana"),
        (3, "date"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _exact(rows):
    c = Counter()
    for _, t in rows:
        c.update(w for w in t.split() if w)
    return c


def test_cms_never_undercounts(spark, cms_docs):
    exact = _exact([(r["doc_id"], r["text"]) for r in cms_docs.collect()])
    sketch = cms_build(cms_docs, depth=3, width=4)  # tiny: force collisions
    terms = spark.createDataFrame(
        [(t,) for t in list(exact) + ["missing"]], "term string")
    est = {r["term"]: r["est"]
           for r in cms_estimate(sketch, terms, depth=3, width=4).collect()}
    for t, n in exact.items():
        assert est[t] >= n, (t, est[t], n)
    # absent term may still collide, but never exceeds the total mass
    assert 0 <= est["missing"] <= sum(exact.values())


def test_cms_exact_at_wide_width(spark, cms_docs):
    """With width >> vocabulary, collisions vanish and est == exact."""
    exact = _exact([(r["doc_id"], r["text"]) for r in cms_docs.collect()])
    sketch = cms_build(cms_docs, depth=4, width=4096)
    terms = spark.createDataFrame([(t,) for t in exact], "term string")
    est = {r["term"]: r["est"]
           for r in cms_estimate(sketch, terms, depth=4, width=4096).collect()}
    assert est == dict(exact)


def test_cms_sketch_is_bounded_and_mergeable(spark, cms_docs):
    depth, width = 3, 4
    whole = cms_build(cms_docs, depth=depth, width=width)
    assert whole.count() <= depth * width
    # linearity: sketch(A union B) == re-agg of sketch(A) + sketch(B)
    a = cms_build(cms_docs.filter("doc_id <= 2"), depth=depth, width=width)
    b = cms_build(cms_docs.filter("doc_id > 2"), depth=depth, width=width)
    from pyspark.sql import functions as F
    merged = (a.unionByName(b).groupBy("row_j", "bucket")
              .agg(F.sum("cnt").cast("long").alias("cnt")))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))


def test_cms_matches_duckdb_replay(spark, cms_docs):
    import duckdb
    from picogeojson_spark.operators.sketches import cms_oracle_sql
    from pyspark.sql import functions as F

    pdf = cms_docs.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(cms_oracle_sql(
        "SELECT text FROM docs",
        "SELECT unnest(['apple','banana','date','missing']) AS term",
        3, 4)).df()
    sketch = cms_build(cms_docs, depth=3, width=4)
    terms = spark.createDataFrame(
        [("apple",), ("banana",), ("date",), ("missing",)], "term string")
    got = (cms_estimate(sketch, terms, depth=3, width=4)
           .orderBy("term").toPandas())
    assert list(got["term"]) == list(want["term"])
    assert list(got["est"]) == list(want["est"])


def test_cms_invalid_params(cms_docs):
    with pytest.raises(ValueError):
        cms_build(cms_docs, depth=0, width=8)
    with pytest.raises(ValueError):
        cms_build(cms_docs, depth=2, width=0)


# ------------------------------------------------------------ quantiles

def test_group_quantiles_exact(spark):
    import numpy as np
    from picogeojson_spark.operators.stats import group_quantiles

    rows = ([("a", v) for v in [5, 1, 9, 3, 7, 7, 2, 8, 6, 4]]
            + [("b", v) for v in [10, 20, 30]]
            + [("c", 42)])
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in
           group_quantiles(df, "v", "g", (50, 90, 99, 100)).collect()}
    # percentile_disc ground truth: value at 1-based ceil(p*n/100)
    def disc(vals, p):
        s = sorted(vals)
        return s[-(-p * len(s) // 100) - 1]
    a = [5, 1, 9, 3, 7, 7, 2, 8, 6, 4]
    for p in (50, 90, 99, 100):
        assert out["a"]["p{}".format(p)] == disc(a, p), p
    assert out["b"]["p50"] == 20 and out["b"]["p100"] == 30
    assert out["c"]["p50"] == out["c"]["p99"] == 42
    assert out["a"]["n"] == 10


def test_group_quantiles_single_shuffle(spark):
    from picogeojson_spark.operators.stats import group_quantiles

    df = spark.createDataFrame([("a", 1), ("b", 2)], "g string, v long")
    plan = group_quantiles(df, "v", "g")._jdf.queryExecution() \
        .executedPlan().toString()
    half = plan.split("== Initial Plan ==")[0]
    assert half.count("Exchange") <= 1, half


def test_group_quantiles_validation(spark):
    import pytest as _pt
    from picogeojson_spark.operators.stats import group_quantiles

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with _pt.raises(ValueError):
        group_quantiles(df, "v", "g", (0,))
    with _pt.raises(ValueError):
        group_quantiles(df, "v", "g", ())


def test_cms_stream_equals_batch(spark, tmp_path):
    """cms_build is a plain explode+groupBy, so it runs UNCHANGED on a
    streaming DataFrame (the sketch is a linear projection — streaming
    partial aggregation merges counters exactly like the batch map-side
    combine). availableNow + complete-mode memory sink; stateless-shaped
    aggregation, terminates cleanly."""
    from picogeojson_spark.operators.sketches import cms_build

    d = str(tmp_path / "cms_docs")
    rows = [(i, "alpha beta " * (i % 5 + 1)) for i in range(200)]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    batch.write.mode("overwrite").parquet(d)

    stream_docs = spark.readStream.schema("doc_id long, text string").parquet(d)
    q = (
        cms_build(stream_docs, depth=3, width=8)
        .writeStream.outputMode("complete")
        .format("memory").queryName("cms_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = sorted(map(tuple, spark.sql(
        "select row_j, bucket, cnt from cms_stream_t").collect()))
    want = sorted(map(tuple,
                      cms_build(spark.read.parquet(d), depth=3, width=8)
                      .collect()))
    assert got == want and got
