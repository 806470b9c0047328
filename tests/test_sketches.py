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


# ------------------------------------------------------------ hyperloglog

def test_hll_registers_match_python_replay(spark):
    """The register table is a pure function of the value set: replicate
    bucket/rho in plain Python (hashlib md5, integer bit ops) and compare."""
    import hashlib

    from picogeojson_spark.operators.sketches import hll_build

    vals = ["u{}".format(i) for i in range(200)]
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v string")
    got = {
        (r["bucket"], ): r["max_rho"]
        for r in hll_build(df, ["grp"], "v", p=6).collect()
    }

    p, rem_bits = 6, 54
    want = {}
    for v in vals:
        h = int(hashlib.md5(("hll:" + v).encode()).hexdigest()[:15], 16)
        bucket, rem = h >> rem_bits, h % (1 << rem_bits)
        rho = (rem_bits + 1) if rem == 0 \
            else rem_bits + 1 - rem.bit_length()
        want[(bucket,)] = max(want.get((bucket,), 0), rho)
    assert got == want


def test_hll_mergeable_and_bounded(spark):
    """Registers merge by max (union shards, re-aggregate) and the sketch
    is bounded at 2^p rows per group regardless of input size."""
    from pyspark.sql import functions as F

    from picogeojson_spark.operators.sketches import hll_build, hll_estimate

    df = spark.createDataFrame(
        [("g", "u{}".format(i)) for i in range(500)], "grp string, v string")
    whole = hll_build(df, ["grp"], "v", p=5)
    assert whole.count() <= 32
    a = hll_build(df.filter("substring(v, 2, 9) % 2 = 0"), ["grp"], "v", p=5)
    b = hll_build(df.filter("substring(v, 2, 9) % 2 = 1"), ["grp"], "v", p=5)
    merged = (a.unionByName(b).groupBy("grp", "bucket")
              .agg(F.max("max_rho").alias("max_rho")))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))
    est_w = hll_estimate(whole, ["grp"], p=5).collect()[0]["est"]
    est_m = hll_estimate(merged, ["grp"], p=5).collect()[0]["est"]
    assert est_w == est_m


def test_hll_estimate_accuracy(spark):
    """p=6 (m=64) raw estimator sigma ~= 1.04/sqrt(64) = 13%; assert a
    generous 3-sigma band at three cardinalities spanning the linear-
    counting and raw regimes."""
    from picogeojson_spark.operators.sketches import hll_distinct

    for n in (20, 300, 3000):
        df = spark.createDataFrame(
            [("g", "user-{}".format(i)) for i in range(n)],
            "grp string, v string")
        est = hll_distinct(df, ["grp"], "v", p=6).collect()[0]["est"]
        assert abs(est - n) <= max(0.4 * n, 8), (n, est)


def test_hll_matches_duckdb_replay(spark):
    import duckdb

    from picogeojson_spark.operators.sketches import (
        hll_distinct,
        hll_oracle_sql,
    )

    rows = [("a", "u{}".format(i)) for i in range(137)] + \
           [("b", "u{}".format(i)) for i in range(7)]
    df = spark.createDataFrame(rows, "grp string, v string")
    con = duckdb.connect()
    con.register("vals", df.toPandas())
    want = con.execute(
        hll_oracle_sql("SELECT grp, v FROM vals", "grp", "v", p=6)).df()
    got = (hll_distinct(df, ["grp"], "v", p=6).orderBy("grp").toPandas())
    assert list(got["grp"]) == list(want["grp"])
    assert list(got["v_zero"]) == list(want["v_zero"])
    assert list(got["est"]) == list(want["est"])


def test_hll_invalid_p(spark):
    import pytest as _pytest

    from picogeojson_spark.operators.sketches import hll_build

    df = spark.createDataFrame([("g", "x")], "grp string, v string")
    with _pytest.raises(ValueError):
        hll_build(df, ["grp"], "v", p=3)
    with _pytest.raises(ValueError):
        hll_build(df, ["grp"], "v", p=9)


def test_hll_stream_equals_batch(spark, tmp_path):
    """hll_build is a narrow projection + max-aggregate, so it runs
    UNCHANGED on a streaming DataFrame (registers merge by max exactly
    like the batch map-side combine). availableNow + complete-mode
    memory sink."""
    from picogeojson_spark.operators.sketches import hll_build

    d = str(tmp_path / "hll_vals")
    rows = [("g{}".format(i % 3), "user-{}".format(i)) for i in range(300)]
    batch = spark.createDataFrame(rows, "grp string, v string")
    batch.write.mode("overwrite").parquet(d)

    stream = spark.readStream.schema("grp string, v string").parquet(d)
    q = (
        hll_build(stream, ["grp"], "v", p=5)
        .writeStream.outputMode("complete")
        .format("memory").queryName("hll_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = sorted(map(tuple, spark.sql(
        "select grp, bucket, max_rho from hll_stream_t").collect()))
    want = sorted(map(tuple,
                      hll_build(spark.read.parquet(d), ["grp"], "v", p=5)
                      .collect()))
    assert got == want and got


# --------------------------------------------------------- table profile

def test_table_profile_known_values(spark):
    from picogeojson_spark.operators.profile import table_profile

    rows = [(1, "a"), (2, "b"), (2, None), (9, "a"), (None, "c")]
    df = spark.createDataFrame(rows, "k long, s string")
    got = {r["column"]: r for r in table_profile(df, ["k", "s"]).collect()}
    k, s = got["k"], got["s"]
    assert k["n_rows"] == s["n_rows"] == 5
    assert (k["n_nulls"], k["min_s"], k["max_s"]) == (1, "1", "9")
    assert (s["n_nulls"], s["min_s"], s["max_s"]) == (1, "a", "c")
    # small cardinalities hit the linear-counting branch: exact
    assert k["ndv_est"] == 3 and s["ndv_est"] == 3


def test_table_profile_all_null_column(spark):
    from picogeojson_spark.operators.profile import table_profile

    df = spark.createDataFrame([(1, None), (2, None)],
                               "k long, s string")
    got = {r["column"]: r for r in table_profile(df, ["s"]).collect()}
    s = got["s"]
    assert (s["n_nulls"], s["min_s"], s["max_s"]) == (2, None, None)
    assert s["ndv_est"] == 0 and s["v_zero"] == 64


def test_table_profile_numeric_min_is_native_not_lexicographic(spark):
    from picogeojson_spark.operators.profile import table_profile

    df = spark.createDataFrame([(9,), (10,), (100,)], "k long")
    r = table_profile(df, ["k"]).collect()[0]
    assert (r["min_s"], r["max_s"]) == ("9", "100")  # not "10"/"9"


def _qs_expected(pairs, k, pcts=(1, 5, 25, 50, 75, 95, 99), salt="qs"):
    import hashlib

    hk = {key: int(hashlib.md5(
        ("%s:%d" % (salt, key)).encode()).hexdigest()[:8], 16)
        for _, key in pairs}
    samp = sorted(pairs, key=lambda p: hk[p[1]])[:k]
    byv = sorted((v, hk[key]) for v, key in samp)
    n = len(byv)
    return [(p, byv[(p * n + 99) // 100 - 1][0], n) for p in sorted(pcts)]


def test_quantile_sketch_python_replay(spark):
    from picogeojson_spark.operators.sketches import quantile_sketch

    pairs = [((i * 37) % 1000 + 3, i) for i in range(500)]
    df = spark.createDataFrame(pairs, "v long, key long")
    out = [(r.pctl, r.est_value, r.sample_n)
           for r in quantile_sketch(df, "v", "key", k=32)
           .orderBy("pctl").collect()]
    assert out == _qs_expected(pairs, 32)


def test_quantile_sketch_small_corpus_exact(spark):
    from picogeojson_spark.operators.sketches import quantile_sketch

    pairs = [(v, v) for v in range(1, 11)]
    df = spark.createDataFrame(pairs, "v long, key long")
    out = {r.pctl: (r.est_value, r.sample_n)
           for r in quantile_sketch(df, "v", "key", k=64).collect()}
    # n=10 < k: the sketch is exact; rank(50) = (500+99)//100 = 5
    assert out[50] == (5, 10)
    assert out[99] == (10, 10)
    assert out[1] == (1, 10)


def test_quantile_sketch_mergeable(spark):
    from picogeojson_spark.operators.sketches import quantile_sketch
    import hashlib

    pairs = [((i * 91) % 777, i) for i in range(400)]
    hk = {key: int(hashlib.md5(b"qs:%d" % key).hexdigest()[:8], 16)
          for _, key in pairs}
    half1, half2 = pairs[:200], pairs[200:]
    keep = set()
    for half in (half1, half2):
        keep |= {key for _, key in sorted(half,
                                          key=lambda p: hk[p[1]])[:32]}
    df_full = spark.createDataFrame(pairs, "v long, key long")
    df_merged = spark.createDataFrame(
        [p for p in pairs if p[1] in keep], "v long, key long")
    a = quantile_sketch(df_full, "v", "key", k=32).orderBy("pctl").collect()
    b = quantile_sketch(df_merged, "v", "key", k=32) \
        .orderBy("pctl").collect()
    assert a == b


def test_quantile_sketch_plan_is_bottom_k(spark):
    from picogeojson_spark.operators.sketches import quantile_sketch

    df = spark.range(1000).selectExpr("id as v", "id as key")
    plan = quantile_sketch(df, "v", "key", k=16) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no global sort anywhere


def test_quantile_sketch_validation(spark):
    from picogeojson_spark.operators.sketches import quantile_sketch
    import pytest as _pytest

    df = spark.range(3).selectExpr("id as v", "id as key")
    with _pytest.raises(ValueError):
        quantile_sketch(df, "v", "key", k=0)
    with _pytest.raises(ValueError):
        quantile_sketch(df, "v", "key", pcts=(0,))
