"""kmv_overlap pins: exact mode (n < k), python replay of the estimator,
identical-sets and disjoint-sets identities, plan shape (no global sort).
"""

import hashlib

from pyspark.sql import functions as F

from picogeojson_spark.operators.sketches import kmv_overlap


def _hk(v, salt="kmv"):
    return int(hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:8], 16)


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


def test_kmv_exact_mode_small_sets(spark):
    a = _df(spark, ["x", "y", "z", "x"])          # 3 distinct
    b = _df(spark, ["y", "z", "w"])               # 3 distinct, 2 shared
    r = kmv_overlap(a, b, "v", k=64).collect()[0]
    assert r.sample_n == 4 and r.union_est == 4
    assert r.overlap_n == 2 and r.inter_est == 2
    assert r.jaccard_ppm == 2 * 1000000 // 4


def test_kmv_identical_and_disjoint(spark):
    vals = [f"u{i}" for i in range(40)]
    a = _df(spark, vals)
    r = kmv_overlap(a, _df(spark, vals), "v", k=16).collect()[0]
    assert r.sample_n == 16 and r.overlap_n == 16
    assert r.jaccard_ppm == 1000000
    d = kmv_overlap(a, _df(spark, [f"w{i}" for i in range(40)]),
                    "v", k=16).collect()[0]
    assert d.overlap_n == 0 and d.inter_est == 0 and d.jaccard_ppm == 0


def test_kmv_python_replay_estimation_mode(spark):
    """k < |union|: replay the whole estimator in python, bit for bit."""
    k = 8
    va = [f"a{i}" for i in range(30)] + [f"c{i}" for i in range(20)]
    vb = [f"b{i}" for i in range(25)] + [f"c{i}" for i in range(20)]
    sa = sorted(_hk(v) for v in set(va))[:k]
    sb = sorted(_hk(v) for v in set(vb))[:k]
    flags = {}
    for h in sa:
        flags[h] = (1, flags.get(h, (0, 0))[1])
    for h in sb:
        flags[h] = (flags.get(h, (0, 0))[0], 1)
    u = sorted(flags)[:k]
    n, kth = len(u), max(u)
    ovl = sum(1 for h in u if flags[h] == (1, 1))
    union_est = n if n < k else ((k - 1) * (1 << 32)) // kth
    r = kmv_overlap(_df(spark, va), _df(spark, vb), "v", k=k).collect()[0]
    assert (r.sample_n, r.kth_hash, r.overlap_n) == (n, kth, ovl)
    assert r.union_est == union_est
    assert r.inter_est == (ovl * union_est) // n
    assert r.jaccard_ppm == (ovl * 1000000) // n


def test_kmv_plan_no_global_sort(spark):
    a = _df(spark, ["x"])
    plan = kmv_overlap(a, a, "v", k=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
