"""ks_statistic: identical-distribution zero, disjoint-support 1e6,
textbook hand value, argmax location + tie determinism, empty-sample
NULL, python brute replay, other-label exclusion."""

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.evals import ks_statistic

pytestmark = pytest.mark.usefixtures("spark")


def _df(spark, rows):
    return spark.createDataFrame(rows, "sample string, score long")


def _py_ks(rows, a, b):
    sa = sorted(s for g, s in rows if g == a)
    sb = sorted(s for g, s in rows if g == b)
    if not sa or not sb:
        return None, None
    na, nb = len(sa), len(sb)
    best, at = -1, None
    for s in sorted({*sa, *sb}):
        ca = sum(1 for x in sa if x <= s)
        cb = sum(1 for x in sb if x <= s)
        d = abs(ca * nb - cb * na)
        if d > best:
            best, at = d, s
    return best * 10**6 // (na * nb), at


def test_identical_distributions_zero(spark):
    rows = [("a", s) for s in [1, 2, 3]] + [("b", s) for s in [1, 2, 3]]
    r = ks_statistic(_df(spark, rows), "a", "b").collect()[0]
    assert r.ks_ppm == 0 and (r.n_a, r.n_b) == (3, 3)


def test_disjoint_supports_full(spark):
    rows = [("a", s) for s in [1, 2]] + [("b", s) for s in [10, 11]]
    r = ks_statistic(_df(spark, rows), "a", "b").collect()[0]
    assert r.ks_ppm == 1000000 and r.ks_at == 2


def test_hand_value_and_location(spark):
    # a: 1,2,3,4 ; b: 3,4,5,6 -> max gap at s=2: |2*4 - 0*4|/16 = 0.5
    rows = [("a", s) for s in [1, 2, 3, 4]] + [
        ("b", s) for s in [3, 4, 5, 6]]
    r = ks_statistic(_df(spark, rows), "a", "b").collect()[0]
    assert r.ks_ppm == 500000 and r.ks_at == 2


def test_tie_takes_smallest_score(spark):
    # gap 1/2 achieved at both s=1 and s=2 -> report 1
    rows = [("a", 1), ("a", 3), ("b", 3), ("b", 3)]
    r = ks_statistic(_df(spark, rows), "a", "b").collect()[0]
    exp_ppm, exp_at = _py_ks(rows, "a", "b")
    assert r.ks_ppm == exp_ppm and r.ks_at == exp_at


def test_empty_sample_null(spark):
    rows = [("a", 1), ("a", 2)]
    r = ks_statistic(_df(spark, rows), "a", "b").collect()[0]
    assert r.ks_ppm is None and r.ks_at is None and r.n_b == 0


def test_other_labels_ignored(spark):
    rows = [("a", 1), ("b", 1), ("junk", 999)]
    r = ks_statistic(_df(spark, rows), "a", "b").collect()[0]
    assert r.ks_ppm == 0 and r.n_a == 1


def test_brute_differential(spark):
    rows = ([("a", (i * 7) % 19) for i in range(80)]
            + [("b", (i * 5 + 3) % 23) for i in range(60)])
    r = ks_statistic(_df(spark, rows), "a", "b").collect()[0]
    exp_ppm, exp_at = _py_ks(rows, "a", "b")
    assert (r.ks_ppm, r.ks_at) == (exp_ppm, exp_at)
