"""hll_overlap: set-algebra identities on known sets."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, a, b, p=6):
    from picogeojson_spark.operators.sketches import hll_overlap

    da = spark.createDataFrame([(x,) for x in a], "user_id long")
    db = spark.createDataFrame([(x,) for x in b], "user_id long")
    return hll_overlap(da, db, "user_id", p=p).collect()[0]


def test_identical_sets(spark):
    r = _run(spark, range(300), range(300))
    # A == B -> union registers == A registers -> identical estimates
    assert r.est_a == r.est_b == r.est_union
    assert r.est_inter == r.est_a
    assert r.exact_inter == 300


def test_disjoint_sets(spark):
    r = _run(spark, range(200), range(10_000, 10_200))
    assert r.exact_inter == 0
    # union of disjoint sets estimates near |A|+|B|; inclusion-exclusion
    # then stays near 0 (floored) — allow register noise
    assert r.est_inter <= (r.est_a + r.est_b) * 0.35
    assert r.est_union > max(r.est_a, r.est_b)


def test_half_overlap_reasonable(spark):
    r = _run(spark, range(400), range(200, 600))
    assert r.exact_inter == 200
    # p=6 is a ~13% sketch amplified by inclusion-exclusion; just pin the
    # sign and a generous band
    assert 0 < r.est_inter < 3 * 200
    assert r.est_union < r.est_a + r.est_b
