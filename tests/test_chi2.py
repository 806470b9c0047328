"""chi2_association: exact-scaled independence statistic on hand cases."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, rows):
    from picogeojson_spark.operators.stats import chi2_association

    df = spark.createDataFrame(rows, "a string, b string")
    [r] = chi2_association(df).collect()
    return r


def test_perfect_independence_is_zero(spark):
    rows = [(a, b) for a in "xy" for b in "pq" for _ in range(10)]
    r = _run(spark, rows)
    assert (r.n, r.r, r.c, r.dof) == (40, 2, 2, 1)
    assert r.chi2_ppm == 0 and r.v2_ppm == 0


def test_perfect_association_v2_is_one(spark):
    # diagonal 2x2: chi2 = n, V^2 = 1
    rows = [("x", "p")] * 7 + [("y", "q")] * 7
    r = _run(spark, rows)
    assert r.chi2_ppm == 14 * 1_000_000
    assert r.v2_ppm == 1_000_000


def test_hand_computed_2x2(spark):
    # cells 3/1/1/3: E = 2 everywhere, chi2 = 4 * (1^2/2) = 2
    rows = ([("x", "p")] * 3 + [("x", "q")]
            + [("y", "p")] + [("y", "q")] * 3)
    r = _run(spark, rows)
    assert r.n == 8 and r.dof == 1
    assert r.chi2_ppm == 2_000_000
    assert r.v2_ppm == 250_000  # V^2 = chi2 / (n * 1) = 0.25


def test_single_level_dimension_null_v2(spark):
    rows = [("x", "p")] * 4 + [("x", "q")] * 4
    r = _run(spark, rows)
    assert r.r == 1 and r.dof == 0
    assert r.chi2_ppm == 0 and r.v2_ppm is None


def test_scipy_free_3x2_reference(spark):
    # 3x2 table [[10, 20], [30, 10], [5, 5]]; chi2 computed by hand:
    # n=80, rows=(30,40,10), cols=(45,35)
    # sum O^2/(RC): 100/1350 + 400/1050 + 900/1800 + 100/1400
    #             + 25/450 + 25/350
    rows = ([("a", "p")] * 10 + [("a", "q")] * 20
            + [("b", "p")] * 30 + [("b", "q")] * 10
            + [("c", "p")] * 5 + [("c", "q")] * 5)
    r = _run(spark, rows)
    from fractions import Fraction as Fr
    s = (Fr(100, 1350) + Fr(400, 1050) + Fr(900, 1800)
         + Fr(100, 1400) + Fr(25, 450) + Fr(25, 350))
    chi2 = 80 * s - 80
    expect_ppm = int(chi2 * 1_000_000)
    # per-cell 1e-12 floors can shave at most a few ppm
    assert abs(r.chi2_ppm - expect_ppm) <= 6
    assert r.dof == 2
