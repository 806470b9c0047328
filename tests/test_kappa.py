"""cohen_kappa: chance-corrected agreement on hand cases."""

from fractions import Fraction as Fr

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, pairs):
    from picogeojson_spark.operators.evals import cohen_kappa

    df = spark.createDataFrame(pairs, "label string, pred string")
    [r] = cohen_kappa(df).collect()
    return r


def _expect_ppm(pairs):
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    rows, cols = {}, {}
    for a, b in pairs:
        rows[a] = rows.get(a, 0) + 1
        cols[b] = cols.get(b, 0) + 1
    pe = sum(rows[c] * cols.get(c, 0) for c in rows)
    den = n * n - pe
    if den == 0:
        return None
    import math
    return math.floor(Fr(1_000_000 * (n * agree - pe), den))


def test_perfect_agreement(spark):
    pairs = [("a", "a")] * 3 + [("b", "b")] * 5
    r = _run(spark, pairs)
    assert r.kappa_ppm == 1_000_000
    assert r.po_ppm == 1_000_000


def test_textbook_2x2(spark):
    # classic example: 20 a/a, 5 a/b, 10 b/a, 15 b/b
    pairs = ([("a", "a")] * 20 + [("a", "b")] * 5
             + [("b", "a")] * 10 + [("b", "b")] * 15)
    r = _run(spark, pairs)
    assert r.kappa_ppm == _expect_ppm(pairs)
    assert r.n == 50 and r.agree == 35


def test_below_chance_negative_floor(spark):
    # systematic disagreement -> negative kappa; floor, not truncate
    pairs = [("a", "b")] * 7 + [("b", "a")] * 3 + [("a", "a")] * 1
    r = _run(spark, pairs)
    exp = _expect_ppm(pairs)
    assert exp < 0
    assert r.kappa_ppm == exp


def test_single_class_undefined(spark):
    r = _run(spark, [("a", "a")] * 5)
    assert r.kappa_ppm is None


def test_disjoint_label_sets_pe_zero(spark):
    # preds never equal labels and classes don't overlap: pe = 0,
    # kappa = agree/n = 0 -> kappa_ppm = 0
    pairs = [("a", "x")] * 4
    r = _run(spark, pairs)
    assert r.pe_ppm == 0 and r.kappa_ppm == 0
