"""mcc_signed: exact signed-MCC² on hand confusion tables."""

import math
from fractions import Fraction as Fr

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, tp, tn, fp, fn):
    from picogeojson_spark.operators.evals import mcc_signed

    rows = ([(True, True)] * tp + [(False, False)] * tn
            + [(False, True)] * fp + [(True, False)] * fn)
    df = spark.createDataFrame(rows, "label boolean, pred boolean")
    [r] = mcc_signed(df).collect()
    return r


def _expect(tp, tn, fp, fn):
    num = tp * tn - fp * fn
    den = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    if den == 0:
        return None
    sign = -1 if num < 0 else 1
    return sign * math.floor(Fr(1_000_000 * num * num, den))


def test_perfect_classifier(spark):
    r = _run(spark, 10, 20, 0, 0)
    assert r.mcc2_signed_ppm == 1_000_000


def test_perfect_inversion(spark):
    r = _run(spark, 0, 0, 10, 20)
    assert r.mcc2_signed_ppm == -1_000_000


def test_chance_level_zero(spark):
    # independent: tp*tn == fp*fn
    r = _run(spark, 4, 4, 4, 4)
    assert r.mcc2_signed_ppm == 0


def test_hand_value_replay(spark):
    args = (17, 23, 5, 9)
    r = _run(spark, *args)
    assert (r.tp, r.tn, r.fp, r.fn) == args
    assert r.mcc2_signed_ppm == _expect(*args)


def test_zero_margin_null(spark):
    # no positive predictions: tp+fp = 0 -> undefined
    r = _run(spark, 0, 9, 0, 3)
    assert r.mcc2_signed_ppm is None
