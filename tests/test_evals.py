"""auc_exact + calibration_bins: hand-computed AUC incl. ties, perfect /
inverted / random classifiers, sklearn-free python replay, degenerate
one-class input, bin edges and clamping, negative-range means."""

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.evals import auc_exact, calibration_bins

pytestmark = pytest.mark.usefixtures("spark")


def _df(spark, rows):
    return spark.createDataFrame(rows, "score long, label boolean")


def _py_auc_ppm(rows):
    pos = sorted(s for s, y in rows if y)
    neg = sorted(s for s, y in rows if not y)
    if not pos or not neg:
        return None
    u2 = 0
    for p in pos:
        for q in neg:
            u2 += 2 if p > q else (1 if p == q else 0)
    return u2 * 1000000 // (2 * len(pos) * len(neg))


def test_perfect_and_inverted(spark):
    perfect = [(10, True), (11, True), (1, False), (2, False)]
    r = auc_exact(_df(spark, perfect)).collect()[0]
    assert (r.n_pos, r.n_neg, r.auc_ppm) == (2, 2, 1000000)
    inverted = [(s, not y) for s, y in perfect]
    assert auc_exact(_df(spark, inverted)).collect()[0].auc_ppm == 0


def test_all_tied_is_half(spark):
    rows = [(5, True)] * 3 + [(5, False)] * 4
    r = auc_exact(_df(spark, rows)).collect()[0]
    assert r.auc_ppm == 500000


def test_hand_case_with_ties(spark):
    rows = [(1, False), (2, False), (2, True), (3, True), (3, False),
            (4, True)]
    r = auc_exact(_df(spark, rows)).collect()[0]
    assert r.auc_ppm == _py_auc_ppm(rows)


def test_python_brute_replay(spark):
    rows = [((i * 7) % 23 + (3 if i % 3 == 0 else 0), i % 3 == 0)
            for i in range(200)]
    r = auc_exact(_df(spark, rows)).collect()[0]
    assert r.auc_ppm == _py_auc_ppm(rows)
    assert r.n_pos == sum(1 for _, y in rows if y)


def test_one_class_returns_null(spark):
    r = auc_exact(_df(spark, [(1, True), (2, True)])).collect()[0]
    assert r.auc_ppm is None and r.n_neg == 0


def test_no_row_level_sort_in_plan(spark):
    df = _df(spark, [(1, True), (2, False)])
    plan = auc_exact(df)._jdf.queryExecution().executedPlan().toString()
    # the only window runs over the histogram aggregate, never raw rows:
    # a Sort may appear but only AFTER the first HashAggregate
    agg_pos = plan.rfind("HashAggregate")
    assert agg_pos != -1
    assert "CartesianProduct" not in plan and "Join" not in plan


def test_calibration_bins_edges_and_clamp(spark):
    rows = [(0, False), (9, False), (10, True), (99, True), (100, True),
            (-5, False), (250, True)]
    got = {r.bin: r for r in calibration_bins(
        _df(spark, rows), lo=0, hi=99, n_bins=10).collect()}
    assert got[0].n == 3            # 0, 9, and -5 clamped to 0
    assert got[1].n == 1            # 10
    assert got[9].n == 3            # 99 + clamped 100, 250
    assert got[9].n_pos == 3 and got[9].pos_rate_ppm == 1000000


def test_calibration_mean_negative_range(spark):
    rows = [(-10, False), (-9, False)]
    got = calibration_bins(_df(spark, rows), lo=-10, hi=-1,
                           n_bins=2).collect()
    r = got[0]
    # mean of -10, -9 floors to -9500 milli
    assert r.mean_score_milli == -9500 and r.bin == 0


def test_calibration_validates(spark):
    with pytest.raises(ValueError):
        calibration_bins(_df(spark, [(1, True)]), lo=5, hi=5)
