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


def test_histogram_finalize_beyond_int64_scale(spark):
    # ADVICE r4 (medium): u2 * 1e6 overflowed int64 once n_pos * n_neg
    # exceeded ~4.6e12.  Feed a merged histogram with 10^9-scale counts
    # (n_pos * n_neg = 1e18, u2 near 2e18) through the decimal path and
    # check against exact python integer math.
    from picogeojson_spark.operators.evals import auc_from_histogram

    n = 1_000_000_000
    hist = spark.createDataFrame(
        [(1, 0, n), (2, n // 2, n // 4), (3, n - n // 2, 0)],
        "s long, n1 long, n0 long")
    r = auc_from_histogram(hist).collect()[0]
    # python replay on the histogram
    rows = [(1, 0, n), (2, n // 2, n // 4), (3, n - n // 2, 0)]
    n0_below = 0
    u2 = 0
    for s, n1, n0 in rows:  # already score-ascending
        u2 += n1 * (2 * n0_below + n0)
        n0_below += n0
    n_pos = sum(r_[1] for r_ in rows)
    n_neg = sum(r_[2] for r_ in rows)
    assert u2 * 1_000_000 > 2**63  # the old spelling would overflow/throw
    assert (r.n_pos, r.n_neg) == (n_pos, n_neg)
    assert r.auc_ppm == u2 * 1_000_000 // (2 * n_pos * n_neg)


def test_histogram_merge_then_finalize(spark):
    # mergeable-sketch shape: per-shard histograms union + re-agg ==
    # whole-corpus auc_exact
    from picogeojson_spark.operators.evals import auc_from_histogram

    rows = [((i * 5) % 11, i % 4 == 0) for i in range(120)]
    whole = auc_exact(_df(spark, rows)).collect()[0]
    half_a, half_b = rows[:60], rows[60:]

    def hist(part):
        return (_df(spark, part).groupBy(F.col("score").alias("s")).agg(
            F.sum(F.when(F.col("label"), 1).otherwise(0)).cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("label"), 0).otherwise(1)).cast("long")
            .alias("n0")))

    merged = (hist(half_a).unionByName(hist(half_b)).groupBy("s")
              .agg(F.sum("n1").cast("long").alias("n1"),
                   F.sum("n0").cast("long").alias("n0")))
    got = auc_from_histogram(merged).collect()[0]
    assert (got.n_pos, got.n_neg, got.auc_ppm) == (
        whole.n_pos, whole.n_neg, whole.auc_ppm)


# ---------------------------------------------------------------------------
# Ranking metrics: ndcg_at_k / rank_at_k
# ---------------------------------------------------------------------------

def test_ndcg_hand_computed(spark):
    from picogeojson_spark.operators.evals import (
        _log2_discounts_ppb, ndcg_at_k)

    rows = [  # (query_id, doc_id, score, rel)
        (1, 1, 10, 3), (1, 2, 9, 0), (1, 3, 8, 2), (1, 4, 7, 1),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, score long, rel int")
    out = ndcg_at_k(df, k=3).collect()
    assert len(out) == 1
    d = _log2_discounts_ppb(3)
    dcg = 7 * d[0] + 0 * d[1] + 3 * d[2]
    idcg = 7 * d[0] + 3 * d[1] + 1 * d[2]
    r = out[0]
    assert (r.dcg, r.idcg) == (dcg, idcg)
    assert r.ndcg_ppm == dcg * 1000000 // idcg


def test_ndcg_perfect_ranking_is_1(spark):
    from picogeojson_spark.operators.evals import ndcg_at_k

    rows = [(1, 1, 9, 3), (1, 2, 8, 2), (1, 3, 7, 1)]
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, score long, rel int")
    assert ndcg_at_k(df, k=3).collect()[0].ndcg_ppm == 1000000


def test_ndcg_all_zero_rel_null(spark):
    from picogeojson_spark.operators.evals import ndcg_at_k

    rows = [(1, 1, 9, 0), (1, 2, 8, 0)]
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, score long, rel int")
    r = ndcg_at_k(df, k=3).collect()[0]
    assert (r.dcg, r.idcg, r.ndcg_ppm) == (0, 0, None)


def test_rank_at_k_hand_computed(spark):
    from picogeojson_spark.operators.evals import rank_at_k

    rows = [  # ranks by score desc: rel at ranks 2 and 5
        (1, 1, 10, False), (1, 2, 9, True), (1, 3, 8, False),
        (1, 4, 7, False), (1, 5, 6, True),
        # query 2: nothing relevant
        (2, 6, 5, False), (2, 7, 4, False),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, score long, relevant boolean")
    out = {r.query_id: r for r in rank_at_k(df, k=3).collect()}
    q1 = out[1]
    assert (q1.hits_k, q1.n_rel) == (1, 2)
    assert q1.p_at_k_ppm == 1000000 // 3
    assert q1.r_at_k_ppm == 500000
    assert q1.rr_ppm == 500000
    q2 = out[2]
    assert (q2.hits_k, q2.n_rel) == (0, 0)
    assert (q2.r_at_k_ppm, q2.rr_ppm) == (None, None)
    assert q2.p_at_k_ppm == 0


def test_rank_at_k_tie_break_by_id(spark):
    from picogeojson_spark.operators.evals import rank_at_k

    # equal scores: doc_id ASC decides the ranking — relevant doc_id=1
    # sits at rank 1 regardless of row order.
    rows = [(1, 2, 5, False), (1, 1, 5, True)]
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, score long, relevant boolean")
    assert rank_at_k(df, k=1).collect()[0].rr_ppm == 1000000


# ---------------------------------------------------------------- pr_curve


def _py_pr(rows, ts):
    out = {}
    for t in sorted(set(ts)):
        tp = sum(1 for s, y in rows if y and s >= t)
        fp = sum(1 for s, y in rows if not y and s >= t)
        fn = sum(1 for s, y in rows if y and s < t)
        tn = sum(1 for s, y in rows if not y and s < t)
        p = tp * 1000000 // (tp + fp) if tp + fp else None
        r = tp * 1000000 // (tp + fn) if tp + fn else None
        f1 = (2 * tp * 1000000 // (2 * tp + fp + fn)
              if 2 * tp + fp + fn else None)
        out[t] = (tp, fp, fn, tn, p, r, f1)
    return out


def _run_pr(spark, rows, ts):
    from picogeojson_spark.operators.evals import pr_curve

    got = pr_curve(_df(spark, rows), thresholds=ts).collect()
    return {r.threshold: (r.tp, r.fp, r.fn, r.tn, r.precision_ppm,
                          r.recall_ppm, r.f1_ppm) for r in got}


def test_pr_curve_hand_case(spark):
    rows = [(5, True), (4, True), (3, False), (2, True), (1, False)]
    got = _run_pr(spark, rows, [3, 5])
    # t=3: predict {5,4,3}: tp=2 fp=1 fn=1 tn=1
    assert got[3] == (2, 1, 1, 1, 666666, 666666, 666666)
    # t=5: predict {5}: tp=1 fp=0 fn=2 tn=2 -> perfect precision
    assert got[5] == (1, 0, 2, 2, 1000000, 333333, 500000)


def test_pr_curve_brute_differential_with_ties(spark):
    rows = [((i * 7) % 13, (i * 3) % 5 < 2) for i in range(200)]
    ts = [0, 1, 4, 7, 12, 13, 99]
    assert _run_pr(spark, rows, ts) == _py_pr(rows, ts)


def test_pr_curve_null_guards(spark):
    # threshold above every score -> nothing predicted -> precision NULL;
    # no positive labels anywhere -> recall NULL at every threshold.
    rows = [(1, False), (2, False)]
    got = _run_pr(spark, rows, [0, 10])
    assert got[10] == (0, 0, 0, 2, None, None, None)
    assert got[0][4] == 0 and got[0][5] is None  # p=0/2=0, r NULL


def test_pr_curve_monotone_recall_and_validation(spark):
    rows = [((i * 11) % 17, i % 3 == 0) for i in range(120)]
    got = _run_pr(spark, rows, [2, 5, 9, 14])
    recalls = [got[t][5] for t in (2, 5, 9, 14)]
    assert recalls == sorted(recalls, reverse=True)  # recall non-increasing
    import pytest as _pt

    from picogeojson_spark.operators.evals import pr_curve

    with _pt.raises(ValueError):
        pr_curve(_df(spark, rows), thresholds=[])
