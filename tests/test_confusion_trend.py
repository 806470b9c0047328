"""confusion_metrics + group_trend: hand cases and brute differentials."""

from pyspark.sql import functions as F

from picogeojson_spark.operators.evals import confusion_metrics
from picogeojson_spark.operators.forecast import group_trend


# ----------------------------------------------------------- confusion

def _conf(spark, pairs):
    df = spark.createDataFrame(pairs, "label long, pred long")
    got = confusion_metrics(df).collect()
    return {r["class"]: (r.tp, r.fp, r.fn, r.n_true, r.n_pred,
                         r.precision_ppm, r.recall_ppm, r.f1_ppm)
            for r in got}


def test_confusion_hand_case(spark):
    pairs = [(0, 0), (0, 0), (0, 1), (1, 1), (1, 0), (2, 2)]
    got = _conf(spark, pairs)
    # class 0: tp=2 fp=1 fn=1 -> P=2/3, R=2/3, F1=2/3
    assert got[0] == (2, 1, 1, 3, 3, 666666, 666666, 666666)
    assert got[1] == (1, 1, 1, 2, 2, 500000, 500000, 500000)
    assert got[2] == (1, 0, 0, 1, 1, 1000000, 1000000, 1000000)


def test_confusion_never_predicted_and_never_true(spark):
    # class 3 never predicted; class 9 only predicted.
    pairs = [(3, 9), (3, 9), (9, 9)]
    got = _conf(spark, pairs)
    assert got[3] == (0, 0, 2, 2, 0, None, 0, 0)
    # class 9: tp=1 fp=2 fn=0 -> P=1/3, R=1, F1=2/(2+2)=0.5
    assert got[9] == (1, 2, 0, 1, 3, 333333, 1000000, 500000)


def test_confusion_f1_from_counts_not_rounded_pr(spark):
    # tp=1 fp=2 fn=0: harmonic of rounded P/R would drift; counts give
    # 2*1e6*1 // (2+2+0) = 500000 exactly.
    assert _conf(spark, [(1, 1), (0, 1), (0, 1), (0, 0)])[1][7] == 500000


# --------------------------------------------------------------- trend

def _trend(spark, rows):
    df = spark.createDataFrame(rows, "key string, x long, y long")
    got = group_trend(df).collect()
    return {r.key: (r.n, r.sum_x, r.sum_y, r.sum_xy, r.sum_xx,
                    r.slope_ppm) for r in got}


def test_trend_exact_up_down_flat(spark):
    rows = ([("up", x, 10 + 3 * x) for x in range(5)]
            + [("down", x, 100 - 7 * x) for x in range(5)]
            + [("flat", x, 42) for x in range(5)])
    got = _trend(spark, rows)
    assert got["up"][5] == 3_000_000
    assert got["down"][5] == -7_000_000     # negative floor exact
    assert got["flat"][5] == 0


def test_trend_negative_floor_not_truncation(spark):
    # slope -1/3: floor(-1e6/3) = -333334 (truncation would say -333333).
    rows = [("k", 0, 1), ("k", 3, 0)]
    assert _trend(spark, rows)["k"][5] == -333_334


def test_trend_no_variance_null(spark):
    got = _trend(spark, [("a", 5, 1), ("a", 5, 2), ("b", 1, 9)])
    assert got["a"][5] is None and got["b"][5] is None


def test_trend_brute_differential(spark):
    rows = [("g%d" % (i % 3), i // 3, (i * 37) % 50 - 20)
            for i in range(60)]
    got = _trend(spark, rows)
    from collections import defaultdict

    by = defaultdict(list)
    for k, x, y in rows:
        by[k].append((x, y))
    for k, pts in by.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        want = 10**6 * (n * sxy - sx * sy) // (n * sxx - sx * sx)
        assert got[k] == (n, sx, sy, sxy, sxx, want), k
