"""Model-evaluation metrics at corpus scale — exact, sort-free.

The quality-classifier feedback loop of a training-data pipeline needs
AUC and calibration over billions of scored rows.  The textbook AUC
computation (global rank of every row) is a single-task sort at scale;
this module uses the engine's histogram construction instead: integer
scores have bounded cardinality, so ALL rank information lives in the
(score -> pos/neg counts) histogram.  One corpus-sized map-side-combined
aggregate, then score-cardinality-sized windows — never a global sort of
rows, never a collect.

Exactness: the Mann-Whitney U statistic is computed DOUBLED
(ties contribute n1*n0, not n1*n0/2) so everything stays integer;
``auc_ppm = (1e6 * U2) // (2 * n_pos * n_neg)`` — integer division, both
engines round identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def auc_exact(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Exact ROC-AUC of an integer score against a boolean label.

    AUC = P(score_pos > score_neg) + P(score_pos == score_neg)/2, the
    Mann-Whitney statistic with the standard tie correction.  Output is
    ONE row: ``n_pos, n_neg, auc_ppm``.

    Plan: ONE corpus aggregate to the score histogram; an unpartitioned
    running-sum window over the HISTOGRAM (bounded by score cardinality —
    the sample_temperature/RFM histogram-percentile justification, never
    over rows); one final 1-row aggregate.  U2 folds inside the same
    final aggregate, so no scalar join is needed.
    """
    lbl = F.col(label_col).cast("boolean")
    hist = (
        df.select(F.col(score_col).alias("s"), lbl.alias("y"))
        .groupBy("s")
        .agg(
            F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("y"), 0).otherwise(1)).cast("long")
            .alias("n0"),
        )
    )
    return auc_from_histogram(hist)


def auc_from_histogram(hist: DataFrame) -> DataFrame:
    """Finalize AUC from a ``(s, n1, n0)`` score histogram (positives /
    negatives per score value).  Split out of :func:`auc_exact` so that
    pre-aggregated or MERGED histograms (the mergeable-sketch shape:
    union per-shard histograms, re-groupBy ``s``, sum) finalize through
    the same exact integer path — and so the >int64 count regime is
    directly testable."""
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    ranked = hist.withColumn(
        "n0_below", (F.sum("n0").over(w) - F.col("n0")).cast("long"))
    # each positive at score s beats n0_below negatives (weight 2) and
    # ties n0(s) negatives (weight 1)
    out = ranked.agg(
        F.sum("n1").cast("long").alias("n_pos"),
        F.sum("n0").cast("long").alias("n_neg"),
        F.sum(F.col("n1") * (2 * F.col("n0_below") + F.col("n0")))
        .cast("long").alias("u2"),
    )
    # The scaled division runs in decimal(38,0): u2 <= 2*n_pos*n_neg, so
    # u2 * 1e6 overflows int64 once n_pos*n_neg exceeds ~4.6e12 (about
    # 2.1M x 2.1M) — far below this module's scale claim.  Spark's div on
    # decimals returns the exact bigint integral quotient (probed), which
    # is the same floor DuckDB computes on its HUGEINT side, so the
    # engines stay exact up to the int64 bound of 2*n_pos*n_neg itself.
    return out.select(
        "n_pos", "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr("div(cast(u2 as decimal(38,0)) * 1000000, "
                   "2 * cast(n_pos as decimal(38,0)) * n_neg)"),
        ).otherwise(F.lit(None)).cast("long").alias("auc_ppm"),
    )


def calibration_bins(
    df: DataFrame,
    lo: int,
    hi: int,
    n_bins: int = 10,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Reliability-diagram bins for an integer score in ``[lo, hi]``:
    per bin, row count, positives, mean score (milli) and positive rate
    (ppm) — all integer (sums and floor divisions on non-negative
    operands after the ``- lo`` shift).  Out-of-range scores clamp into
    the edge bins.  ONE map-side-combined aggregate; output is
    ``n_bins``-sized."""
    if hi <= lo or n_bins < 1:
        raise ValueError("need hi > lo and n_bins >= 1")
    span = hi - lo + 1
    clamped = "greatest({lo}L, least({hi}L, cast({c} as long)))".format(
        lo=int(lo), hi=int(hi), c=score_col)
    bin_c: Column = F.expr(
        "div(({s} - {lo}) * {nb}, {span})".format(
            s=clamped, lo=int(lo), nb=int(n_bins), span=int(span)))
    lbl = F.col(label_col).cast("boolean")
    return (
        df.select(bin_c.cast("int").alias("bin"),
                  # shift to non-negative so the mean's floor division is
                  # engine-exact even for negative score ranges
                  F.expr("{s} - {lo}".format(s=clamped, lo=int(lo)))
                  .cast("long").alias("s0"),
                  lbl.alias("y"))
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("long")
            .alias("n_pos"),
            (F.expr("div(sum(s0) * 1000, count(*))")
             + F.lit(int(lo) * 1000)).cast("long")
            .alias("mean_score_milli"),
            F.expr("div(sum(case when y then 1 else 0 end) * 1000000,"
                   " count(*))").cast("long").alias("pos_rate_ppm"),
        )
    )
