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


# --------------------------------------------------------------------------
# Ranking metrics (retrieval-eval family): NDCG@k, P/R@k, MRR.
# --------------------------------------------------------------------------

def _log2_discounts_ppb(k: int) -> list:
    """Integer DCG discount table: ``floor(1e9 / log2(rank+1))`` for
    rank 1..k, precomputed in PYTHON (both the Spark plan and the DuckDB
    oracle embed these exact literals — never a runtime log2, so no
    cross-engine float question and no per-row transcendental)."""
    import math
    return [10**9 // 1 if r == 1 else int(10**9 / math.log2(r + 1))
            for r in range(1, k + 1)]


def ndcg_at_k(
    ranked: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    score_col: str = "score",
    rel_col: str = "rel",
    id_col: str = "doc_id",
) -> DataFrame:
    """Graded-relevance NDCG@k per query, exact and integer-only.

    ``gain = 2^rel - 1`` (integer), ``disc = floor(1e9 / log2(rank+1))``
    (precomputed literal table), ``dcg = sum(gain * disc)`` over the
    top-k by ``(score DESC, id ASC)``; ``idcg`` re-ranks the same
    query's rows by ``(rel DESC, id ASC)``.  Output per query:
    ``(query_id, dcg, idcg, ndcg_ppm)`` with
    ``ndcg_ppm = (dcg * 1e6) div idcg`` (NULL when idcg = 0).

    Scale shape: two per-query rank windows — Catalyst's WindowGroupLimit
    prunes each map partition to k rows BEFORE the exchange, so the
    shuffle carries O(queries * k), not the corpus — then one map-side-
    combined aggregate.  Never a global sort; ranks never leave the JVM.
    """
    disc = _log2_discounts_ppb(k)
    disc_arr = F.array(*[F.lit(d).cast("long") for d in disc])
    gain = (F.expr("shiftleft(1, cast({c} as int))".format(c=rel_col)) - 1) \
        .cast("long")
    w_score = Window.partitionBy(query_col).orderBy(
        F.desc(score_col), F.asc(id_col))
    w_ideal = Window.partitionBy(query_col).orderBy(
        F.desc(rel_col), F.asc(id_col))
    base = ranked.select(
        query_col,
        gain.alias("_gain"),
        F.row_number().over(w_score).alias("_rk"),
        F.row_number().over(w_ideal).alias("_irk"),
    )
    dcg = (
        base.filter(F.col("_rk") <= k)
        .groupBy(query_col)
        .agg(F.sum(F.col("_gain")
                   * F.element_at(disc_arr, F.col("_rk")))
             .cast("long").alias("dcg"))
    )
    idcg = (
        base.filter(F.col("_irk") <= k)
        .groupBy(query_col)
        .agg(F.sum(F.col("_gain")
                   * F.element_at(disc_arr, F.col("_irk")))
             .cast("long").alias("idcg"))
    )
    return dcg.join(idcg, on=query_col).select(
        query_col, "dcg", "idcg",
        F.when(F.col("idcg") > 0,
               F.expr("div(dcg * 1000000, idcg)")).cast("long")
        .alias("ndcg_ppm"),
    )


def rank_at_k(
    ranked: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    score_col: str = "score",
    rel_col: str = "relevant",
    id_col: str = "doc_id",
) -> DataFrame:
    """Binary-relevance retrieval metrics per query: precision@k,
    recall@k and reciprocal rank, all ppm-scaled integers.

    ``hits_k`` counts relevant rows in the top-k by ``(score DESC,
    id ASC)``; ``p_at_k_ppm = hits_k*1e6 div k``; ``r_at_k_ppm =
    hits_k*1e6 div n_rel`` (NULL when the query has no relevant rows);
    ``rr_ppm = 1e6 div first_relevant_rank`` over the FULL ranking
    (NULL when never relevant).  One rank window (WindowGroupLimit needs
    the top-k only for hits; the MRR min-rank is a map-side-combined
    conditional min) + one aggregate.
    """
    w_score = Window.partitionBy(query_col).orderBy(
        F.desc(score_col), F.asc(id_col))
    rel = F.col(rel_col).cast("boolean")
    base = ranked.select(
        query_col, rel.alias("_rel"),
        F.row_number().over(w_score).alias("_rk"),
    )
    agg = base.groupBy(query_col).agg(
        F.sum(F.when(F.col("_rel") & (F.col("_rk") <= k), 1)
              .otherwise(0)).cast("long").alias("hits_k"),
        F.sum(F.when(F.col("_rel"), 1).otherwise(0)).cast("long")
        .alias("n_rel"),
        F.min(F.when(F.col("_rel"), F.col("_rk"))).cast("long")
        .alias("_first"),
    )
    return agg.select(
        query_col, "hits_k", "n_rel",
        F.expr("div(hits_k * 1000000, {k})".format(k=int(k)))
        .cast("long").alias("p_at_k_ppm"),
        F.when(F.col("n_rel") > 0,
               F.expr("div(hits_k * 1000000, n_rel)")).cast("long")
        .alias("r_at_k_ppm"),
        F.when(F.col("_first").isNotNull(),
               F.expr("div(1000000, _first)")).cast("long")
        .alias("rr_ppm"),
    )


def pr_curve(
    df: DataFrame,
    thresholds: list,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Precision/recall/F1 sweep of an integer score against a boolean
    label at each caller-supplied decision threshold (predict positive
    when ``score >= t``) — the operating-point picker that follows an
    AUC read in the quality-classifier loop.

    Output per threshold: ``(threshold, tp, fp, fn, tn, precision_ppm,
    recall_ppm, f1_ppm)``.  F1 is computed directly from counts —
    ``f1_ppm = 2*tp*1e6 div (2*tp + fp + fn)`` — so it is exact integer,
    not a rounding of rounded P/R; precision is NULL when nothing is
    predicted positive, recall NULL when there are no positives.  All
    operands non-negative -> truncating div IS floor on both engines.

    Plan: ONE corpus-sized map-side-combined aggregate to the score
    histogram (the auc_exact justification: integer scores have bounded
    cardinality), then a k-literal threshold explode over the HISTOGRAM
    (k x |scores| rows, never k x corpus) re-aggregated per threshold.
    Thresholds are a Python list baked as a literal array — no runtime
    expression re-evaluation (the HOF constant-folding trap).
    """
    ts = sorted(set(int(t) for t in thresholds))
    if not ts:
        raise ValueError("need at least one threshold")
    lbl = F.col(label_col).cast("boolean")
    hist = (
        df.select(F.col(score_col).cast("long").alias("s"),
                  lbl.alias("y"))
        .groupBy("s")
        .agg(
            F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("y"), 0).otherwise(1)).cast("long")
            .alias("n0"),
        )
    )
    t_arr = F.array(*[F.lit(int(t)).cast("long") for t in ts])
    per_t = (
        hist.withColumn("threshold", F.explode(t_arr))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(F.col("s") >= F.col("threshold"), F.col("n1"))
                  .otherwise(0)).cast("long").alias("tp"),
            F.sum(F.when(F.col("s") >= F.col("threshold"), F.col("n0"))
                  .otherwise(0)).cast("long").alias("fp"),
            F.sum(F.when(F.col("s") < F.col("threshold"), F.col("n1"))
                  .otherwise(0)).cast("long").alias("fn"),
            F.sum(F.when(F.col("s") < F.col("threshold"), F.col("n0"))
                  .otherwise(0)).cast("long").alias("tn"),
        )
    )
    return per_t.select(
        "threshold", "tp", "fp", "fn", "tn",
        F.when(F.col("tp") + F.col("fp") > 0,
               F.expr("div(tp * 1000000, tp + fp)")).cast("long")
        .alias("precision_ppm"),
        F.when(F.col("tp") + F.col("fn") > 0,
               F.expr("div(tp * 1000000, tp + fn)")).cast("long")
        .alias("recall_ppm"),
        F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
               F.expr("div(2 * tp * 1000000, 2 * tp + fp + fn)"))
        .cast("long").alias("f1_ppm"),
    )


def confusion_metrics(
    df: DataFrame,
    label_col: str = "label",
    pred_col: str = "pred",
) -> DataFrame:
    """Multi-class classifier evaluation from (label, pred) pairs: one
    row per class that appears as a label OR a prediction —
    ``(class, tp, fp, fn, n_true, n_pred, precision_ppm, recall_ppm,
    f1_ppm)`` — every metric an exact integer floor in ppm, F1 computed
    FROM COUNTS (``floor(2e6*tp / (2tp+fp+fn))``), never from the
    already-rounded P/R (the pr_curve convention).  Zero-denominator
    edges (a class never predicted / never true) yield NULL for that
    metric.

    Scale shape: ONE map-side-combined (label, pred) aggregate bounds
    all downstream work by k^2 cells, never corpus rows; the per-class
    tp/fp/fn reads are two k^2-sized rollups FULL-OUTER-joined on the
    class id.  No windows, no python.
    """
    cells = (
        df.groupBy(F.col(label_col).alias("t"), F.col(pred_col).alias("p"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    per_true = cells.groupBy(F.col("t").alias("class")).agg(
        F.sum(F.when(F.col("p") == F.col("t"), F.col("n"))
              .otherwise(F.lit(0))).cast("long").alias("tp_t"),
        F.sum("n").cast("long").alias("n_true"),
    )
    per_pred = cells.groupBy(F.col("p").alias("class")).agg(
        F.sum(F.when(F.col("p") == F.col("t"), F.col("n"))
              .otherwise(F.lit(0))).cast("long").alias("tp_p"),
        F.sum("n").cast("long").alias("n_pred"),
    )
    j = per_true.join(per_pred, on="class", how="full_outer").select(
        "class",
        F.coalesce(F.col("tp_t"), F.col("tp_p"), F.lit(0)).cast("long")
        .alias("tp"),
        F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
        F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
    )

    out = j.select(
        "class", "tp",
        (F.col("n_pred") - F.col("tp")).alias("fp"),
        (F.col("n_true") - F.col("tp")).alias("fn"),
        "n_true", "n_pred",
    )
    # ppm divisions run in decimal(38,0) (the auc_from_histogram fix):
    # tp * 1e6 would overflow int64 past ~9.2e12 true positives.
    return out.select(
        "class", "tp", "fp", "fn", "n_true", "n_pred",
        F.when(F.col("n_pred") > 0,
               F.expr("cast(div(cast(tp as decimal(38,0)) * 1000000,"
                      " n_pred) as bigint)"))
        .alias("precision_ppm"),
        F.when(F.col("n_true") > 0,
               F.expr("cast(div(cast(tp as decimal(38,0)) * 1000000,"
                      " n_true) as bigint)"))
        .alias("recall_ppm"),
        F.when((F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
               F.expr("cast(div(cast(tp as decimal(38,0)) * 2000000,"
                      " 2 * tp + fp + fn) as bigint)"))
        .alias("f1_ppm"),
    )


def cohen_kappa(df: DataFrame, label_col: str = "label",
                pred_col: str = "pred") -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two labelings
    (rater vs rater, model vs gold, two quality classifiers): one row
    ``(n, agree, po_ppm, pe_ppm, kappa_ppm)`` with

        kappa = (n*agree - sum_c row_c*col_c) / (n^2 - sum_c row_c*col_c)

    in exact ppm (``row_c``/``col_c`` = class c's count in each
    labeling; the sum runs over classes present on BOTH sides — a class
    absent from either side contributes 0, which the inner join
    spells).  The numerator is NEGATIVE for below-chance agreement, so
    the scaled division uses the explicit floor spelling
    ``div(v - pmod(v, m), m)`` (Spark div truncates toward zero —
    CLAUDE.md); products run in decimal(38,0) (n*agree*1e6 passes int64
    at ~3e6 rows).  NULL kappa when pe = 1 (single identical class on
    both sides — the statistic is undefined).

    Scale shape: the corpus collapses in TWO map-side-combined
    aggregates (the 1-row n/agree rollup and the per-class margin
    tables, both vocab-bounded); the pe dot-product joins the two
    class-sized tables and reduces to 1 row, attached via the
    sanctioned structural scalar attach.  Never a corpus-side join.
    """
    g = df.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col(label_col) == F.col(pred_col), 1).otherwise(0))
        .cast("long").alias("agree"),
    )
    rows = df.groupBy(F.col(label_col).alias("c")).agg(
        F.count("*").cast("long").alias("row_n"))
    cols = df.groupBy(F.col(pred_col).alias("c")).agg(
        F.count("*").cast("long").alias("col_n"))
    pe = (
        rows.join(cols, on="c", how="inner")
        .agg(F.coalesce(
            F.sum(F.expr("cast(row_n as decimal(38,0)) * col_n")),
            F.lit(0).cast("decimal(38,0)")
        ).alias("pe_num"))
    )
    from ._util import attach_scalar

    out = attach_scalar(g, pe)
    num = ("(cast(1000000 as decimal(38,0))"
           " * (cast(n as decimal(38,0)) * agree - pe_num))")
    den = "(cast(n as decimal(38,0)) * n - pe_num)"
    return out.select(
        "n", "agree",
        F.expr("cast(div(agree * cast(1000000 as bigint), n) as bigint)")
        .alias("po_ppm"),
        F.expr("cast(div(pe_num * 1000000,"
               " cast(n as decimal(38,0)) * n) as bigint)").alias("pe_ppm"),
        F.expr(
            "CASE WHEN {d} <> 0 THEN cast(div({v} - pmod({v}, {d}), {d})"
            " as bigint) END".format(v=num, d=den)).alias("kappa_ppm"),
    )


def mcc_signed(df: DataFrame, label_col: str = "label",
               pred_col: str = "pred") -> DataFrame:
    """Matthews correlation coefficient for a binary labeling pair —
    the single-number confusion summary robust to class imbalance.
    MCC itself is a square root (irrational), so the exact-rational
    form ships: one row ``(tp, tn, fp, fn, mcc2_signed_ppm)`` where

        mcc2_signed_ppm = sign(tp*tn - fp*fn)
                          * floor(1e6 * (tp*tn - fp*fn)²
                                  / ((tp+fp)(tp+fn)(tn+fp)(tn+fn)))

    (+1e6 = perfect, 0 = chance, -1e6 = perfect inversion; compare
    |MCC| thresholds by squaring them).  NULL when any margin is zero
    (MCC undefined).  Labels/preds are booleans or 0/1 integers.

    All products run in decimal(38,0): the denominator is <= n⁴ —
    int64 dies at n ~ 55k rows; decimal carries ~1e9.

    Scale shape: ONE map-side-combined aggregate collapses the corpus
    to the four confusion counts; everything after is 1-row codegen.
    """
    l = F.col(label_col).cast("boolean")
    p = F.col(pred_col).cast("boolean")
    g = df.agg(
        F.sum(F.when(l & p, 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(~l & ~p, 1).otherwise(0)).cast("long").alias("tn"),
        F.sum(F.when(~l & p, 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(l & ~p, 1).otherwise(0)).cast("long").alias("fn"),
    )
    num = ("(cast(tp as decimal(38,0)) * tn"
           " - cast(fp as decimal(38,0)) * fn)")
    den = ("((cast(tp as decimal(38,0)) + fp)"
           " * (cast(tp as decimal(38,0)) + fn)"
           " * (cast(tn as decimal(38,0)) + fp)"
           " * (cast(tn as decimal(38,0)) + fn))")
    return g.select(
        "tp", "tn", "fp", "fn",
        F.expr(
            "CASE WHEN {d} <> 0 THEN cast("
            "  (CASE WHEN {n} < 0 THEN -1 ELSE 1 END)"
            "  * div(cast(1000000 as decimal(38,0)) * {n} * {n}, {d})"
            " as bigint) END".format(n=num, d=den)
        ).alias("mcc2_signed_ppm"),
    )


def gains_table(
    df: DataFrame,
    k: int = 10,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Cumulative gains / decile-lift table — the campaign-targeting and
    quality-threshold read after an AUC: rank rows by score DESC, cut
    into ``k`` equal-population buckets, and report per-bucket and
    cumulative capture.  One row per NON-EMPTY bucket:
    ``(bucket, n_rows, pos, cum_rows, cum_pos, depth_ppm, capture_ppm,
    lift_ppm)`` with

        lift_ppm    = floor(1e6 * cum_pos * n_total / (cum_rows * pos_total))
        capture_ppm = floor(1e6 * cum_pos / pos_total)
        depth_ppm   = floor(1e6 * cum_rows / n_total)

    Ties never straddle buckets: every row of a tied score group lands
    in the bucket of the group's FIRST row (``bucket = floor(k *
    rows_strictly_above / n_total)``), so the cut is deterministic under
    any row order — the ntile-over-rows spelling is not.  All operands
    are non-negative, so floor = both engines' truncating division;
    products run in decimal(38,0) (``cum_pos * n_total * 1e6`` passes
    int64 at ~3e3 rows).  ``lift_ppm`` / ``capture_ppm`` are NULL when
    the corpus has no positives.

    Scale shape: the auc_exact discipline — ONE corpus-sized map-side
    combined aggregate to the score histogram; the rank and total
    windows run over that bounded histogram (never over rows), then a
    k-sized rollup + k-sized cumulative window.  Never a global row
    sort, no ntile, no python.
    """
    if k < 1:
        raise ValueError("need k >= 1")
    lbl = F.col(label_col).cast("boolean")
    hist = (
        df.select(F.col(score_col).alias("s"), lbl.alias("y"))
        .groupBy("s")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("long")
            .alias("n1"),
        )
    )
    # rank + total windows over the HISTOGRAM (score-cardinality-bounded)
    wdesc = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0)
    wall = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = hist.select(
        "s", "n", "n1",
        (F.sum("n").over(wdesc) - F.col("n")).cast("long").alias("above"),
        F.sum("n").over(wall).cast("long").alias("n_tot"),
        F.sum("n1").over(wall).cast("long").alias("p_tot"),
    )
    buckets = (
        ranked.select(
            F.expr("cast(div(above * {k}L, n_tot) as int)".format(k=int(k)))
            .alias("bucket"),
            "n", "n1", "n_tot", "p_tot",
        )
        .groupBy("bucket")
        .agg(
            F.sum("n").cast("long").alias("n_rows"),
            F.sum("n1").cast("long").alias("pos"),
            F.max("n_tot").alias("n_tot"),
            F.max("p_tot").alias("p_tot"),
        )
    )
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = buckets.select(
        "bucket", "n_rows", "pos",
        F.sum("n_rows").over(wb).cast("long").alias("cum_rows"),
        F.sum("pos").over(wb).cast("long").alias("cum_pos"),
        "n_tot", "p_tot",
    )
    return cum.select(
        "bucket", "n_rows", "pos", "cum_rows", "cum_pos",
        F.expr("cast(div(cast(cum_rows as decimal(38,0)) * 1000000,"
               " n_tot) as bigint)").alias("depth_ppm"),
        F.when(F.col("p_tot") > 0,
               F.expr("cast(div(cast(cum_pos as decimal(38,0)) * 1000000,"
                      " p_tot) as bigint)"))
        .alias("capture_ppm"),
        F.when(F.col("p_tot") > 0,
               F.expr("cast(div(cast(cum_pos as decimal(38,0)) * n_tot"
                      " * 1000000, cast(cum_rows as decimal(38,0))"
                      " * p_tot) as bigint)"))
        .alias("lift_ppm"),
    )


def brier_score(
    df: DataFrame,
    scale: int = 1000,
    prob_col: str = "p",
    label_col: str = "label",
) -> DataFrame:
    """Brier score + skill vs climatology for probabilistic predictions
    — the proper-scoring companion to the AUC/calibration pair (AUC is
    rank-only; Brier charges miscalibrated CONFIDENCE).  ``prob_col``
    is an integer probability in ``[0, scale]`` (out-of-range values
    clamp); output is ONE row ``(n, pos, ssq, brier_ppm, skill_ppm)``:

        brier_ppm = floor(1e6 * sum((p - y*scale)^2) / (n * scale^2))
        skill_ppm = floor(1e6 * (scale^2*pos*neg - ssq*n)
                          / (scale^2*pos*neg))

    ``skill_ppm`` is the Brier skill score vs always-predicting the
    base rate (1e6 = perfect, 0 = no better than climatology, negative
    = worse); it is NULL for a one-class corpus (reference score 0).
    The numerator goes negative, so the scaled division uses the
    explicit floor spelling ``div(v - pmod(v, m), m)`` (Spark div
    truncates toward zero — CLAUDE.md); products run in decimal(38,0).
    Exactness bound: ``ssq`` accumulates in int64 — safe while
    ``n * scale^2`` <= ~9.2e18 (1e9 rows at the default milli scale is
    1e15).

    Scale shape: ONE map-side-combined aggregate collapses the corpus
    to four counters; everything after is 1-row codegen.  No join, no
    window, no python.
    """
    if scale < 1:
        raise ValueError("need scale >= 1")
    p = F.expr("greatest(0L, least({s}L, cast({c} as long)))".format(
        s=int(scale), c=prob_col))
    y = F.col(label_col).cast("boolean")
    g = df.select(
        p.alias("_p"),
        F.when(y, F.lit(int(scale))).otherwise(F.lit(0)).cast("long")
        .alias("_ys"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.expr("cast(_ys > 0 as long)")).cast("long").alias("pos"),
        F.sum(F.expr("(_p - _ys) * (_p - _ys)")).cast("long").alias("ssq"),
    )
    s2 = int(scale) * int(scale)
    num = ("(cast(1000000 as decimal(38,0)) * ({s2} *"
           " cast(pos as decimal(38,0)) * (n - pos)"
           " - cast(ssq as decimal(38,0)) * n))").format(s2=s2)
    den = ("({s2} * cast(pos as decimal(38,0)) * (n - pos))"
           .format(s2=s2))
    return g.select(
        "n", "pos", "ssq",
        F.when(F.col("n") > 0,
               F.expr("cast(div(cast(ssq as decimal(38,0)) * 1000000,"
                      " cast(n as decimal(38,0)) * {s2}) as bigint)"
                      .format(s2=s2)))
        .alias("brier_ppm"),
        F.expr(
            "CASE WHEN {d} <> 0 THEN cast(div({v} - pmod({v}, {d}), {d})"
            " as bigint) END".format(v=num, d=den)).alias("skill_ppm"),
    )


def regression_metrics(
    df: DataFrame,
    pred_col: str = "pred",
    target_col: str = "y",
) -> DataFrame:
    """Regression-model evaluation over integer (pre-scaled) predictions
    and targets — the quality-REGRESSOR companion to the classifier
    evals (length predictors, quality scorers trained as regressions,
    calibration-by-regression reads).  ONE row:

        n, sae, sse      exact integer error sums (|e| and e^2)
        mae_x1000        floor(1000 * sae / n)
        r2_ppm           floor(1e6 * (sst_n - n*sse) / sst_n)  with
                         sst_n = n*sum(y^2) - sum(y)^2  (n x the
                         centered target variance — division-free)

    R^2 is NEGATIVE when the model is worse than predicting the mean,
    so the scaled division uses the explicit floor spelling; it is NULL
    for a constant target (sst_n = 0).  Products run in decimal(38,0);
    the int64 accumulation bound (n * max|e|^2 <= ~9.2e18) is the
    module's documented contract.

    Scale shape: ONE map-side-combined aggregate collapses the corpus
    to five counters; everything after is 1-row codegen.
    """
    p = F.col(pred_col).cast("long")
    y = F.col(target_col).cast("long")
    g = df.select(
        (p - y).alias("_e"), y.alias("_y"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.abs(F.col("_e"))).cast("long").alias("sae"),
        F.sum(F.col("_e") * F.col("_e")).cast("long").alias("sse"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.col("_y") * F.col("_y")).cast("long").alias("_syy"),
    )
    num = ("(cast(1000000 as decimal(38,0))"
           " * ((cast(n as decimal(38,0)) * _syy"
           "     - cast(_sy as decimal(38,0)) * _sy)"
           "    - cast(n as decimal(38,0)) * sse))")
    den = ("(cast(n as decimal(38,0)) * _syy"
           " - cast(_sy as decimal(38,0)) * _sy)")
    return g.select(
        "n", "sae", "sse",
        F.when(F.col("n") > 0,
               F.expr("cast(div(cast(sae as decimal(38,0)) * 1000, n)"
                      " as bigint)")).alias("mae_x1000"),
        F.expr(
            "CASE WHEN {d} <> 0 THEN cast(div({v} - pmod({v}, {d}), {d})"
            " as bigint) END".format(v=num, d=den)).alias("r2_ppm"),
    )


def ks_statistic(
    df: DataFrame,
    label_a,
    label_b,
    group_col: str = "sample",
    score_col: str = "score",
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic over integer
    scores — the distribution-shift read that complements the binned
    chi-square drift check (KS sees location/shape shifts fixed bins
    blur, and has no binning knob).  ``label_a``/``label_b`` name the
    two samples in ``group_col`` (explicit, so the contract is
    deterministic — rows with other labels are ignored).  ONE row out:

        n_a, n_b       sample sizes
        ks_ppm         floor(1e6 * max_s |F_a(s) - F_b(s)|)  computed
                       cross-multiplied: max |cum_a*n_b - cum_b*n_a|
                       / (n_a*n_b) — every operand an exact integer
        ks_at          the smallest score achieving the max (the
                       shift's location, deterministic)

    NULL ks/ks_at when either sample is empty.  Products run in
    decimal(38,0) (``cum * n`` passes int64 at ~3e9 x 3e9 rows).

    Scale shape: the auc_exact discipline — ONE map-side-combined
    aggregate to the per-score (c_a, c_b) histogram; the cumulative and
    total windows run over that score-cardinality-bounded table; one
    final 1-row aggregate.  Never a sort of rows.
    """
    hist = (
        df.select(F.col(group_col).alias("_g"),
                  F.col(score_col).alias("s"))
        .filter(F.col("_g").isin([label_a, label_b]))
        .groupBy("s")
        .agg(
            F.sum(F.when(F.col("_g") == F.lit(label_a), 1).otherwise(0))
            .cast("long").alias("ca"),
            F.sum(F.when(F.col("_g") == F.lit(label_b), 1).otherwise(0))
            .cast("long").alias("cb"),
        )
    )
    wcum = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    d = hist.select(
        "s",
        F.sum("ca").over(wcum).cast("long").alias("cum_a"),
        F.sum("cb").over(wcum).cast("long").alias("cum_b"),
        F.sum("ca").over(wall).cast("long").alias("n_a"),
        F.sum("cb").over(wall).cast("long").alias("n_b"),
    ).select(
        "s", "n_a", "n_b",
        F.expr("abs(cast(cum_a as decimal(38,0)) * n_b"
               " - cast(cum_b as decimal(38,0)) * n_a)").alias("_d"),
    )
    # argmax needs the max first: one more window pass over the
    # histogram-sized table (join-free)
    wmax = Window.partitionBy()
    d2 = d.withColumn("_dmax", F.max("_d").over(wmax))
    return d2.agg(
        F.max("n_a").cast("long").alias("n_a"),
        F.max("n_b").cast("long").alias("n_b"),
        F.when((F.max("n_a") > 0) & (F.max("n_b") > 0),
               F.expr("cast(div(max(_dmax) * 1000000,"
                      " cast(max(n_a) as decimal(38,0)) * max(n_b))"
                      " as bigint)")).alias("ks_ppm"),
        F.when((F.max("n_a") > 0) & (F.max("n_b") > 0),
               F.min(F.when(F.col("_d") == F.col("_dmax"), F.col("s")))
               .cast("long")).alias("ks_at"),
    )
