"""Exact grouped quantiles: percentile_disc semantics, engine-portable.

Corpus curation reads length/quality distributions constantly (p50/p90/p99
document length per source decides truncation budgets and filter knobs).
Spark's ``percentile_approx`` is neither exact nor cross-engine
reproducible, and both engines' native exact percentile functions disagree
on interpolation defaults — so this operator implements the discrete
percentile (``percentile_disc``: the smallest value whose rank covers the
requested fraction) from first principles, in pure integer arithmetic:

    pos_p = ceil(p * n / 100) = (p*n + 99) div 100        (p in 1..100)
    result = the value at 1-based position pos_p in the group's sort order

Every quantity is an integer, so the result is a pure function of the
multiset of values — identical across engines, partitionings, and tie
orders (ties at the boundary position all carry the same value).

Scale shape: ONE hash shuffle on the group key, reused by the rank window
and the final aggregation (HashPartitioning(group) satisfies both); the
per-p picks are conditional aggregates, not extra passes. No driver
actions, no global sort — each group sorts only its own rows, the same
cost profile as any windowed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(df: DataFrame, value_col: str, group_col: str,
                    percentiles=(50, 90, 99)) -> DataFrame:
    """One row per group: ``(group_col, n, p<P> for each P)`` where ``p<P>``
    is the exact discrete P-th percentile of ``value_col`` in the group.

    ``percentiles`` are integers in 1..100 (100 = max).
    """
    ps = [int(p) for p in percentiles]
    if not ps or any(p < 1 or p > 100 for p in ps):
        raise ValueError("percentiles must be integers in 1..100")
    w = Window.partitionBy(group_col).orderBy(value_col)
    ranked = df.select(
        group_col, value_col,
        F.row_number().over(w).alias("__r"),
        F.count("*").over(Window.partitionBy(group_col)).alias("__n"),
    )
    aggs = [F.max("__n").alias("n")]
    for p in ps:
        # integer `div`, not `/` (Spark's `/` on longs returns double and a
        # double round-trip loses exactness past 2^53)
        pos = F.expr("({p} * __n + 99) div 100".format(p=p))
        aggs.append(
            F.min(F.when(F.col("__r") == pos, F.col(value_col)))
            .alias("p{}".format(p))
        )
    return ranked.groupBy(group_col).agg(*aggs)


def quantiles_oracle_sql(source_sql: str, value_col: str, group_col: str,
                         percentiles=(50, 90, 99)) -> str:
    """DuckDB replay of :func:`group_quantiles` (same rank/position math —
    deliberately NOT quantile_disc(), so both engines run one formula)."""
    ps = [int(p) for p in percentiles]
    picks = ",\n       ".join(
        "MIN(CASE WHEN __r = ({p} * __n + 99) // 100 THEN {v} END) AS p{p}"
        .format(p=p, v=value_col) for p in ps
    )
    return f"""
WITH ranked AS (
  SELECT {group_col}, {value_col},
         ROW_NUMBER() OVER (PARTITION BY {group_col} ORDER BY {value_col})
           AS __r,
         COUNT(*) OVER (PARTITION BY {group_col}) AS __n
  FROM ({source_sql}))
SELECT {group_col}, CAST(MAX(__n) AS BIGINT) AS n,
       {picks}
FROM ranked
GROUP BY {group_col}
ORDER BY {group_col}
"""


def key_skew_report(df: DataFrame, cols) -> DataFrame:
    """Join/shuffle-key skew diagnostic — the pre-flight check before
    keying a 100 TB shuffle: for each candidate key column, the key
    cardinality, the heaviest key and its share, and exact p50/p99 of
    the per-key row counts, plus ``skew_ratio_ppm`` (heaviest key vs the
    median key, x1e6) — the number that says "salt this join".

    Scale shape per column: ONE map-side-combined groupBy(key) to the
    key-sized count table; everything after runs on the COUNTS-OF-COUNTS
    histogram (bounded by distinct count values — the auc_exact/RFM
    percentile pattern), so no window ever sees the key table, let alone
    rows.  The two 1-row summaries merge by UNION + one 2-row aggregate
    — a join on the literal column name would constant-fold into the
    scalar BNLJ shape the plan invariant forbids.  All quantities
    integer; ``max_key`` ties break to the lexicographically largest key
    string.  NULL keys count under the sentinel ``(null)``.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("need at least one column")
    parts = []
    for c in cols:
        key = F.coalesce(F.col(c).cast("string"), F.lit("(null)"))
        kc = df.select(key.alias("key")).groupBy("key").agg(
            F.count("*").cast("long").alias("n"))
        base = kc.agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("n").cast("long").alias("n_rows"),
            F.max("n").cast("long").alias("max_n"),
            F.max_by("key", F.struct("n", "key")).alias("max_key"),
        ).select(F.lit(c).alias("col_name"), "n_keys", "n_rows",
                 "max_n", "max_key",
                 F.lit(None).cast("long").alias("p50_n"),
                 F.lit(None).cast("long").alias("p99_n"))
        hist = kc.groupBy("n").agg(F.count("*").cast("long").alias("cnt"))
        w = Window.orderBy("n").rowsBetween(Window.unboundedPreceding, 0)
        ranked = hist.select(
            "n",
            F.sum("cnt").over(w).cast("long").alias("cum"),
            F.sum("cnt").over(
                Window.orderBy("n").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing)
            ).cast("long").alias("total"),
        )
        qs = ranked.agg(
            F.min(F.when(
                F.col("cum") >= F.expr("(50 * total + 99) div 100"),
                F.col("n"))).cast("long").alias("p50_n"),
            F.min(F.when(
                F.col("cum") >= F.expr("(99 * total + 99) div 100"),
                F.col("n"))).cast("long").alias("p99_n"),
        ).select(F.lit(c).alias("col_name"),
                 F.lit(None).cast("long").alias("n_keys"),
                 F.lit(None).cast("long").alias("n_rows"),
                 F.lit(None).cast("long").alias("max_n"),
                 F.lit(None).cast("string").alias("max_key"),
                 "p50_n", "p99_n")
        parts.append(base.unionByName(qs))
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    out = merged.groupBy("col_name").agg(
        F.max("n_keys").cast("long").alias("n_keys"),
        F.max("n_rows").cast("long").alias("n_rows"),
        F.max("max_n").cast("long").alias("max_n"),
        F.max("max_key").alias("max_key"),
        F.max("p50_n").cast("long").alias("p50_n"),
        F.max("p99_n").cast("long").alias("p99_n"),
    )
    return out.select(
        "col_name", "n_rows", "n_keys", "max_key", "max_n",
        F.expr("div(max_n * 1000000, n_rows)").cast("long")
        .alias("max_share_ppm"),
        "p50_n", "p99_n",
        F.expr("div(max_n * 1000000, p50_n)").cast("long")
        .alias("skew_ratio_ppm"),
    )


def value_cdf(df: DataFrame, key_col: str = "key",
              value_col: str = "v") -> DataFrame:
    """Exact per-key empirical CDF (the quantile/CDF feature transform —
    map every observed integer value to its within-key percentile):
    ``(key, v, cnt, cum, n, cdf_ppm)`` per distinct (key, value), where
    ``cum`` counts values <= v within the key and ``cdf_ppm =
    floor(1e6 * cum / n)`` (exact — the scaled division runs in
    decimal(38,0), the auc overflow fix).  A pure function of the
    per-key value multiset: no interpolation, no tie-order dependence.

    Scale shape: ONE map-side-combined (key, value) aggregate collapses
    the corpus to the histogram; the running-sum window and the per-key
    total share the single hashpartitioning(key) exchange of that
    bounded histogram (the group_quantiles justification) — never a
    corpus-row window.  Per-key DISTINCT-value cardinality must be
    bounded (integer-scaled measures are; free-floats are not — scale
    them first, the repo's cents convention).
    """
    hist = (
        df.groupBy(F.col(key_col).alias("key"),
                   F.col(value_col).cast("long").alias("v"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w_ord = (Window.partitionBy("key").orderBy("v")
             .rowsBetween(Window.unboundedPreceding, 0))
    w_all = Window.partitionBy("key")
    out = hist.select(
        "key", "v", "cnt",
        F.sum("cnt").over(w_ord).cast("long").alias("cum"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
    )
    return out.select(
        "key", "v", "cnt", "cum", "n",
        F.expr("cast(div(cast(cum as decimal(38,0)) * 1000000, n)"
               " as bigint)").alias("cdf_ppm"),
    )


def gini_concentration(df: DataFrame, key_col: str = "key",
                       value_col: str = "v") -> DataFrame:
    """Exact per-key Gini coefficient of a NON-NEGATIVE integer measure
    (traffic/length/volume concentration — "how unequal is this key's
    distribution?"): ``(key, n, sum_v, gini_ppm)`` with

        gini_ppm = floor(1e6 * (2*T - (n+1)*S) / (n*S))

    where ``T = sum_i i * x_(i)`` over the ascending sort (ties expanded
    via the run identity ``sum positions = c*p + c(c+1)/2`` — no per-row
    ranks ever materialize) and ``S = sum x``.  0 = perfect equality,
    ->1e6 = total concentration; NULL when S = 0.  The numerator is
    provably non-negative for non-negative values, so the decimal
    truncating div IS floor; every product runs in decimal(38,0)
    (position sums are quadratic in n — int64 dies at ~3e9 rows/key).

    Scale shape: identical to :func:`value_cdf` — ONE map-side-combined
    (key, value) histogram aggregate, one running-sum window over the
    bounded histogram on the same hashpartitioning(key) exchange, then
    a per-key rollup.  Never a corpus sort or per-row rank.
    """
    hist = (
        df.groupBy(F.col(key_col).alias("key"),
                   F.col(value_col).cast("long").alias("v"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w_ord = (Window.partitionBy("key").orderBy("v")
             .rowsBetween(Window.unboundedPreceding, 0))
    c = hist.select(
        "key", "v", "cnt",
        F.sum("cnt").over(w_ord).cast("long").alias("cum"),
    )
    s = c.groupBy("key").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.expr("cast(v as decimal(38,0)) * cnt")).alias("_sv"),
        F.sum(F.expr(
            "cast(v as decimal(38,0)) * (cast(cnt as decimal(38,0))"
            " * (cum - cnt) + div(cast(cnt as decimal(38,0))"
            " * (cnt + 1), 2))")).alias("_t"),
    )
    return s.select(
        "key", "n",
        F.col("_sv").cast("long").alias("sum_v"),
        F.when(
            F.col("_sv") > 0,
            F.expr("cast(div((2 * _t - (cast(n as decimal(38,0)) + 1)"
                   " * _sv) * 1000000, cast(n as decimal(38,0)) * _sv)"
                   " as bigint)"),
        ).alias("gini_ppm"),
    )


def chi2_association(df: DataFrame, a_col: str = "a",
                     b_col: str = "b") -> DataFrame:
    """Exact-scaled chi-square test of independence between two
    categorical columns, plus Cramér's V² — the standard "are these two
    discrete features associated?" read (label leakage checks, schema
    drift, stratification design).  One global row:
    ``(n, r, c, dof, chi2_ppm, v2_ppm)``.

    Arithmetic: the textbook statistic rewrites as

        chi2 = sum_cells (O-E)^2/E = n * sum_observed O^2/(R_a*C_b) - n

    (zero-observed cells contribute nothing to the O² sum), so only the
    OBSERVED cell histogram is ever touched.  Per-cell terms floor at
    1e12 scale — O² <= R_a*C_b guarantees each term fits int64 — and the
    only approximation is that deterministic per-cell floor (< cells/1e6
    ppm total, identical in both engines); ``chi2_ppm = max(0,
    (n*T) div 1e6 - n*1e6)`` clamps the floor-noise at true chi2 = 0.
    Cramér's V itself is a square root (irrational), so the exact-
    rational form V² ships instead: ``v2_ppm = chi2_ppm div
    (n*(min(r,c)-1))``, NULL when either dimension has one level.

    Scale shape: ONE map-side-combined (a, b) aggregate collapses the
    corpus to the vocab-bounded cell histogram; both margin windows and
    the final 1-row rollup run over that bounded table (two tiny
    exchanges).  Never a corpus-side join or window.
    """
    cells = (
        df.groupBy(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    m = cells.select(
        "a", "b", "cnt",
        F.sum("cnt").over(Window.partitionBy("a")).cast("long").alias("ra"),
        F.sum("cnt").over(Window.partitionBy("b")).cast("long").alias("cb"),
    )
    g = m.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.countDistinct("a").cast("long").alias("r"),
        F.countDistinct("b").cast("long").alias("c"),
        F.sum(F.expr(
            "div(cast(cnt as decimal(38,0)) * cnt * 1000000000000,"
            " cast(ra as decimal(38,0)) * cb)")).cast("long").alias("_t"),
    )
    return g.select(
        "n", "r", "c",
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        F.expr(
            "greatest(cast(0 as bigint),"
            " cast(div(cast(n as decimal(38,0)) * _t, 1000000) as bigint)"
            " - n * cast(1000000 as bigint))").alias("chi2_ppm"),
    ).select(
        "n", "r", "c", "dof", "chi2_ppm",
        F.when(F.least("r", "c") > 1,
               F.expr("div(chi2_ppm, n * (least(r, c) - 1))"))
        .cast("long").alias("v2_ppm"),
    )


def simpson_diversity(df: DataFrame, key_col: str = "key",
                      cat_col: str = "cat") -> DataFrame:
    """Exact per-key categorical diversity — Simpson's index family, the
    log-free alternative to Shannon entropy (entropy needs float ln;
    Simpson is a pure rational, so it ships exact):

        n             rows in the group
        n_cats        distinct categories
        simpson_ppm   1e6 - floor(1e6 * sum n_i(n_i-1) / (n(n-1)))
                      (probability two draws WITHOUT replacement differ;
                       1e6 = maximally diverse, 0 = monoculture; the
                       floor sits on the concentration term, so the
                       value rounds UP by <= 1 ppm — spelled identically
                       in the oracle)
        inv_simpson_ppm  floor(1e6 * n² / sum n_i²)  (effective number
                      of categories, scaled — "how many equally-common
                      categories would look like this?")

    The domain-mix / source-balance read in corpus curation (is one
    domain eating the crawl?) and the type-mix read per user/shard.
    NULL simpson for n < 2.

    Scale shape: ONE map-side-combined (key, category) aggregate
    collapses the corpus to the vocab-bounded count table; the per-key
    rollup and all ppm arithmetic run on that bounded table (products
    in decimal(38,0) — n_i² passes int64 only to ~3e9).  Never a
    corpus-side distinct.
    """
    cnt = (
        df.groupBy(F.col(key_col).alias("key"), F.col(cat_col).alias("cat"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    g = cnt.groupBy("key").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_cats"),
        F.sum(F.expr("cast(c as decimal(38,0)) * (c - 1)")).alias("_s2w"),
        F.sum(F.expr("cast(c as decimal(38,0)) * c")).alias("_s2"),
    )
    return g.select(
        "key", "n", "n_cats",
        F.when(F.col("n") >= 2, F.expr(
            "cast(1000000 - div(cast(1000000 as decimal(38,0)) * _s2w,"
            " cast(n as decimal(38,0)) * (n - 1)) as bigint)"))
        .alias("simpson_ppm"),
        F.expr("cast(div(cast(1000000 as decimal(38,0)) * n * n, _s2)"
               " as bigint)").alias("inv_simpson_ppm"),
    )


def interval_concurrency(intervals: DataFrame, start_col: str = "t1",
                         end_col: str = "t2") -> DataFrame:
    """Concurrency curve of CLOSED integer intervals ``[t1, t2]`` — how
    many are active at each breakpoint: open orders over time,
    concurrent sessions, live crawls.  Returns one row per breakpoint
    ``(t, delta, active)`` where ``delta`` is the net change at ``t``
    (starts minus expiries) and ``active`` the running count of
    intervals containing ``t``.  Breakpoints are INTEGERS (day ids,
    hour ids — the repo's pure-NTZ ``epoch_us div unit`` convention,
    which keeps the sweep timezone-independent); the -1 event lands at
    ``t2 + 1`` (closed-interval semantics); ``t2 < t1`` rows drop.

    Scale shape: corpus-sized work is ONE map-side-combined per-
    breakpoint delta aggregate (the corpus collapses to the breakpoint
    vocabulary — days/hours, bounded); the running-sum window runs
    unpartitioned over that BOUNDED table (the AUC histogram-window
    justification — never over raw rows).
    """
    iv = intervals.select(
        F.col(start_col).cast("long").alias("t1"),
        F.col(end_col).cast("long").alias("t2"),
    ).filter(F.col("t2") >= F.col("t1"))
    deltas = (
        iv.select(F.col("t1").alias("t"), F.lit(1).alias("d"))
        .union(iv.select((F.col("t2") + 1).alias("t"),
                         F.lit(-1).alias("d")))
        .groupBy("t").agg(F.sum("d").cast("long").alias("delta"))
    )
    w = (Window.orderBy("t")
         .rowsBetween(Window.unboundedPreceding, 0))
    return deltas.select(
        "t", "delta",
        F.sum("delta").over(w).cast("long").alias("active"))
