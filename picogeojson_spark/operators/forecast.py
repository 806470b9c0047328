"""Holt linear-trend forecasting over event-rate series — integer exact.

The capacity-planning / trend-monitoring step: per key, double
exponential smoothing (Holt 1957) over the hourly count series gives a
level, a trend, and a one-step forecast.  Floats are the classic
cross-engine hazard here (alpha powers compound rounding), so the whole
recurrence runs in MILLI fixed point with FLOOR division — and because
the trend can go negative, floor must be spelled explicitly on the
Spark side (``(a - pmod(a, 1000)) / 1000``): Spark's ``div`` truncates
toward zero while DuckDB's ``//`` floors, the repo's known divergence
trap for negatives.

Scale shape: ONE map-side-combined (key, hour) aggregate reduces the
corpus to the hourly table; ONE key-sized aggregate collects each key's
BOUNDED series (hours in the analysis window — at 100 TB you forecast
over the rollup, never raw events); the recurrence is a single
``F.aggregate`` fold whose lambda touches only its own variables (the
HOF-safe category per the repo's CollapseProject rule).  The oracle
replays the identical fold with DuckDB ``list_reduce``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def holt_forecast(
    events: DataFrame,
    alpha_milli: int = 300,
    beta_milli: int = 100,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key Holt linear smoothing over the hourly count series
    (observed hours, in hour order; all-integer milli fixed point):

    - init: level = first_count * 1000, trend = 0;
    - step: level' = floor((a*x*?) ...) — precisely
      ``fd(alpha*x_milli + (1000-alpha)*(level+trend))`` and
      ``trend' = fd(beta*(level'-level) + (1000-beta)*trend)`` with
      ``fd(v) = floor(v / 1000)``.

    Output: ``key, n_hours, level_milli, trend_milli,
    forecast_next_milli`` (= level + trend, the one-step-ahead Holt
    forecast).
    """
    if not (0 < alpha_milli <= 1000 and 0 <= beta_milli <= 1000):
        raise ValueError("alpha_milli in (0,1000], beta_milli in [0,1000]")
    a, b = int(alpha_milli), int(beta_milli)
    hour = F.expr(
        "div(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
        "00:00:00', {c}), 3600000000)".format(c=ts_col))
    hourly = (
        events.select(F.col(key_col).alias("key"), hour.alias("hour"))
        .groupBy("key", "hour")
        .agg(F.count("*").cast("long").alias("n"))
    )
    series = hourly.groupBy("key").agg(
        F.array_sort(F.collect_list(F.struct("hour", "n"))).alias("s"))
    # fold with EXPLICIT floor division: fd(v) = div(v - pmod(v, 1000),
    # 1000) — pmod is the non-negative remainder, so v - pmod(v, 1000) is
    # exactly divisible and div's truncation is exact even for negative
    # trends; integer div throughout (a `/` here would go through DOUBLE
    # and lose exactness past 2^53)
    def fd(v):
        return "div(({v}) - pmod({v}, 1000), 1000)".format(v=v)

    lp = fd("{a} * e.n * 1000L + {na} * (acc.l + acc.b)".format(
        a=a, na=1000 - a))
    bp = fd("{b} * (({lp}) - acc.l) + {nb} * acc.b".format(
        b=b, nb=1000 - b, lp=lp))
    step = (
        "aggregate(slice(s, 2, greatest(0, size(s) - 1)), "
        "named_struct('l', element_at(s, 1).n * 1000L, 'b', 0L), "
        "(acc, e) -> named_struct('l', {lp}, 'b', {bp}))"
    ).format(lp=lp, bp=bp)
    out = series.select(
        "key",
        F.size("s").cast("long").alias("n_hours"),
        F.expr(step).alias("hb"),
    )
    return out.select(
        "key", "n_hours",
        F.col("hb.l").alias("level_milli"),
        F.col("hb.b").alias("trend_milli"),
        (F.col("hb.l") + F.col("hb.b")).cast("long")
        .alias("forecast_next_milli"),
    )


def group_trend(
    df: DataFrame,
    key_col: str = "key",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Exact per-group OLS trend: for every key, the least-squares slope
    of integer ``y`` against integer ``x`` in ppm —

        slope_ppm = floor(1e6 * (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2))

    — computed from int64 sufficient statistics with the scaled
    division in decimal(38,0) and the EXPLICIT floor spelling
    ``div(v - pmod(v, m), m)`` (the numerator is NEGATIVE on downward
    trends, where truncating div and floor diverge — the Holt-trend
    lesson).  Returns ``(key, n, sum_x, sum_y, sum_xy, sum_xx,
    slope_ppm)``; ``slope_ppm`` is NULL when x has no variance (n < 2
    or all x equal).  Callers must pre-scale floats to integers; the
    int64 bound on the sufficient statistics is ``n * max|x*y| < 2^63``
    (the ppm stage itself is overflow-free in decimal).

    Scale shape: ONE map-side-combined aggregate per key — sums commute,
    so the exchange carries 5 integers per key per task.  "Volume trend
    per key" over a billion keys is exactly this shape.
    """
    agg = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col(x_col).cast("long")).cast("long").alias("sum_x"),
        F.sum(F.col(y_col).cast("long")).cast("long").alias("sum_y"),
        F.sum(F.col(x_col).cast("long") * F.col(y_col).cast("long"))
        .cast("long").alias("sum_xy"),
        F.sum(F.col(x_col).cast("long") * F.col(x_col).cast("long"))
        .cast("long").alias("sum_xx"),
    )
    v = ("(cast(1000000 as decimal(38,0)) * (cast(n as decimal(38,0))"
         " * sum_xy - cast(sum_x as decimal(38,0)) * sum_y))")
    m = ("(cast(n as decimal(38,0)) * sum_xx"
         " - cast(sum_x as decimal(38,0)) * sum_x)")
    return agg.select(
        "key", "n", "sum_x", "sum_y", "sum_xy", "sum_xx",
        F.when(
            F.expr(m) > 0,
            F.expr("cast(div({v} - pmod({v}, {m}), {m}) as bigint)"
                   .format(v=v, m=m)),
        ).alias("slope_ppm"),
    )


def autocorrelation(df: DataFrame, key_col: str = "key",
                    t_col: str = "t", v_col: str = "v",
                    lags=(1, 2, 3)) -> DataFrame:
    """Exact per-key sample autocorrelation at the given positional lags
    — the seasonality/persistence read on an integer-valued series
    (hourly event counts, daily volumes): one row per key with ``n``
    and ``acf<k>_ppm = floor(1e6 * r_k)`` for each lag, where

        r_k = sum_{t<=n-k} (x_t - mean)(x_{t+k} - mean)
              / sum_t (x_t - mean)^2

    computed exactly by clearing denominators (multiply through by n²):
    ``num_k = sum (n*x_t - S)(n*x_{t+k} - S)``, ``den = sum (n*x_t -
    S)²`` with S = sum x — every quantity an exact decimal(38,0)
    integer, the floor negative-safe (autocorrelation can be negative;
    Spark div truncates — CLAUDE.md floor spelling on both engines).
    NULL for constant series (den = 0) and for lags >= n.

    Lags are POSITIONAL over the per-key sequence ordered by ``t_col``
    (gaps in t do not insert zeros — resample first if calendar lags
    are needed; `events_forecast`'s hourly rollup shape does exactly
    that upstream).

    Scale shape: expects a BOUNDED per-key series (the output of a
    corpus rollup, e.g. (type, hour) counts — never raw events); all
    three windows (per-key n/S, the ordered position, the k leads)
    share ONE hashpartitioning(key) exchange of that bounded table,
    then a single per-key rollup.  Never a corpus-row window.
    """
    from pyspark.sql import Window

    lags = [int(k) for k in lags]
    if not lags or any(k < 1 for k in lags):
        raise ValueError("lags must be positive integers")
    w_all = Window.partitionBy(key_col)
    w_ord = Window.partitionBy(key_col).orderBy(t_col)
    cols = [
        F.col(key_col).alias("key"),
        F.col(v_col).cast("long").alias("x"),
        F.count("*").over(w_all).cast("long").alias("n"),
        F.sum(F.col(v_col).cast("long")).over(w_all).cast("long")
        .alias("s"),
    ]
    base = df.select(*cols, *[
        F.lead(F.col(v_col).cast("long"), k).over(w_ord)
        .alias("x{}".format(k)) for k in lags
    ])
    dev = "(cast(n as decimal(38,0)) * {x} - s)"
    aggs = [
        F.max("n").cast("long").alias("n"),
        F.sum(F.expr("{d} * {d}".format(d=dev.format(x="x"))))
        .alias("_den"),
    ]
    for k in lags:
        aggs.append(
            F.sum(F.when(
                F.col("x{}".format(k)).isNotNull(),
                F.expr("{a} * {b}".format(a=dev.format(x="x"),
                                          b=dev.format(x="x%d" % k))))
            ).alias("_num{}".format(k)))
    g = base.groupBy("key").agg(*aggs)
    sel = ["key", "n"]
    for k in lags:
        v = "(cast(1000000 as decimal(38,0)) * _num{})".format(k)
        sel.append(F.expr(
            "CASE WHEN _den <> 0 AND _num{k} IS NOT NULL THEN "
            "cast(div({v} - pmod({v}, _den), _den) as bigint) END"
            .format(k=k, v=v)).alias("acf{}_ppm".format(k)))
    return g.select(*sel)


def runs_test(df: DataFrame, key_col: str = "key",
              t_col: str = "t", v_col: str = "v") -> DataFrame:
    """Wald-Wolfowitz runs diagnostic per key — "is this series random
    noise, trending, or oscillating?": classify each point above/below
    the key MEAN (ties dropped, mean compared exactly by
    cross-multiplying ``n*x <> S`` — no float mean), count maximal
    same-sign runs, and report the ratio to the expected run count
    under randomness:

        n1, n2        points above / below the mean
        runs          observed maximal same-sign blocks (in t order)
        ratio_ppm     floor(1e6 * runs / E[runs]),
                      E[runs] = 1 + 2*n1*n2/(n1+n2)

    ~1e6 = random ordering; << 1e6 = trending/clustered (few long
    runs); >> 1e6 = oscillating.  NULL ratio when n1 = 0 or n2 = 0
    (one-sided series — the test is undefined).  All integer/exact-
    rational; deterministic at any parallelism.

    Scale shape: expects the BOUNDED per-key rollup series (same
    contract as :func:`autocorrelation`); the n/S windows, the sign
    lag, and the per-key rollup all run over that bounded table on one
    hashpartitioning(key) exchange.
    """
    from pyspark.sql import Window

    w_all = Window.partitionBy(key_col)
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(t_col).alias("t"),
        F.col(v_col).cast("long").alias("x"),
        F.count("*").over(w_all).cast("long").alias("n"),
        F.sum(F.col(v_col).cast("long")).over(w_all).cast("long")
        .alias("s"),
    ).select(
        "key", "t",
        F.when(F.expr("cast(n as decimal(38,0)) * x > s"), F.lit(1))
        .when(F.expr("cast(n as decimal(38,0)) * x < s"), F.lit(-1))
        .otherwise(F.lit(0)).alias("sign"),
    ).filter(F.col("sign") != 0)
    w_ord = Window.partitionBy("key").orderBy("t")
    marked = base.select(
        "key", "sign",
        F.when(F.lag("sign").over(w_ord).isNull()
               | (F.lag("sign").over(w_ord) != F.col("sign")), 1)
        .otherwise(0).alias("boundary"),
    )
    g = marked.groupBy("key").agg(
        F.sum(F.when(F.col("sign") == 1, 1).otherwise(0))
        .cast("long").alias("n1"),
        F.sum(F.when(F.col("sign") == -1, 1).otherwise(0))
        .cast("long").alias("n2"),
        F.sum("boundary").cast("long").alias("runs"),
    )
    # E[runs] = (n1+n2 + 2*n1*n2) / (n1+n2); ratio = runs/E
    return g.select(
        "key", "n1", "n2", "runs",
        F.when((F.col("n1") > 0) & (F.col("n2") > 0), F.expr(
            "cast(div(cast(runs as decimal(38,0)) * 1000000 * (n1 + n2),"
            " cast(n1 as decimal(38,0)) + n2 + 2 * cast(n1 as"
            " decimal(38,0)) * n2) as bigint)")).alias("ratio_ppm"),
    )


def markov_stationary(trans: DataFrame, rounds: int = 6,
                      scale: int = 10 ** 12) -> DataFrame:
    """Stationary distribution of an observed Markov transition matrix
    by fixed-point integer power iteration — "where does the
    clickstream settle?" (long-run state occupancy from the
    `events_transitions` count matrix).

    ``trans``: (prev, next, n) transition counts.  Iteration runs in
    integers at ``scale``: mass starts uniform (``scale div k``) and
    each round moves ``div(mass_i * n_ij, row_total_i)`` along every
    observed edge (truncation loses < k² units/round — deterministic,
    bit-identical across engines; the pagerank discipline).  SINK
    states (observed only as ``next``) hold their mass (self-loop
    semantics).  Returns ``(state, mass, p_ppm)`` after ``rounds``.

    Scale shape: the corpus never enters this operator — it consumes
    the vocab-bounded count matrix (k states, <= k² edges), so every
    per-round join is broadcast-sized; each round eagerly
    localCheckpoints the k-row mass vector (plan depth stays O(1) —
    the vector re-enters twice per round, which would otherwise square
    the lazy plan).  The one driver-side value is k itself (the state-
    vocabulary count — bounded by contract, the kmeans-k discipline).
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    t = trans.select(F.col("prev"), F.col("next"),
                     F.col("n").cast("long").alias("n"))
    states = (
        t.select(F.col("prev").alias("state"))
        .union(t.select(F.col("next").alias("state")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    k = states.count()
    rowt = t.groupBy("prev").agg(F.sum("n").cast("long").alias("row_total"))
    t2 = t.join(rowt, on="prev").localCheckpoint(eager=True)
    sinks = states.join(t.select(F.col("prev").alias("state")).distinct(),
                        on="state", how="left_anti") \
        .localCheckpoint(eager=True)
    pi = states.withColumn("mass",
                           F.lit(int(scale) // int(k)).cast("long"))
    for _ in range(int(rounds)):
        inflow = (
            pi.join(t2, pi["state"] == t2["prev"])
            .groupBy(F.col("next").alias("state"))
            .agg(F.sum(F.expr(
                "cast(div(cast(mass as decimal(38,0)) * n, row_total)"
                " as bigint)")).cast("long").alias("_in"))
        )
        hold = (
            pi.join(sinks, on="state", how="left_semi")
            .select("state", F.col("mass").alias("_hold"))
        )
        pi = (
            states.join(inflow, on="state", how="left")
            .join(hold, on="state", how="left")
            .select("state",
                    (F.coalesce("_in", F.lit(0))
                     + F.coalesce("_hold", F.lit(0)))
                    .cast("long").alias("mass"))
            .localCheckpoint(eager=True)
        )
    return pi.select(
        "state", "mass",
        F.expr("cast(div(mass, {}) as bigint)".format(int(scale) // 10**6))
        .alias("p_ppm"),
    )


def robust_anomaly(df: DataFrame, key_col: str = "key",
                   t_col: str = "t", v_col: str = "v",
                   k: int = 5) -> DataFrame:
    """Median/MAD outlier detection per key — the robust complement to
    the trailing-mean spike detector (`events_anomaly`): a point is
    anomalous when ``|x - median| > k * MAD`` (both the median and the
    MAD are the exact DISCRETE medians — `group_quantiles`' p50
    position math, ``pos = ceil(n/2)`` — so every quantity is an
    integer drawn from the data and the comparison needs no division
    at all).  Unlike mean/stddev rules, one huge spike cannot mask
    another.  When MAD = 0 (a majority-constant series) any nonzero
    deviation flags (documented fallback).  Returns only the flagged
    rows: ``(key, t, v, med, mad)``.

    Scale shape: expects the BOUNDED per-key rollup series (the
    `autocorrelation` contract); two rank-window passes (values, then
    deviations) and two key-bounded equi-joins, all on
    hashpartitioning(key) exchanges of that bounded table.
    """
    from pyspark.sql import Window

    def _median(frame, col, out):
        w = Window.partitionBy("key").orderBy(col)
        ranked = frame.select(
            "key", F.col(col),
            F.row_number().over(w).alias("_r"),
            F.count("*").over(Window.partitionBy("key")).alias("_n"),
        )
        return ranked.groupBy("key").agg(
            F.min(F.when(F.expr("_r = (_n + 1) div 2"), F.col(col)))
            .cast("long").alias(out))

    base = df.select(F.col(key_col).alias("key"),
                     F.col(t_col).alias("t"),
                     F.col(v_col).cast("long").alias("v"))
    med = _median(base, "v", "med")
    dev = base.join(med, on="key").select(
        "key", "t", "v", "med",
        F.abs(F.col("v") - F.col("med")).alias("_dev"))
    mad = _median(dev, "_dev", "mad")
    return (
        dev.join(mad, on="key")
        .filter((F.col("_dev") > F.lit(int(k)) * F.col("mad")))
        .select("key", "t", "v", "med", "mad")
    )


def dispersion_index(
    df: DataFrame,
    key_col: str = "key",
    t_col: str = "t",
    v_col: str = "v",
) -> DataFrame:
    """Fano factor (index of dispersion) per key over a slotted count
    series — the burstiness diagnostic that complements the runs test:
    a Poisson arrival stream reads ~1e6 ppm, clumped/bursty traffic
    reads above, clockwork-regular traffic below.  Input rows are
    ``(key, t, v)`` with ``t`` an integer slot id and ``v`` the slot's
    event count; SLOTS WITH ZERO EVENTS NEED NO ROW — the statistic is
    computed over the key's full observed span ``[min t, max t]``, with
    missing slots entering as exact zeros through the closed form
    (never an explode of the span):

        n         = max(t) - min(t) + 1        (span slots)
        fano_ppm  = floor(1e6 * (n*svv - sv^2) / (n * sv))

    where ``sv``/``svv`` are the sum and sum-of-squares of the present
    values (zero slots contribute 0 to both; the n*m^2 mean-shift term
    in the variance identity accounts for them exactly).  The numerator
    is non-negative by Cauchy-Schwarz over the n slots, so plain
    truncating division is the floor on both engines.  ``fano_ppm`` is
    NULL when the key has zero total mass.  Sums run in decimal(38,0)
    (svv passes int64 only up to ~3e9 per-slot counts).

    Output: ``(key, n_slots, nz_slots, total, fano_ppm)``.

    Scale shape: ONE map-side-combined per-key aggregate collapses the
    (already slot-rolled) series; the ratio is pure codegen on the
    key-bounded rollup.  No window, no join, no python.
    """
    v = F.col(v_col).cast("decimal(38,0)")
    g = df.groupBy(F.col(key_col).alias("key")).agg(
        (F.max(t_col) - F.min(t_col) + 1).cast("long").alias("n_slots"),
        F.count("*").cast("long").alias("nz_slots"),
        F.sum(v).alias("_sv"),
        F.sum(v * v).alias("_svv"),
    )
    return g.select(
        "key", "n_slots", "nz_slots",
        F.col("_sv").cast("long").alias("total"),
        F.when(F.col("_sv") > 0,
               F.expr("cast(div(1000000 * (n_slots * _svv - _sv * _sv),"
                      " cast(n_slots as decimal(38,0)) * _sv) as bigint)"))
        .alias("fano_ppm"),
    )


def interarrival_quantiles(
    events: DataFrame,
    key_col: str = "key",
    entity_col: str = "entity",
    t_col: str = "t",
    percentiles=(50, 90, 99),
) -> DataFrame:
    """Inter-arrival gap percentiles per key — the latency/engagement
    cadence read (median seconds between a user's events, p99 crawl
    revisit gap): per (key, entity) the events sort by time and emit
    successive differences; per key the exact discrete percentiles of
    those gaps ship via the stats.group_quantiles primitive.
    Determinism: ties in ``t`` permute only equal values, so the GAP
    MULTISET — and therefore every percentile — is a pure function of
    the input multiset.  Output: ``(key, n, p50, p90, p99)`` with
    ``n`` = gap count (events minus one per active entity).

    Scale shape: ONE hash exchange on (key, entity) for the lag window
    (per-entity sequences are session-bounded — the events_paths
    contract); the quantile ranks run on the per-key gap table (one
    exchange on key, reused by rank/count/final agg — the
    group_quantiles shape).  No python, no corpus-wide window.
    """
    from pyspark.sql import Window

    from .stats import group_quantiles

    w = Window.partitionBy(key_col, entity_col).orderBy("_t")
    gaps = (
        events.select(key_col, entity_col,
                      F.col(t_col).cast("long").alias("_t"))
        .withColumn("_gap", F.col("_t") - F.lag("_t").over(w))
        .filter(F.col("_gap").isNotNull())
    )
    return group_quantiles(gaps, "_gap", key_col,
                           percentiles=percentiles)
