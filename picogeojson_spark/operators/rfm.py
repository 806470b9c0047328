"""RFM (recency / frequency / monetary) user segmentation.

The classic CRM segmentation: per user, days-since-last-purchase,
purchase count, and lifetime spend, each bucketed into quintiles 1-5
(5 = best), plus the combined three-digit RFM code.

Exact, engine-portable bucketing WITHOUT a global sort: quintile cutoffs
come from the same histogram-percentile construction as
``textstats.quality_percentile_flags`` — each metric is an integer with
bounded cardinality (recency coarsened to DAYS; frequency and cents
naturally clustered), so the exact ``(p*n+99) div 100`` discrete
percentile is a prefix scan over a histogram, never over users. The
three 1-row cutoff tables attach to the user table as broadcast scalars
(the ``text_surprisal`` / ``bm25`` shape — documented in the gate's
PLAN_ALLOW_CROSS).

Direction: all three metrics are "higher is better" by construction —
recency is bucketed on last-seen DAY (more recent = larger), so no
max-timestamp scalar pass is needed. Ties at a cutoff share the lower
bucket (bucket = 1 + #cutoffs strictly below the value) — a pure integer
function of the multiset, identical across engines and partitionings.

Scale shape: ONE corpus-sized shuffle (the per-user aggregate); the
histograms, prefix scans and cutoff rows are all metric-cardinality-
sized; the final bucket assignment is pure expressions on the user
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._util import attach_scalar

_DAY_US = 86_400_000_000
_QUINTILES = (20, 40, 60, 80)


def _cutoffs(users: DataFrame, col: str) -> DataFrame:
    """1-row DataFrame with columns ``{col}_c20 .. {col}_c80``: the exact
    discrete 20/40/60/80th percentiles of ``col``, via histogram + prefix
    scan (window partitions are histogram-sized, not user-sized)."""
    hist = users.groupBy(col).agg(F.count("*").cast("long").alias("cnt"))
    w_cum = (Window.orderBy(col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = hist.select(
        F.col(col).alias("val"),
        F.sum("cnt").over(w_cum).alias("cume"),
        F.sum("cnt").over(
            Window.orderBy(col)
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)).alias("n"),
    )
    aggs = [
        F.min(F.when(
            F.col("cume") >= F.expr("({p} * n + 99) div 100".format(p=p)),
            F.col("val"))).alias("{}_c{}".format(col, p))
        for p in _QUINTILES
    ]
    return cum.agg(*aggs)


def _bucket(col: str):
    b = F.lit(1)
    for p in _QUINTILES:
        b = b + (F.col(col) > F.col("{}_c{}".format(col, p))).cast("int")
    return b.cast("int")


def rfm_segments(events: DataFrame, ts_us_col: str = "ts_us",
                 user_col: str = "user_id",
                 cents_col: str = "cents") -> DataFrame:
    """Input: one row per purchase event with integer epoch-microsecond
    ``ts_us_col`` (must be >= 0) and integer ``cents_col``. Output: one
    row per user — ``(user_id, last_day, freq, monetary, r_bucket,
    f_bucket, m_bucket, rfm_code)``."""
    users = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.max(F.expr("{} div {}".format(ts_us_col, _DAY_US)))
        .cast("long").alias("last_day"),
        F.count("*").cast("long").alias("freq"),
        F.sum(cents_col).cast("long").alias("monetary"),
    )
    # the user table feeds three histogram passes + the final select —
    # cut the lineage so the corpus-sized aggregate runs exactly once.
    users = users.localCheckpoint(eager=False)
    out = users
    for m in ("last_day", "freq", "monetary"):
        out = attach_scalar(out, _cutoffs(users, m))
    r, f, mo = _bucket("last_day"), _bucket("freq"), _bucket("monetary")
    return out.select(
        "user_id", "last_day", "freq", "monetary",
        r.alias("r_bucket"), f.alias("f_bucket"), mo.alias("m_bucket"),
        (r * 100 + f * 10 + mo).cast("int").alias("rfm_code"),
    )


def decayed_activity(
    events: DataFrame,
    ref_ts: str,
    half_life_us: int = 3 * 86_400_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    scale_bits: int = 20,
) -> DataFrame:
    """Exponentially time-decayed engagement score per user — the
    streaming-free spelling of a decayed counter (Song et al. style
    half-life scoring): an event ``age`` half-lives old contributes
    ``2^scale_bits >> age``, so a user's score halves every
    ``half_life_us`` of inactivity.

    Exactness contract: ``age = (ref - ts) // half_life`` in PURE NTZ
    microsecond arithmetic (``timestampdiff`` against a TIMESTAMP_NTZ
    literal — session-timezone-independent, the ``_ntz_epoch_us`` rule);
    the decay is an integer shift (``scale // (1 << age)``), never a
    float ``pow`` — both engines branch and round identically.  Events
    after ``ref_ts`` are dropped (a decayed score is a statement about a
    reference instant).  Ages beyond 62 clamp (contribution is already 0
    past ``scale_bits``).

    Output: ``user_id, n_events, decayed_score`` (scaled by
    ``2^scale_bits``), ``newest_age`` (half-lives since last activity —
    the recency signal).

    Scale shape: pure per-row codegen + ONE map-side-combined aggregate;
    no joins, no windows, no scalar subqueries (the reference instant is
    a parameter, not a data-dependent max).
    """
    if not 1 <= scale_bits <= 62:
        raise ValueError("scale_bits must be in [1, 62]")
    scale = 1 << scale_bits
    # Filter on the RAW microsecond delta, not the truncated age: Spark's
    # div truncates toward zero, so an event in (ref_ts, ref_ts + h) has
    # delta in (-h, 0) -> truncated age 0, and an age-based filter would
    # keep a FUTURE event at full weight (the oracle filters the raw
    # delta, and the contract is "events after ref_ts are dropped").
    delta = F.expr(
        "timestampdiff(MICROSECOND, {c}, TIMESTAMP_NTZ '{r}')".format(
            c=ts_col, r=ref_ts)
    )
    age = F.expr("least(div(_delta, {h}), 62L)".format(h=int(half_life_us)))
    contrib = F.expr(
        "div({s}L, shiftleft(1L, cast(_age as int)))".format(s=scale))
    return (
        events.withColumn("_delta", delta)
        .filter(F.col("_delta") >= 0)
        .withColumn("_age", age)
        .withColumn("_contrib", contrib)
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("_contrib").cast("long").alias("decayed_score"),
            F.min("_age").cast("long").alias("newest_age"),
        )
    )
