"""OLAP cube / grouping-sets rollups.

The "one query, every margin" aggregation: a CUBE over d dimensions
computes all 2^d grouping sets in ONE pass — Spark plans it as a single
Expand + one hash aggregate, so the corpus is scanned once and each
partial aggregate is map-side combined per grouping set.  This is the
idiomatic Spark spelling of the dashboard rollup fan-out (per-type,
per-day, per-type-and-day, grand total) that would otherwise be 2^d
separate scans.
"""

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.column import Column


def cube_rollup(df: DataFrame, dims, measures) -> DataFrame:
    """CUBE over ``dims`` (list of column names) computing ``measures``
    (dict name -> aggregate Column): one row per grouping set per key,
    with margin keys COALESCED to sentinels ("(all)" for strings, -1
    for numerics — callers whose real key space contains the sentinel
    must pick different dims) and an explicit ``gflags`` bitmask
    (bit i set <=> dims[i] is rolled up, dims[0] most significant —
    spelled as per-column ``grouping()`` so no engine bit-order is
    trusted).

    Scale shape: ONE Expand(2^d) + ONE map-side-combined hash aggregate
    — the input is scanned once; the expand multiplies rows 2^d-fold
    BEFORE partial aggregation but the partials collapse per grouping
    set map-side, so the exchange carries only the 2^d aggregate
    tables, not 2^d copies of the corpus.
    """
    if not dims:
        raise ValueError("dims must be non-empty")
    cube = df.cube(*dims)
    gflags = None
    for d in dims:
        bit = F.grouping(d).cast("long")
        gflags = bit if gflags is None else gflags * 2 + bit
    aggs = [v.alias(k) for k, v in measures.items()]
    out = cube.agg(gflags.alias("gflags"), *aggs)
    keyed = []
    for d in dims:
        typ = dict(out.dtypes)[d]
        sent = F.lit("(all)") if typ == "string" else F.lit(-1)
        keyed.append(F.coalesce(F.col(d), sent).alias(d))
    return out.select(*keyed, "gflags", *measures.keys())


def abc_classes(totals: DataFrame, key_col: str = "key",
                value_col: str = "v", a_pct: int = 80,
                b_pct: int = 95) -> DataFrame:
    """ABC / Pareto classification of a pre-aggregated (key, value)
    table — the inventory/catalog 80-15-5 cut ("which parts are the A
    items?"), and for corpora the head/torso/tail domain split.  An
    item's class comes from the cumulative share BEFORE it in the
    ``(value DESC, key ASC)`` order, cross-multiplied so everything is
    integer-exact:

        A  if cum_before * 100 < a_pct * total      (the first item is
        B  elif cum_before * 100 < b_pct * total     always A)
        C  otherwise

    (the item that CROSSES a boundary belongs to the upper class —
    sharp, deterministic, division-free).  Output: ``(key, v, rnk,
    cum, cls)`` with ``cum`` inclusive.

    Scale shape: consumes a DIMENSION-sized rollup (parts, domains,
    SKUs — the caller aggregates the corpus first, one map-side-
    combined groupBy), so the unpartitioned rank/cumsum windows run
    over a bounded table (the AUC-histogram justification).  For
    corpus-cardinality keys use `gini_concentration`/`value_cdf`
    instead — those never rank individual keys.
    """
    if not (0 < a_pct < b_pct <= 100):
        raise ValueError("need 0 < a_pct < b_pct <= 100")
    from pyspark.sql import Window

    w_ord = Window.orderBy(F.desc("v"), F.asc("key"))
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    base = totals.select(F.col(key_col).alias("key"),
                         F.col(value_col).cast("long").alias("v"))
    ranked = base.select(
        "key", "v",
        F.row_number().over(w_ord).cast("long").alias("rnk"),
        F.sum("v").over(w_run).cast("long").alias("cum"),
        F.sum("v").over(w_all).cast("long").alias("total"),
    )
    cb = (F.col("cum") - F.col("v")) * 100
    return ranked.select(
        "key", "v", "rnk", "cum",
        F.when(cb < F.lit(int(a_pct)) * F.col("total"), "A")
        .when(cb < F.lit(int(b_pct)) * F.col("total"), "B")
        .otherwise("C").alias("cls"),
    )
