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
