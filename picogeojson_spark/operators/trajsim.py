"""Point-set similarity joins: discrete Hausdorff distance under a
threshold, cell-prefiltered.

"Which entities moved through (almost) the same places?" is the
trajectory-mining primitive behind carpool detection, route dedup and
map-matching QA.  The discrete symmetric Hausdorff distance

    H(A, B) = max( max_a min_b d(a, b),  max_b min_a d(a, b) )

is a SET distance (visit order and duplicates don't matter), so it
composes with a grid prefilter exactly: if H(A, B) <= T then EVERY point
of A is within T of some point of B, hence A and B share a (3x3-
expanded) cell at cell size >= T — the prefilter provably drops no
qualifying pair (the geofence/snap proof shape; the gate's brute oracle
hash-equality IS the completeness proof).

Everything is exact int64 arithmetic on micro-degree planar coordinates
(squared distances — no sqrt, no floats), bit-identical to the DuckDB
replay.
"""

from pyspark.sql import DataFrame, functions as F

#: 3x3 neighbor offsets for the candidate cell join.
_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def hausdorff_pairs(
    points: DataFrame,
    threshold_udeg: int,
    entity_col: str = "entity",
    x_col: str = "x_udeg",
    y_col: str = "y_udeg",
) -> DataFrame:
    """All entity pairs whose symmetric discrete Hausdorff distance is
    <= ``threshold_udeg``: ``(entity_a, entity_b, hausdorff_sq)`` with
    ``entity_a < entity_b`` and the exact squared distance in udeg^2.

    Input: one row per observed point ``(entity, x_udeg, y_udeg)``
    (int64 micro-degrees).  Per-entity point sets must be BOUNDED
    (trajectories, not corpora — the staypoints/turns contract); they
    are collected to arrays once and the per-pair max-min runs as a
    nested higher-order expression over those two bounded arrays, fully
    JVM-side.  The arrays are aggregate outputs (bound attributes), so
    the CLAUDE.md HOF-inlining hazard does not apply.

    Scale shape: ONE distinct (entity, cell) aggregate + ONE 9-offset
    equi-join between entity cell sets generates candidates (never an
    entity cross join — far-apart entities are never paired); candidate
    pairs then equi-join twice against the per-entity array table.
    Coordinates must satisfy ``2 * max|coord|^2 < 2^63`` (holds for the
    whole +-180e6 udeg planet with 40x headroom).
    """
    t = int(threshold_udeg)
    if t <= 0:
        raise ValueError("threshold_udeg must be > 0")
    pts = points.select(
        F.col(entity_col).alias("entity"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    arrs = pts.groupBy("entity").agg(
        F.collect_list(F.struct("x", "y")).alias("pts"))
    cells = pts.select(
        "entity",
        F.expr("div(x - pmod(x, {t}), {t})".format(t=t)).alias("cx"),
        F.expr("div(y - pmod(y, {t}), {t})".format(t=t)).alias("cy"),
    ).distinct()
    off = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in _OFFSETS])).alias("o")
    a = cells.select(
        F.col("entity").alias("entity_a"), "cx", "cy", off
    ).select(
        "entity_a",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = cells.select(
        F.col("entity").alias("entity_b"),
        F.col("cx").alias("jx"), F.col("cy").alias("jy"))
    cand = (
        a.join(b, on=["jx", "jy"])
        .filter(F.col("entity_a") < F.col("entity_b"))
        .select("entity_a", "entity_b")
        .distinct()
    )
    dsq = ("((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))")
    directed = (
        "array_max(transform(pa, a -> "
        "array_min(transform(pb, b -> {d}))))".format(d=dsq))
    directed_rev = (
        "array_max(transform(pb, b -> "
        "array_min(transform(pa, a -> {d}))))".format(d=dsq))
    return (
        cand
        .join(arrs.select(F.col("entity").alias("entity_a"),
                          F.col("pts").alias("pa")), on="entity_a")
        .join(arrs.select(F.col("entity").alias("entity_b"),
                          F.col("pts").alias("pb")), on="entity_b")
        .select(
            "entity_a", "entity_b",
            F.greatest(F.expr(directed), F.expr(directed_rev))
            .cast("long").alias("hausdorff_sq"),
        )
        .filter(F.col("hausdorff_sq") <= F.lit(t * t))
    )


_DTW_EXPR = """
aggregate(
  pa,
  cast(array() as array<bigint>),
  (prev, a) -> aggregate(
      pb,
      cast(array() as array<bigint>),
      (acc, b) -> array_append(acc,
        ((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) +
        CASE
          WHEN size(prev) = 0 THEN
            CASE WHEN size(acc) = 0 THEN cast(0 as bigint)
                 ELSE element_at(acc, size(acc)) END
          WHEN size(acc) = 0 THEN element_at(prev, 1)
          ELSE least(element_at(prev, size(acc) + 1),
                     element_at(prev, size(acc)),
                     element_at(acc, size(acc)))
        END),
      acc -> acc),
  prev -> element_at(prev, size(prev)))
"""


def dtw_pairs(
    points: DataFrame,
    max_cost: int,
    cell_udeg: int,
    entity_col: str = "entity",
    seq_col: str = "seq",
    x_col: str = "x_udeg",
    y_col: str = "y_udeg",
) -> DataFrame:
    """Dynamic-time-warping trajectory similarity join: all entity
    pairs whose exact DTW cost (sum of squared planar udeg distances
    along the optimal monotone warping path) is <= ``max_cost``;
    returns ``(entity_a, entity_b, dtw_cost)`` with ``entity_a <
    entity_b``.  Unlike :func:`hausdorff_pairs` this is ORDER-
    sensitive — the same places visited in a different order score
    differently — so per-entity arrays sort by ``seq_col`` (must be
    unique per entity).

    The DP runs entirely JVM-side as a nested higher-order fold (row
    recurrence ``D[i][j] = c_ij + min(D[i-1][j], D[i][j-1],
    D[i-1][j-1])`` with the standard first-row/first-column borders),
    exact in int64: the bound is ``(n+m) * 2 * max|coord|^2 < 2^63`` —
    a 40-cell path across the whole +-180e6 udeg planet stays under
    2^62.  Per-entity point counts must be bounded (the trajectory
    contract); cost is O(n*m) per candidate pair.

    Candidates come from the same provably complete 3x3 cell prefilter
    as Hausdorff: a pair with DTW <= max_cost matches EVERY a-point to
    some b-point at squared distance <= max_cost, so the pair shares an
    expanded cell whenever ``cell_udeg^2 >= max_cost`` (asserted).
    """
    if max_cost <= 0:
        raise ValueError("max_cost must be > 0")
    if int(cell_udeg) ** 2 < int(max_cost):
        raise ValueError(
            "cell_udeg^2 must be >= max_cost for a complete prefilter")
    t = int(cell_udeg)
    pts = points.select(
        F.col(entity_col).alias("entity"),
        F.col(seq_col).alias("seq"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    arrs = pts.groupBy("entity").agg(
        F.expr("transform(sort_array(collect_list(struct(seq, x, y))),"
               " p -> struct(p.x as x, p.y as y))").alias("pts"))
    cells = pts.select(
        "entity",
        F.expr("div(x - pmod(x, {t}), {t})".format(t=t)).alias("cx"),
        F.expr("div(y - pmod(y, {t}), {t})".format(t=t)).alias("cy"),
    ).distinct()
    off = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in _OFFSETS])).alias("o")
    a = cells.select(
        F.col("entity").alias("entity_a"), "cx", "cy", off
    ).select(
        "entity_a",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = cells.select(
        F.col("entity").alias("entity_b"),
        F.col("cx").alias("jx"), F.col("cy").alias("jy"))
    cand = (
        a.join(b, on=["jx", "jy"])
        .filter(F.col("entity_a") < F.col("entity_b"))
        .select("entity_a", "entity_b")
        .distinct()
    )
    return (
        cand
        .join(arrs.select(F.col("entity").alias("entity_a"),
                          F.col("pts").alias("pa")), on="entity_a")
        .join(arrs.select(F.col("entity").alias("entity_b"),
                          F.col("pts").alias("pb")), on="entity_b")
        .select("entity_a", "entity_b",
                F.expr(_DTW_EXPR).cast("long").alias("dtw_cost"))
        .filter(F.col("dtw_cost") <= F.lit(int(max_cost)))
    )


def colocation_pairs(
    points: DataFrame,
    cell_udeg: int,
    bucket_us: int,
    min_events: int = 1,
    entity_col: str = "entity",
    ts_us_col: str = "ts_us",
    x_col: str = "x_udeg",
    y_col: str = "y_udeg",
) -> DataFrame:
    """Spatio-temporal co-location mining (co-travel / contact-tracing
    join): entity pairs observed in the SAME space-time bucket —
    ``floor`` cell of ``cell_udeg`` x ``floor`` bucket of ``bucket_us``
    — in at least ``min_events`` DISTINCT buckets.  Returns
    ``(entity_a, entity_b, n_cobuckets)`` with ``entity_a <
    entity_b``.  Sharp bucket boundaries are the CONTRACT (the
    grid-DBSCAN convention): two entities 1 udeg apart across a cell
    edge do not co-locate — callers wanting tolerance run a second pass
    at offset grids.

    Scale shape: per-entity presence dedups to DISTINCT (entity, cell,
    bucket) FIRST (one map-side-combined aggregate — an entity pinging
    1000x from one place counts once), then ONE self equi-join on the
    bucket key + one pair count.  The join fan-out is quadratic ONLY in
    per-bucket entity occupancy, which the caller bounds via cell /
    bucket sizing (same justification as the basket-bounded
    co-occurrence graph); hot buckets land on join keys where AQE skew
    handling applies.  All integer floor arithmetic (explicit
    ``div``/``pmod`` spelling — coordinates may be negative).
    """
    c = int(cell_udeg)
    b = int(bucket_us)
    if c <= 0 or b <= 0:
        raise ValueError("cell_udeg and bucket_us must be > 0")
    if min_events < 1:
        raise ValueError("min_events must be >= 1")
    pres = points.select(
        F.col(entity_col).alias("entity"),
        F.expr("div({x} - pmod({x}, {c}), {c})"
               .format(x=x_col, c=c)).alias("cx"),
        F.expr("div({y} - pmod({y}, {c}), {c})"
               .format(y=y_col, c=c)).alias("cy"),
        F.expr("div({t} - pmod({t}, {b}), {b})"
               .format(t=ts_us_col, b=b)).alias("tb"),
    ).distinct()
    a = pres.select(F.col("entity").alias("entity_a"), "cx", "cy", "tb")
    bb = pres.select(F.col("entity").alias("entity_b"), "cx", "cy", "tb")
    return (
        a.join(bb, on=["cx", "cy", "tb"])
        .filter(F.col("entity_a") < F.col("entity_b"))
        .groupBy("entity_a", "entity_b")
        .agg(F.count("*").cast("long").alias("n_cobuckets"))
        .filter(F.col("n_cobuckets") >= F.lit(int(min_events)))
    )
