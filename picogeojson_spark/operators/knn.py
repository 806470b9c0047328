"""k-nearest-neighbour join via k-ring expansion + exact tail fallback.

Scale design (SURVEY §2.11): both sides are indexed into cells at ``level``;
each query joins candidates whose cell lies within Chebyshev distance ``r``
of the query cell (the candidate side explodes a (2r+1)² neighbourhood once —
cheap for the small-r common case), then a window takes the top-k by
distance. Exactness guard: any candidate outside the searched ring is at
least ``r * cell_size`` degrees away, so queries whose k-th neighbour is
farther than that (or that found < k) are re-run by brute force against the
full candidate set — a tiny, provably-exact tail.

Distance is squared planar degrees ``(Δlon)² + (Δlat)²`` with ties broken by
candidate id — the same formula the SQL oracle uses, so output rows match
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..geo.cells import DEFAULT_LEVEL, X_SHIFT, cell_of, grid_shape


def _with_cell_xy(df: DataFrame, id_col: str, level: int) -> DataFrame:
    """Attach integer cell (x, y) grid coordinates, computed JVM-side."""
    nx, ny = grid_shape(level)
    x = F.least(
        F.floor((F.col("lon") + F.lit(180.0)) / F.lit(360.0) * F.lit(nx)),
        F.lit(nx - 1),
    )
    y = F.least(
        F.floor((F.col("lat") + F.lit(90.0)) / F.lit(180.0) * F.lit(ny)),
        F.lit(ny - 1),
    )
    return df.withColumn("cx", F.greatest(x, F.lit(0)).cast("long")).withColumn(
        "cy", F.greatest(y, F.lit(0)).cast("long")
    )


def _dist2(qlon, qlat, clon, clat):
    return (qlon - clon) * (qlon - clon) + (qlat - clat) * (qlat - clat)


def choose_level(n_candidates: int, k: int, radius: int) -> int:
    """Pick the coarsest cell level whose (2r+1)² ring is expected to hold
    comfortably more than k candidates under uniform density — queries then
    settle without the brute-force tail. Skewed densities only cost extra
    ring candidates (dense areas) or tail fallbacks (sparse areas); output
    stays exact either way."""
    import math

    target = max(4 * k, 16)
    x = max(n_candidates * (2 * radius + 1) ** 2 / target, 2.0)
    level = int((math.log2(x) - 1) // 2)
    return max(2, min(level, 14))


def knn_join(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    level: int = None,
    radius: int = 1,
    cache: str = "checkpoint",
) -> DataFrame:
    """Exact kNN -> DataFrame(query_id, rank, neighbor_id, dist2).

    ``queries``: (query_id, lon, lat); ``candidates``: (neighbor_id, lon, lat).
    A candidate at the same coordinates as the query is its own neighbour
    (no self-exclusion — callers can filter ``query_id != neighbor_id``).
    ``level=None`` auto-tunes from the candidate count (one cheap count job).

    ``cache`` controls how the ring-candidate intermediate (consumed three
    times: settled filter, anti-join, output) is materialized:

    - ``"checkpoint"`` (default): ``localCheckpoint(eager=True)`` — the
      operator owns the lifecycle; blocks are freed by the ContextCleaner
      when the result DataFrame is garbage-collected, so long-lived
      sessions cannot leak. Trade: lineage is severed (executor loss needs
      a re-run) and it measures ~25% slower than persist at sf0.1.
    - ``"persist"``: fastest, but the cache entry outlives the call — the
      handle is exposed as ``result._knn_cached`` and the CALLER must
      ``.unpersist()`` it after consuming the result.
    - ``"none"``: no materialization (consumers recompute the ring join).
    """
    if cache not in ("checkpoint", "persist", "none"):
        raise ValueError("cache must be checkpoint|persist|none: " + cache)
    if level is None:
        level = choose_level(candidates.count(), k, radius)
    nx, ny = grid_shape(level)
    cell_deg = 180.0 / (2**level)

    q = _with_cell_xy(queries, "query_id", level).select(
        F.col("query_id"), F.col("lon").alias("qlon"), F.col("lat").alias("qlat"),
        "cx", "cy",
    )
    c = _with_cell_xy(candidates, "neighbor_id", level).select(
        F.col("neighbor_id"), F.col("lon").alias("clon"), F.col("lat").alias("clat"),
        "cx", "cy",
    )

    # candidate side explodes its (2r+1)^2 neighbourhood (lon-wrapped) so the
    # ring lookup is a plain equi-join on (cx, cy)
    offsets = [(dx, dy) for dx in range(-radius, radius + 1)
               for dy in range(-radius, radius + 1)]
    off = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx, dy in offsets])
    c_ex = (
        c.withColumn("o", F.explode(off))
        .select(
            "neighbor_id", "clon", "clat",
            F.pmod(F.col("cx") + F.col("o.dx"), F.lit(nx)).alias("cx"),
            (F.col("cy") + F.col("o.dy")).alias("cy"),
        )
        .filter((F.col("cy") >= 0) & (F.col("cy") < ny))
    )

    joined = q.join(c_ex, on=["cx", "cy"]).select(
        "query_id", "qlon", "qlat", "neighbor_id", "clon", "clat",
        _dist2(F.col("qlon"), F.col("qlat"), F.col("clon"), F.col("clat")).alias("dist2"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(),
                                               F.col("neighbor_id").asc())
    ringed = (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dist2")
    )
    # ringed feeds three consumers (settled filter, anti-join, output) —
    # see the ``cache`` docstring for the lifecycle trade-offs
    if cache == "persist":
        ringed = ringed.persist()
    elif cache == "checkpoint":
        ringed = ringed.localCheckpoint(eager=True)

    # exactness guard: a query is settled iff it found k neighbours and its
    # k-th distance is within the ring guarantee radius
    guard = float(radius * cell_deg) ** 2
    stats = ringed.groupBy("query_id").agg(
        F.count("*").alias("found"), F.max("dist2").alias("kth")
    )
    settled_ids = stats.filter(
        (F.col("found") >= k) & (F.col("kth") <= F.lit(guard))
    ).select("query_id")

    # NO broadcast hint on settled_ids: it has one row per settled query,
    # which at production scale is the full query cardinality — forcing a
    # broadcast would collect it to the driver. AQE broadcasts it anyway
    # whenever it is actually small (runtime stats), so small cases lose
    # nothing and large ones stay shuffle joins
    settled = ringed.join(settled_ids, on="query_id")

    # brute-force tail for the rest (rare; exact by construction)
    rest = queries.join(settled_ids, on="query_id", how="left_anti")
    brute = rest.select(
        "query_id", F.col("lon").alias("qlon"), F.col("lat").alias("qlat")
    ).crossJoin(
        candidates.select(
            "neighbor_id", F.col("lon").alias("clon"), F.col("lat").alias("clat")
        )
    ).select(
        "query_id",
        "neighbor_id",
        _dist2(F.col("qlon"), F.col("qlat"), F.col("clon"), F.col("clat")).alias("dist2"),
    )
    brute_k = (
        brute.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dist2")
    )
    out = settled.unionByName(brute_k)
    if cache == "persist":
        out._knn_cached = ringed  # cleanup handle (see ``cache`` docstring)
    return out
