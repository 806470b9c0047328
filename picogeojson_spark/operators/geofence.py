"""Geofence transition detection: enter/exit events per (entity, fence).

The fleet-telemetry / location-analytics staple: given an ordered point
stream per entity and a small set of axis-aligned fence boxes (possibly
overlapping), emit one row per containment TRANSITION — ``enter`` when a
point lies inside a fence its predecessor was outside of (the first
point of an entity counts as entering every fence that contains it),
``exit`` when the previous point was inside and the current one is not.
The reference's bbox containment semantics (``geo/bbox.py`` half-open
vs closed handling does not apply here — fences are caller-supplied
CLOSED integer boxes: ``lat_min_u <= lat_u <= lat_max_u`` and likewise
for lon, matching DuckDB ``BETWEEN``).

Scale shape (the 100 TB posture):

- Fences are a small dimension (thousands vs billions of points).  Each
  fence is exploded into its covering grid cells (``sequence`` over the
  floor-div cell ranges — pure codegen) and BROADCAST; the corpus-sized
  point stream joins on its single cell key with the exact containment
  test inside the join condition, so the big side never shuffles for
  the match and a point meets only fences overlapping its cell.
- A fence covering that cell appears exactly once per cell (covers are
  distinct by construction), and a point has exactly one cell, so the
  join emits at most one row per (point, fence) — no dedup needed.
- The per-point fence SET (``collect_set`` over the left join, empty
  for fence-free points — those are load-bearing: they produce exits)
  is tiny; transitions are ``array_except`` diffs of consecutive sets
  under a per-entity lag window.  The two exchanges (groupBy
  (entity, seq), window (entity)) carry only point keys + the bounded
  fence arrays, never point×fence pairs.
- ``max_cover_cells`` guards (lazily, the segjoin raise_error-predicate
  convention) against a fence/cell_udeg combination that would explode
  a huge cover table.

Determinism: transitions derive from integer coordinates and integer
boxes only; output is one row per (entity, seq, fence, event) — a set,
no ordering sensitivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def geofence_events(
    points: DataFrame,
    fences: DataFrame,
    cell_udeg: int = 10_000_000,
    max_cover_cells: int = 200_000,
    entity_col: str = "entity_id",
    seq_col: str = "seq",
) -> DataFrame:
    """-> ``(entity_id, seq, fence_id, event)`` with ``event`` in
    ``{'enter', 'exit'}``.

    ``points``: ``(entity_id, seq, lat_u, lon_u)`` micro-degree integer
    coordinates, ``seq`` a total order per entity (ties undefined — pass
    a unique key).  ``fences``: ``(fence_id, lat_min_u, lat_max_u,
    lon_min_u, lon_max_u)`` closed integer boxes, assumed small enough
    to broadcast.  An exit is emitted only when a LATER point exists for
    the entity (no synthetic exit at end-of-stream — the stream may
    continue tomorrow)."""
    if cell_udeg <= 0:
        raise ValueError("cell_udeg must be positive")
    cell = float(int(cell_udeg))

    def _cell(c):
        return F.floor(F.col(c) / F.lit(cell)).cast("long")

    f = fences.select(
        F.col("fence_id").cast("long").alias("fence_id"),
        "lat_min_u", "lat_max_u", "lon_min_u", "lon_max_u")
    ncells = (
        (_cell("lon_max_u") - _cell("lon_min_u") + 1)
        * (_cell("lat_max_u") - _cell("lat_min_u") + 1))
    # loud-failure guard as a FILTER predicate (the segjoin convention —
    # a dropped column would be pruned before the error could fire).
    f = f.filter(
        F.when(ncells <= F.lit(int(max_cover_cells)), F.lit(True))
        .otherwise(F.raise_error(F.concat(
            F.lit("fence covers more than %d cells; raise cell_udeg "
                  "(fence_id=" % int(max_cover_cells)),
            F.col("fence_id").cast("string"), F.lit(")")))))
    cover = f.select(
        "fence_id",
        "lat_min_u", "lat_max_u", "lon_min_u", "lon_max_u",
        F.explode(
            F.sequence(_cell("lon_min_u"), _cell("lon_max_u"))
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.sequence(_cell("lat_min_u"), _cell("lat_max_u"))
        ).alias("cy"),
    )

    p = points.select(
        F.col(entity_col).alias("entity_id"),
        F.col(seq_col).alias("seq"),
        F.col("lat_u").cast("long").alias("lat_u"),
        F.col("lon_u").cast("long").alias("lon_u"),
    ).withColumn("cx", _cell("lon_u")).withColumn("cy", _cell("lat_u"))

    matched = p.join(
        F.broadcast(cover),
        on=[
            p["cx"] == cover["cx"],
            p["cy"] == cover["cy"],
            p["lat_u"].between(
                cover["lat_min_u"], cover["lat_max_u"]),
            p["lon_u"].between(
                cover["lon_min_u"], cover["lon_max_u"]),
        ],
        how="left",
    ).select(p["entity_id"], p["seq"], cover["fence_id"])

    per_point = matched.groupBy("entity_id", "seq").agg(
        F.sort_array(F.collect_set("fence_id")).alias("fset"))

    w = Window.partitionBy("entity_id").orderBy("seq")
    empty = F.array().cast("array<long>")
    diffed = per_point.select(
        "entity_id", "seq",
        F.coalesce(F.lag("fset").over(w), empty).alias("prev"),
        F.col("fset").alias("cur"),
    ).select(
        "entity_id", "seq",
        F.explode(
            F.concat(
                F.transform(
                    F.array_except("cur", "prev"),
                    lambda f: F.struct(
                        f.alias("fence_id"),
                        F.lit("enter").alias("event")),
                ),
                F.transform(
                    F.array_except("prev", "cur"),
                    lambda f: F.struct(
                        f.alias("fence_id"),
                        F.lit("exit").alias("event")),
                ),
            )
        ).alias("t"),
    )
    return diffed.select(
        "entity_id", "seq",
        F.col("t.fence_id").cast("long").alias("fence_id"),
        F.col("t.event").alias("event"),
    )
