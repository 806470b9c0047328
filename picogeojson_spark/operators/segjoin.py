"""Segment-intersection join: which polyline pairs CROSS.

Trajectory mining's pair primitive (route conflicts, shipping-lane
crossings, trajectory co-movement): given a table of line segments in
integer micro-degrees, find every cross-document pair of segments that
properly intersects.

The 100 TB shape — never a theta join:

1. every segment explodes to the grid cells its bbox covers (two chained
   ``sequence`` explodes, whole-stage codegen; fan-out bounded by the
   segment extent / ``cell_udeg`` ratio, guarded by ``max_cells``);
2. candidates come from ONE equi-join on the packed cell key;
3. the classic duplicate-elimination trick: a candidate pair is kept only
   in the single canonical cell containing the upper-left corner of the
   two bboxes' intersection — no ``distinct`` shuffle is ever needed;
4. refine = the exact integer orientation test (4 cross products, all
   |coord| <= 1.8e8 so every term fits int64 with 36x headroom).

Crossing contract: PROPER intersection only (interiors cross — strict
sign changes on both segments). Collinear overlap and endpoint touching
are excluded; that rule is a pure integer predicate both engines
evaluate identically, which is what the brute-force DuckDB oracle
(hash-equality = candidate-completeness proof, the ``dedup_setsim``
pattern) pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = 1 << 20  # packed cell key bound (same packing as spatial_cluster)


def _cell(c, cell_udeg: int):
    return F.floor(c / F.lit(float(cell_udeg))).cast("long")


def segment_crossings(
    segs: DataFrame,
    cell_udeg: int = 45_000_000,
    max_cells: int = 4096,
) -> DataFrame:
    """``segs``: one row per directed segment —
    ``(doc_id, seg_id, ax, ay, bx, by)`` in integer micro-degrees.
    Returns ``(doc_a, doc_b, n_crossings)`` for every cross-document pair
    with at least one properly-crossing segment pair (``doc_a < doc_b``).

    ``cell_udeg`` sizes the candidate grid: pick it near the typical
    segment extent. A segment whose bbox covers more than ``max_cells``
    grid cells raises (loud failure beats a silent quadratic explosion).
    """
    s = segs.select(
        "doc_id", "seg_id", "ax", "ay", "bx", "by",
        _cell(F.least("ax", "bx"), cell_udeg).alias("cx0"),
        _cell(F.greatest("ax", "bx"), cell_udeg).alias("cx1"),
        _cell(F.least("ay", "by"), cell_udeg).alias("cy0"),
        _cell(F.greatest("ay", "by"), cell_udeg).alias("cy1"),
    )
    ncells = (F.col("cx1") - F.col("cx0") + 1) * (F.col("cy1") - F.col("cy0") + 1)
    # loud-failure guard as a FILTER predicate (a dropped column would be
    # pruned before the error could fire): every row passes or raises.
    s = s.filter(
        F.when(ncells <= F.lit(int(max_cells)), F.lit(True)).otherwise(
            F.raise_error(F.concat(
                F.lit("segment covers more than %d cells; "
                      "raise cell_udeg (doc_id=" % int(max_cells)),
                F.col("doc_id").cast("string"), F.lit(")")))))
    cov = (
        s.select(
            "doc_id", "seg_id", "ax", "ay", "bx", "by", "cx0", "cy0",
            F.explode(F.sequence("cx0", "cx1")).alias("cx"),
            F.col("cy0").alias("_cy0"), F.col("cy1").alias("_cy1"),
        )
        .select(
            "doc_id", "seg_id", "ax", "ay", "bx", "by", "cx0", "cy0", "cx",
            F.explode(F.sequence("_cy0", "_cy1")).alias("cy"),
        )
        .select(
            "doc_id", "seg_id", "ax", "ay", "bx", "by", "cx0", "cy0",
            ((F.col("cx") + F.lit(_B)) * F.lit(2 * _B)
             + F.col("cy") + F.lit(_B)).alias("k"),
            "cx", "cy",
        )
    )
    a = cov.select(*[F.col(c).alias("a_" + c) for c in cov.columns])
    b = cov.select(*[F.col(c).alias("b_" + c) for c in cov.columns])
    cand = (
        a.join(b, (F.col("a_k") == F.col("b_k"))
               & (F.col("a_doc_id") < F.col("b_doc_id")))
        # canonical-cell dedup: keep the pair only in the cell holding the
        # lower-left corner of the bbox intersection
        .filter(
            (F.col("a_cx") == F.greatest("a_cx0", "b_cx0"))
            & (F.col("a_cy") == F.greatest("a_cy0", "b_cy0"))
        )
    )

    def cross(ox, oy, px, py, qx, qy):
        return ((F.col(px) - F.col(ox)) * (F.col(qy) - F.col(oy))
                - (F.col(qx) - F.col(ox)) * (F.col(py) - F.col(oy)))

    d1 = cross("a_ax", "a_ay", "a_bx", "a_by", "b_ax", "b_ay")
    d2 = cross("a_ax", "a_ay", "a_bx", "a_by", "b_bx", "b_by")
    d3 = cross("b_ax", "b_ay", "b_bx", "b_by", "a_ax", "a_ay")
    d4 = cross("b_ax", "b_ay", "b_bx", "b_by", "a_bx", "a_by")
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & \
             (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
    return (
        cand.filter(proper)
        .groupBy(
            F.col("a_doc_id").alias("doc_a"),
            F.col("b_doc_id").alias("doc_b"),
        )
        .agg(F.count("*").cast("long").alias("n_crossings"))
    )


def trajectory_segments(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Text-mined polyline segments: consecutive valid coordinate
    mentions (``geotext.extract_coordinates`` order and bounds rules,
    dropped mentions splice) as integer micro-degree segments —
    ``(doc_id, seg_id, ax, ay, bx, by)`` with ``seg_id`` = the end
    mention's index. ONE shuffle (the per-doc lag window)."""
    from pyspark.sql import Window

    from .geotext import extract_coordinates

    m = extract_coordinates(docs, id_col=id_col, text_col=text_col).select(
        "doc_id", "idx",
        F.floor(F.col("lon") * 1e6).cast("long").alias("x"),
        F.floor(F.col("lat") * 1e6).cast("long").alias("y"),
    )
    w = Window.partitionBy("doc_id").orderBy("idx")
    return (
        m.select(
            "doc_id", F.col("idx").cast("long").alias("seg_id"),
            F.lag("x").over(w).alias("ax"), F.lag("y").over(w).alias("ay"),
            F.col("x").alias("bx"), F.col("y").alias("by"),
        )
        .filter(F.col("ax").isNotNull())
    )


def resample_trajectory(segs: DataFrame, step_u: int = 500_000) -> DataFrame:
    """Resample each document's polyline at fixed arc-length intervals —
    ``(doc_id, sample_idx, x, y)`` with one sample every ``step_u``
    micro-degrees of (planar) path length, linearly interpolated along
    the segment containing it. The GPS-pipeline densification primitive
    (uniform point clouds from raw traces for heatmaps / clustering).

    Exact integer contract (cross-engine): segment length is
    ``floor(sqrt(dx^2 + dy^2))`` (the trajectory_measures rule);
    cumulative lengths come from ONE per-doc window (the operator's only
    shuffle, same partitioning as the segment build); sample ``j`` lands
    on the segment with ``cum_prev <= j*step < cum`` — the index ranges
    partition the integers, so no sample is emitted twice; interpolation
    is ``a + sign * (|d| * off div len)`` with every dividend
    NON-NEGATIVE (truncating ``div`` and flooring ``//`` agree only on
    non-negatives — repo rule). The final endpoint is emitted only when
    the total length is a multiple of ``step_u`` (documented boundary).

    Zero-length segments emit nothing (empty index range), so the
    guarded division never sees len = 0.
    """
    from pyspark.sql import Window

    if step_u <= 0:
        raise ValueError("step_u must be positive")
    w = Window.partitionBy("doc_id").orderBy("seg_id")
    ln = F.floor(F.sqrt(
        ((F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax"))
         + (F.col("by") - F.col("ay")) * (F.col("by") - F.col("ay")))
        .cast("double"))).cast("long")
    s = segs.select(
        "doc_id", "seg_id", "ax", "ay", "bx", "by", ln.alias("len"),
        F.sum(ln).over(w).alias("cum"),
    ).withColumn("cum_prev", F.col("cum") - F.col("len"))
    j0 = F.expr("(cum_prev + {s} - 1) div {s}".format(s=int(step_u)))
    j1 = F.expr("(cum + {s} - 1) div {s} - 1".format(s=int(step_u)))
    s = s.select(
        "doc_id", "ax", "ay", "bx", "by", "len", "cum_prev",
        F.explode(
            F.when(j1 >= j0, F.sequence(j0, j1))
            .otherwise(F.array().cast("array<bigint>"))
        ).alias("j"),
    )
    dx, dy = F.col("bx") - F.col("ax"), F.col("by") - F.col("ay")
    xoff = F.expr("(abs(bx - ax) * (j * {s} - cum_prev)) div len"
                  .format(s=int(step_u)))
    yoff = F.expr("(abs(by - ay) * (j * {s} - cum_prev)) div len"
                  .format(s=int(step_u)))
    return s.select(
        "doc_id", F.col("j").alias("sample_idx"),
        (F.col("ax") + F.when(dx >= 0, xoff).otherwise(-xoff))
        .cast("long").alias("x"),
        (F.col("ay") + F.when(dy >= 0, yoff).otherwise(-yoff))
        .cast("long").alias("y"),
    )
