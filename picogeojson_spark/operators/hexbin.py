"""Hexagonal binning (the hexbin raster) via the two-staggered-lattice
nearest-center method.

This is matplotlib/d3 hexbin's algorithm re-expressed as pure integer
Catalyst expressions: the union of two rectangular lattices —

  A: centers at (i*w, j*h)          B: centers at (i*w + w/2, j*h + h/2)

— is a *centered rectangular* lattice, and with h = sqrt(3)*w it is exactly
the triangular lattice whose Euclidean Voronoi cells are regular hexagons.
Assigning every point to its nearest center therefore IS hexagonal binning,
and the nearest center overall is always one of two candidates: the nearest
A center (component-wise rounding) and the nearest B center.  No join, no
UDF — per-point assignment is a handful of integer expressions that ride
the scan, and the histogram is ONE hash aggregate (the only shuffle).

Determinism contract: all arithmetic is integer micro-degrees.  The aspect
ratio uses the rational approximation h = 2*floor(w*866/1000) ~ sqrt(3)*w
(hexagons regular to 0.03%), so both engines compute identical integers.
``floor((x + w/2)/w)`` implements nearest-integer rounding with ties toward
+inf — one deterministic rule, same on both engines (repo rule: floor() on
doubles, never integer division, because Spark ``div`` truncates while
DuckDB ``//`` floors for negatives).  Distance ties between the A and B
candidate (boundary points) resolve to A (``dA <= dB``).

Hex ids are *doubled coordinates*: lattice-A hexes get even (hx, hy) =
(2i, 2j), lattice-B hexes odd (2i+1, 2j+1); the hex center in micro-degrees
is then (hx*w/2, hy*h/2) exactly (w and h are even).

Scale shape at 100 TB: assignment is per-row codegen on the scan (no
shuffle); the histogram shuffles one row per point but map-side combines to
one row per OCCUPIED hex — the reduce side is raster-sized, not
corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hex_geometry(width_udeg: int) -> tuple[int, int]:
    """(w, h) of the staggered lattices: w = hex horizontal pitch in
    micro-degrees (must be even, >= 1000), h = 2*floor(w*866/1000)."""
    if width_udeg < 1000 or width_udeg % 2:
        raise ValueError("width_udeg must be even and >= 1000")
    return width_udeg, 2 * (width_udeg * 866 // 1000)


def _nearest_idx(coord_u, pitch: int):
    """Index of the nearest multiple of ``pitch`` (ties toward +inf).
    floor() on a double quotient is exact here: |coord_u| <= 1.9e8 keeps
    the quotient's ulp ~1e-13 while non-attained integers are >= 1/pitch
    >= 2.9e-7 away."""
    return F.floor((coord_u + F.lit(pitch // 2)) / F.lit(float(pitch))) \
        .cast("long")


def hex_assign(
    points: DataFrame,
    width_udeg: int = 2_000_000,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Adds ``hx, hy`` (doubled hex coordinates) and ``hex_cx_udeg,
    hex_cy_udeg`` (exact integer center).  Pure expressions — no shuffle,
    no UDF; runs unchanged on a streaming source."""
    w, h = hex_geometry(width_udeg)
    x = F.floor(F.col(lon_col) * 1e6).cast("long")
    y = F.floor(F.col(lat_col) * 1e6).cast("long")
    ia = _nearest_idx(x, w)
    ja = _nearest_idx(y, h)
    # nearest B center (i*w + w/2): shift by -w/2 then round = plain floor
    ib = F.floor(x / F.lit(float(w))).cast("long")
    jb = F.floor(y / F.lit(float(h))).cast("long")
    ax, ay = ia * w, ja * h
    bx, by = ib * w + w // 2, jb * h + h // 2
    da = (x - ax) * (x - ax) + (y - ay) * (y - ay)
    db = (x - bx) * (x - bx) + (y - by) * (y - by)
    take_a = da <= db
    return (
        points
        .withColumn("hx", F.when(take_a, ia * 2).otherwise(ib * 2 + 1))
        .withColumn("hy", F.when(take_a, ja * 2).otherwise(jb * 2 + 1))
        .withColumn("hex_cx_udeg",
                    (F.col("hx") * F.lit(w // 2)).cast("long"))
        .withColumn("hex_cy_udeg",
                    (F.col("hy") * F.lit(h // 2)).cast("long"))
    )


def hex_histogram(
    points: DataFrame,
    width_udeg: int = 2_000_000,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Per-hex point counts ``(hx, hy, hex_cx_udeg, hex_cy_udeg, cnt)``
    — ONE map-side-combined hash aggregate over the assigned points."""
    return (
        hex_assign(points, width_udeg, lon_col, lat_col)
        .groupBy("hx", "hy", "hex_cx_udeg", "hex_cy_udeg")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
