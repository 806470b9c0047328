"""Z-order (Morton) spatial data layout — clustering for scan pruning.

The 100 TB story: parquet/Iceberg scans prune files and row groups by
column min/max statistics. A table laid out in ingest order has lon/lat
ranges spanning the whole planet in every file, so a bbox query reads
everything; sorting by ONE of lon/lat tightens only that column. The
Z-order curve interleaves the bits of both coordinates, so range-sorting
by the key clusters rows that are close in BOTH dimensions into the same
files — a bbox predicate then skips the vast majority of row groups via
the ordinary stats Spark already pushes down (same mechanism as
Delta/Iceberg OPTIMIZE ZORDER BY).

Everything here is JVM-side integer expressions (shift/mask/or chains the
codegen inlines) — no UDF, no extra shuffle beyond the one range
repartition any clustering requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Clamped fixed-grid cell index in [0, 2^bits)."""
    n = 1 << bits
    x = F.floor((col - F.lit(lo)) / F.lit(hi - lo) * F.lit(n))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), x)).cast("long")


def zorder_key(lon: Column, lat: Column, bits: int = 16) -> Column:
    """Morton key interleaving ``bits`` quantized bits of lon (even
    positions) and lat (odd positions) -> a single long in
    [0, 2^(2*bits)). ``bits <= 31`` keeps the key in a signed 64-bit long.

    The interleave is one flat bitwise-OR chain of shift/mask terms — a
    pure whole-stage-codegen expression, evaluated once per row.
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    qx = _quantize(lon, -180.0, 180.0, bits)
    qy = _quantize(lat, -90.0, 90.0, bits)
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(qx, i).bitwiseAND(F.lit(1)),
                                 2 * i))
        terms.append(F.shiftleft(F.shiftright(qy, i).bitwiseAND(F.lit(1)),
                                 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out.cast("long")


def zorder_key_sql(lon: str, lat: str, bits: int = 16) -> str:
    """The DuckDB spelling of :func:`zorder_key` — identical quantize +
    interleave arithmetic so oracle hashes match bit-for-bit."""
    n = 1 << bits
    qx = ("GREATEST(0, LEAST({m}, CAST(floor(({c} - (-180.0)) / 360.0 * {n})"
          " AS BIGINT)))").format(c=lon, n=n, m=n - 1)
    qy = ("GREATEST(0, LEAST({m}, CAST(floor(({c} - (-90.0)) / 180.0 * {n})"
          " AS BIGINT)))").format(c=lat, n=n, m=n - 1)
    terms = []
    for i in range(bits):
        terms.append("((({qx}) >> {i}) & 1) << {s}".format(qx=qx, i=i, s=2 * i))
        terms.append("((({qy}) >> {i}) & 1) << {s}".format(qy=qy, i=i,
                                                           s=2 * i + 1))
    return "CAST((" + " | ".join("(" + t + ")" for t in terms) + ") AS BIGINT)"


def write_zordered(
    df: DataFrame,
    path: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    bits: int = 16,
    num_files: int = None,
) -> None:
    """Write ``df`` as parquet clustered along the Z-order curve: range-
    repartition by the Morton key (one shuffle — the price of any
    clustering), sort within partitions, drop the key. Row-group lon/lat
    min/max stats come out tight in both dimensions, so downstream bbox
    scans prune (see tests/test_layout.py for the measured row-group skip
    rate vs ingest order).
    """
    keyed = df.withColumn("_zkey", zorder_key(F.col(lon_col), F.col(lat_col),
                                              bits))
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(n, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
