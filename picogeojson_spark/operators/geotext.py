"""Geotagging: mine coordinate mentions out of page text, cell-indexed.

The graft's core combination — web TEXT in, GEO index out: a conservative
"lat, lon" decimal-pair regex runs in the scan stage (whole-stage codegen,
no UDF), pairs re-join via ``arrays_zip`` + ``posexplode`` (mention order
preserved), out-of-range pairs are dropped (the classic 999.5 trap), and
survivors get the engine's hierarchical cell id — ready for pip_join /
kNN / tiling like any other point table.

Scale shape: pure per-row expressions until the explode; output is
mention-sized, never text-sized; zero shuffles inside the operator. The
regex is restricted to the Java/RE2-agreeing dialect subset (repo rule),
so the DuckDB oracle replays extraction bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COORD_RE = r"(-?[0-9]{1,3}\.[0-9]+)\s*,\s*(-?[0-9]{1,3}\.[0-9]+)"


def extract_coordinates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 8,
) -> DataFrame:
    """One row per valid coordinate mention:
    ``(doc_id, idx, lat, lon, cell)`` with ``idx`` the mention's order in
    the document, bounds-validated (|lat| < 90, |lon| < 180 strictly — the
    open interval keeps the unclamped cell arithmetic exact), and ``cell``
    the hierarchical cell id at ``level`` (same arithmetic as
    ``geo/cells.cell_of``)."""
    lats = F.regexp_extract_all(F.col(text_col), F.lit(COORD_RE), 1)
    lons = F.regexp_extract_all(F.col(text_col), F.lit(COORD_RE), 2)
    nx, ny = 1 << (level + 1), 1 << level
    exploded = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.arrays_zip(lats.alias("a"), lons.alias("o")))
            .alias("idx", "p"),
        )
        .select(
            "doc_id",
            F.col("idx").cast("int").alias("idx"),
            F.col("p.a").cast("double").alias("lat"),
            F.col("p.o").cast("double").alias("lon"),
        )
        .filter((F.abs(F.col("lat")) < 90.0) & (F.abs(F.col("lon")) < 180.0))
    )
    cell = (
        F.lit(int(level)).cast("long") * F.lit(1 << 58).cast("long")
        + F.floor((F.col("lon") + 180.0) / 360.0 * nx).cast("long")
        * F.lit(1 << 29).cast("long")
        + F.floor((F.col("lat") + 90.0) / 180.0 * ny).cast("long")
    )
    return exploded.withColumn("cell", cell)
