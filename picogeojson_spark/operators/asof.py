"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right)`` matches every left row to the most recent right
row with ``right.ts <= left.ts`` within the same ``by`` key (the classic
"latest quote before each trade" / "latest snapshot before each event"
join).

Implementation is the scalable union+window plan, NOT a range theta-join:
both sides are tagged and unioned, one window per ``by`` key carries the
last-seen right payload forward (``last(..., ignorenulls=True)`` over rows
unbounded-preceding..current), and left rows are then filtered back out.
Cost is ONE hash shuffle on the key + a sort within partitions — the same
shape as any windowed aggregation, so it scales like groupBy rather than
like an interval join. Equal timestamps: the right row sorts before the
left row (side tag), making it eligible, which matches inclusive
``l.ts >= r.ts`` as-of semantics (DuckDB's native ASOF JOIN — used as the
test/gate oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    right_value_cols,
    how: str = "inner",
) -> DataFrame:
    """left columns + ``r_<col>`` for each right value column (as-of match).

    ``how``: 'inner' drops left rows with no prior right row; 'left' keeps
    them with nulls.
    """
    from pyspark.sql.types import StructField, StructType

    right_value_cols = list(right_value_cols)
    lcols = [c for c in left.columns]

    # the right payload travels as ONE struct so a single
    # last(ignorenulls=True) carries a single as-of row — carrying columns
    # independently could stitch values from DIFFERENT right rows whenever
    # a right value column contains NULLs, and a NULL first value column
    # would misclassify a matched row under how='inner'
    payload_t = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_value_cols]
    )
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_t).alias("__r"),
    )
    r_tag = right.select(
        *[F.col(c) if c in (by, ts_col) else F.lit(None).cast(
            left.schema[c].dataType).alias(c) for c in lcols],
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in right_value_cols]).alias("__r"),
    )
    u = l_tag.unionByName(r_tag)

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *lcols,
        "__side",
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    out = carried.filter(F.col("__side") == 1)
    if how == "inner":
        # the struct itself is non-null iff an as-of match exists, even when
        # every right value in the matched row is NULL
        out = out.filter(F.col("__r").isNotNull())
    return out.select(
        *lcols,
        *[F.col("__r." + c).alias("r_" + c) for c in right_value_cols],
    )
