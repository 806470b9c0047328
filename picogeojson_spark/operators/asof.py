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
    right_value_cols = list(right_value_cols)
    lcols = [c for c in left.columns]

    l_tag = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias("__r_" + c)
          for c in right_value_cols],
    )
    r_tag = right.select(
        *[F.col(c) if c in (by, ts_col) else F.lit(None).cast(
            left.schema[c].dataType).alias(c) for c in lcols],
        F.lit(0).alias("__side"),
        *[F.col(c).alias("__r_" + c) for c in right_value_cols],
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
        *[
            F.last("__r_" + c, ignorenulls=True).over(w).alias("r_" + c)
            for c in right_value_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1).drop("__side")
    if how == "inner":
        out = out.filter(F.col("r_" + right_value_cols[0]).isNotNull())
    return out
