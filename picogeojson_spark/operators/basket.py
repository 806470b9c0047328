"""Market-basket association rules: support / confidence / lift per pair.

The classic co-purchase mining read (recommendations, query expansion,
"customers who bought X also bought Y") — and, for web corpora, the same
shape mines tag/entity co-occurrence.  Output per qualifying unordered
item pair ``(u < v)``:

    pair_n        orders containing BOTH items
    n_u, n_v      orders containing each item
    support_ppm   floor(1e6 * pair_n / N)          (N = total baskets)
    conf_uv_ppm   floor(1e6 * pair_n / n_u)        (P(v | u))
    conf_vu_ppm   floor(1e6 * pair_n / n_v)        (P(u | v))
    lift_ppm      floor(1e6 * pair_n * N / (n_u * n_v))

All statistics are deterministic scaled integers (the lift numerator runs
in decimal(38,0) — pair_n*N*1e6 passes int64 at ~1e7 baskets); 1e6 ppm =
independence, >1e6 = positive association.

Scale shape: the pair stream comes from ONE self equi-join on the basket
key — per-basket fan-out is quadratic only in the BASKET size, which is a
small constant (TPC-H <= 7; real carts likewise), so pair volume is linear
in the line-item count.  Pair counts and item counts are map-side-combined
aggregates; the two item-count attachments are equi-joins against the
vocab-bounded item table (broadcast at gate SF, plain hash join at scale);
the basket total N is the sanctioned 1-row scalar attach.  min_pairs
filters BEFORE the item joins, so the rule table never exceeds the
qualifying-pair count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ._util import attach_scalar


def basket_rules(baskets: DataFrame, basket_col: str = "basket",
                 item_col: str = "item", min_pairs: int = 2) -> DataFrame:
    """``baskets``: (basket_col, item_col) rows — repeats tolerated
    (dedup'd).  Returns the association-rule table described above,
    one row per unordered pair with ``pair_n >= min_pairs``.
    """
    li = (
        baskets.select(F.col(basket_col).alias("bk"),
                       F.col(item_col).alias("item"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, on="bk")
        .filter(F.col("a.item") < F.col("b.item"))
        .groupBy(F.col("a.item").alias("u"), F.col("b.item").alias("v"))
        .agg(F.count("*").cast("long").alias("pair_n"))
        .filter(F.col("pair_n") >= int(min_pairs))
    )
    items = li.groupBy("item").agg(F.count("*").cast("long").alias("n_i"))
    total = li.select("bk").distinct().agg(
        F.count("*").cast("long").alias("n_baskets"))
    out = (
        pairs
        .join(items.select(F.col("item").alias("u"),
                           F.col("n_i").alias("n_u")), on="u")
        .join(items.select(F.col("item").alias("v"),
                           F.col("n_i").alias("n_v")), on="v")
    )
    out = attach_scalar(out, total)
    return out.select(
        "u", "v", "pair_n", "n_u", "n_v",
        F.expr("div(pair_n * cast(1000000 as bigint), n_baskets)")
        .cast("long").alias("support_ppm"),
        F.expr("div(pair_n * cast(1000000 as bigint), n_u)")
        .cast("long").alias("conf_uv_ppm"),
        F.expr("div(pair_n * cast(1000000 as bigint), n_v)")
        .cast("long").alias("conf_vu_ppm"),
        F.expr("cast(div(cast(pair_n as decimal(38,0)) * n_baskets"
               " * 1000000, cast(n_u as decimal(38,0)) * n_v)"
               " as bigint)").alias("lift_ppm"),
    )
