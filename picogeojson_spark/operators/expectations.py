"""Declarative data-quality expectations over a DataFrame.

The pipeline-gate step (Great Expectations / Delta constraints / dbt
tests): declare rules, get back one row per rule with checked and
violation counts.  A 100 TB table cannot afford one scan per rule, so
all ROW-LEVEL rules (not-null, range, set-membership, regex) fold into
ONE map-side-combined aggregate — a single pass regardless of rule
count; uniqueness rides the SAME aggregate as
``count - countDistinct`` (Spark plans multi-distinct with one Expand,
still one scan); only referential-integrity rules pay a join each, and
that join is a broadcastable anti-probe against the (dimension-sized)
referenced key set.

Exactness: every output is a count — no floats anywhere.
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectation_report(
    df: DataFrame,
    not_null: Sequence[str] = (),
    in_range: Mapping[str, tuple] = None,
    in_set: Mapping[str, Sequence] = None,
    matches: Mapping[str, str] = None,
    unique: Sequence[Sequence[str]] = (),
    fks: Sequence[tuple] = (),
) -> DataFrame:
    """Evaluate expectations and return
    ``(rule, n_checked, n_violations, passed)`` per rule.

    - ``not_null``: column names that must not be NULL;
    - ``in_range``: ``{col: (lo, hi)}`` inclusive bounds (NULL passes —
      pair with not_null to forbid);
    - ``in_set``: ``{col: [allowed, ...]}`` (NULL passes);
    - ``matches``: ``{col: regex}`` full-match (NULL passes);
    - ``unique``: key column lists; violations = rows beyond the first
      per duplicate key, NULL-safe (NULL key components compare equal to
      each other, so two all-NULL keys are ONE duplicate pair — the
      ``count(*) - count(distinct struct(...))`` spelling, which unlike
      a bare ``countDistinct(cols)`` does not drop NULL-keyed rows);
    - ``fks``: ``(name, col, dim_df, dim_col)`` — rows whose non-NULL
      ``col`` has no match in ``dim_df[dim_col]``.
    """
    in_range = dict(in_range or {})
    in_set = dict(in_set or {})
    matches = dict(matches or {})
    viol: list[tuple[str, Column]] = []
    for c in not_null:
        viol.append(("not_null:" + c,
                     F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))))
    for c, (lo, hi) in in_range.items():
        bad = F.col(c).isNotNull() & ~F.col(c).between(F.lit(lo), F.lit(hi))
        viol.append(("in_range:" + c, F.sum(bad.cast("int"))))
    for c, allowed in in_set.items():
        bad = F.col(c).isNotNull() & ~F.col(c).isin(list(allowed))
        viol.append(("in_set:" + c, F.sum(bad.cast("int"))))
    for c, rx in matches.items():
        bad = F.col(c).isNotNull() & ~F.col(c).rlike(rx)
        viol.append(("matches:" + c, F.sum(bad.cast("int"))))
    for cols in unique:
        cols = list(cols)
        # count_distinct over a STRUCT of the key columns: the struct is
        # never NULL even when its fields are, so NULL-keyed rows are
        # grouped (NULL == NULL within the struct's ordering) instead of
        # silently dropped the way countDistinct(*cols) drops any row
        # with a NULL component — which would count every NULL-keyed row
        # as a violation rather than "rows beyond the first per key".
        viol.append(("unique:" + ",".join(cols),
                     F.count("*") - F.count_distinct(F.struct(*cols))))

    aggs = [F.count("*").cast("long").alias("_n")]
    for i, (_, expr) in enumerate(viol):
        aggs.append(F.coalesce(expr, F.lit(0)).cast("long")
                    .alias("_v{}".format(i)))
    one = df.agg(*aggs)
    if viol:
        stack = ", ".join(
            "'{}', _v{}".format(name.replace("'", ""), i)
            for i, (name, _) in enumerate(viol))
        rows = one.selectExpr(
            "_n", "stack({}, {}) as (rule, n_violations)".format(
                len(viol), stack)
        ).select("rule", F.col("_n").alias("n_checked"), "n_violations")
    else:
        rows = None

    fk_parts = []
    for name, col, dim, dim_col in fks:
        keys = dim.select(F.col(dim_col).alias(col)).distinct() \
            .withColumn("_hit", F.lit(1))
        marked = (
            df.select(col).filter(F.col(col).isNotNull())
            .join(keys, on=col, how="left")
        )
        fk_parts.append(marked.agg(
            F.count("*").cast("long").alias("n_checked"),
            F.sum(F.col("_hit").isNull().cast("long")).cast("long")
            .alias("n_violations"),
        ).select(F.lit("fk:" + name).alias("rule"), "n_checked",
                 F.coalesce("n_violations", F.lit(0)).cast("long")
                 .alias("n_violations")))

    parts = ([rows] if rows is not None else []) + fk_parts
    if not parts:
        raise ValueError("no expectations declared")
    out = reduce(lambda a, b: a.unionByName(b), parts)
    return out.withColumn("passed", F.col("n_violations") == 0)


def fk_orphans(child: DataFrame, parent: DataFrame,
               child_key: str, parent_key: str,
               fk_name: str = None) -> DataFrame:
    """Referential-integrity profile for one foreign-key candidate —
    the data-quality read CDC/late-arrival pipelines run before a
    join is trusted: how many child rows point at a parent that does
    not exist?  ONE row:

        fk              label ("child_key->parent_key" by default)
        n_child         child rows with a NON-NULL key
        n_null          child rows with a NULL key (not orphans —
                        reported separately, the unique-rule NULL
                        convention)
        orphan_rows     non-null child rows with no parent match
        orphan_keys     distinct missing key values
        orphan_ppm      floor(1e6 * orphan_rows / n_child)

    Scale shape: the child collapses to its KEY HISTOGRAM first (ONE
    map-side-combined aggregate), so the anti-join against the
    parent's distinct key set runs at key cardinality, never row
    cardinality; two 1-row rollups combine via the structural scalar
    attach.  No windows, no python.
    """
    from ._util import attach_scalar

    label = fk_name or "{}->{}".format(child_key, parent_key)
    keys = (
        child.select(F.col(child_key).alias("_k"))
        .groupBy("_k").agg(F.count("*").cast("long").alias("_n"))
    )
    nn = keys.filter(F.col("_k").isNotNull())
    totals = keys.agg(
        F.coalesce(F.sum(F.when(F.col("_k").isNotNull(), F.col("_n"))),
                   F.lit(0)).cast("long").alias("n_child"),
        F.coalesce(F.sum(F.when(F.col("_k").isNull(), F.col("_n"))),
                   F.lit(0)).cast("long").alias("n_null"),
    )
    orphans = (
        nn.join(parent.select(F.col(parent_key).alias("_k")).distinct(),
                on="_k", how="left_anti")
        .agg(
            F.coalesce(F.sum("_n"), F.lit(0)).cast("long")
            .alias("orphan_rows"),
            F.count("*").cast("long").alias("orphan_keys"),
        )
    )
    out = attach_scalar(totals, orphans)
    return out.select(
        F.lit(label).alias("fk"), "n_child", "n_null", "orphan_rows",
        "orphan_keys",
        F.when(F.col("n_child") > 0,
               F.expr("cast(div(cast(orphan_rows as decimal(38,0))"
                      " * 1000000, n_child) as bigint)"))
        .alias("orphan_ppm"),
    )
