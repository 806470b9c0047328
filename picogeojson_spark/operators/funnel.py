"""Event funnel: ordered multi-step conversion within a per-step time gap.

The classic product-analytics operator Spark lacks natively: of the users
who did step 1, how many went on to do step 2 within ``max_gap``, then
step 3 within ``max_gap`` of that, in order. Semantics are the
deterministic *earliest-completion* greedy: a user's step-1 time is their
MIN step-1 event, their step-k time is their MIN step-k event strictly
after step k-1 and within the gap — a pure function of the event set, so
the DuckDB oracle replays it as a chain of grouped-min joins.

Scale shape: step k is ONE equi-join of the (type-filtered, so pushdown-
pruned) step-k events against the user-count-bounded frontier from step
k-1, followed by a map-side-combined min aggregate — never a per-user
``collect_list`` (a power user with millions of events streams through
the aggregate like any other key; hot users are AQE skew-join territory).
k-1 joins total for a k-step funnel, each exchanging only that step's
events plus the shrinking frontier.

Timestamps enter as epoch-microsecond LONGs (callers derive them with
pure-NTZ arithmetic — see ``__spark_entry__._ntz_epoch_us`` — so no
session-timezone cast can perturb the integers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(events: DataFrame, steps, max_gap_us: int,
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_us_col: str = "ts_us") -> DataFrame:
    """Per-stage completion counts: ``(stage, step, n_users)`` — one row
    per funnel step, ``n_users`` = users whose earliest-completion chain
    reaches that step. Returns the stages ordered.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    if max_gap_us <= 0:
        raise ValueError("max_gap_us must be positive")

    spark = events.sparkSession
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.col(ts_us_col).cast("long").alias("t"),
    )
    # each frontier is persisted and materialized by its own count(); the
    # previous one is released only after its successor exists (the same
    # one-round-late handoff as the BPE trainer), so stage k never
    # recomputes the join chain behind it
    frontier = (
        ev.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("t"))
        .persist()
    )
    counts = [frontier.count()]
    try:
        for step in steps[1:]:
            nxt = (
                ev.filter(F.col("et") == step)
                .withColumnRenamed("t", "t_ev")
                .join(frontier.withColumnRenamed("t", "t_prev"), "u")
                .filter(
                    (F.col("t_ev") > F.col("t_prev"))
                    & (F.col("t_ev")
                       <= F.col("t_prev") + F.lit(int(max_gap_us)))
                )
                .groupBy("u")
                .agg(F.min("t_ev").alias("t"))
                .persist()
            )
            try:
                counts.append(nxt.count())
            except Exception:
                nxt.unpersist()
                raise
            frontier.unpersist()
            frontier = nxt
    finally:
        frontier.unpersist()
    return spark.createDataFrame(
        [(i + 1, s, int(n)) for i, (s, n) in enumerate(zip(steps, counts))],
        "stage int, step string, n_users long",
    ).orderBy("stage")


def funnel_oracle_sql(source_sql: str, steps, max_gap_us: int) -> str:
    """DuckDB replay: same grouped-min join chain; ``source_sql`` must
    yield (user_id, event_type, ts_us)."""
    steps = list(steps)
    parts = [f"""
WITH ev AS ({source_sql}),
f1 AS (
  SELECT user_id AS u, MIN(ts_us) AS t
  FROM ev WHERE event_type = '{steps[0]}' GROUP BY user_id)"""]
    for i, step in enumerate(steps[1:], start=2):
        parts.append(f""",
f{i} AS (
  SELECT ev.user_id AS u, MIN(ev.ts_us) AS t
  FROM ev JOIN f{i - 1} ON ev.user_id = f{i - 1}.u
  WHERE ev.event_type = '{step}'
    AND ev.ts_us > f{i - 1}.t
    AND ev.ts_us <= f{i - 1}.t + {int(max_gap_us)}
  GROUP BY ev.user_id)""")
    sel = "\nUNION ALL\n".join(
        "SELECT {i} AS stage, '{s}' AS step, "
        "CAST((SELECT COUNT(*) FROM f{i}) AS BIGINT) AS n_users".format(
            i=i + 1, s=s)
        for i, s in enumerate(steps)
    )
    parts.append("\nSELECT * FROM (\n{}\n) ORDER BY stage".format(sel))
    return "".join(parts)
