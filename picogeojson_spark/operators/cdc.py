"""CDC changelog apply: MERGE a change stream into a snapshot table.

The lakehouse table-maintenance primitive (Delta/Iceberg MERGE INTO,
Hudi upsert, Paimon changelog compaction): given the current snapshot and
a batch of keyed change rows (insert / update / delete, each stamped with
an event time and a sequence tie-break), produce the next snapshot —
the LATEST change per key wins; a terminal delete removes the key;
untouched snapshot rows pass through.

Scale shape: the latest-change-per-key reduction is a per-key top-1
window planned as WindowGroupLimit (map-side rank pruning — hot keys
never ship their full change history); its hash(keys) partitioning is
REUSED by the following full-outer join, so the change side pays exactly
one exchange and the snapshot side one more (AQE broadcasts small change
batches instead, the nightly-increment case).  No driver collect, no
corpus-sized window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str] = ("key",),
    ts_col: str = "ts",
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a changelog to a snapshot and return the next snapshot.

    ``changes`` carries ``keys + (ts_col, seq_col, op_col) + payload``;
    ``snapshot`` carries ``keys + payload`` (same payload column names).
    Per key the change with the greatest ``(ts, seq)`` wins: if its op is
    ``delete_op`` the key is dropped, otherwise its payload replaces (or
    inserts) the row.  Deterministic by construction — ``seq`` must be
    unique per key (changelog offset / LSN).
    """
    keys = list(keys)
    meta = set(keys) | {ts_col, seq_col, op_col}
    payload = [c for c in changes.columns if c not in meta]
    missing = [c for c in payload if c not in snapshot.columns]
    if missing:
        raise ValueError(f"snapshot lacks payload columns {missing}")

    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), F.col(seq_col).desc())
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*keys, op_col, *payload)
    )
    return merge_latest(snapshot, latest, keys=keys, op_col=op_col,
                        delete_op=delete_op)


def merge_latest(
    snapshot: DataFrame,
    latest: DataFrame,
    keys: Sequence[str] = ("key",),
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """MERGE an already-reduced change table (at most ONE row per key:
    ``keys + op + payload``) into the snapshot — the tail of
    ``apply_changes``, exposed so a STREAMING latest-per-key aggregate
    (max-struct keyed state) can fold the same merge on its sink."""
    keys = list(keys)
    payload = [c for c in latest.columns
               if c not in set(keys) | {op_col}]
    snap = snapshot.select(
        *keys, *[F.col(c).alias("_s_" + c) for c in payload])
    merged = snap.join(latest, on=keys, how="full")
    return (
        merged.filter(
            F.col(op_col).isNull() | (F.col(op_col) != F.lit(delete_op)))
        .select(
            *keys,
            *[
                # op NULL <=> no surviving change for the key: keep the
                # snapshot value.  NOT coalesce — a change may legitimately
                # set a payload column to NULL and must overwrite.
                F.when(F.col(op_col).isNull(), F.col("_s_" + c))
                .otherwise(F.col(c)).alias(c)
                for c in payload
            ],
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str] = ("key",),
    op_col: str = "op",
) -> DataFrame:
    """Diff two snapshots of a keyed table into a minimal changelog —
    the INVERSE of :func:`apply_changes`: keys only in ``new`` emit
    ``I`` (insert, new payload), keys only in ``old`` emit ``D``
    (delete, old payload for reference), keys in both whose payload
    differs emit ``U`` (update, new payload); identical rows emit
    nothing.  Column comparison is NULL-safe (``IS DISTINCT FROM``):
    NULL == NULL is unchanged, NULL vs value is an update — the trap
    ``coalesce``-based diffs get wrong.

    Replaying the output through ``apply_changes(old, diff)`` reproduces
    ``new`` exactly (pinned by the round-trip test) — the snapshot-diff /
    changelog-apply pair is closed.

    Scale shape: ONE full-outer equi-join on the keys (one exchange per
    side; AQE broadcasts a small side), then pure-codegen NULL-safe
    comparisons; output is change-sized.  No windows, no collects — this
    is the table-format incremental-maintenance primitive (Delta CDF /
    Iceberg changelog scan) computed from plain snapshots.
    """
    keys = list(keys)
    payload = [c for c in new.columns if c not in keys]
    if [c for c in old.columns if c not in keys] != payload:
        raise ValueError("old/new payload columns must match")
    o = old.select(*keys, *[F.col(c).alias("_o_" + c) for c in payload],
                   F.lit(1).alias("_in_o"))
    n = new.select(*keys, *[F.col(c).alias("_n_" + c) for c in payload],
                   F.lit(1).alias("_in_n"))
    j = o.join(n, on=keys, how="full")
    changed = None
    for c in payload:
        d = ~F.col("_o_" + c).eqNullSafe(F.col("_n_" + c))
        changed = d if changed is None else (changed | d)
    op = (
        F.when(F.col("_in_o").isNull(), F.lit("I"))
        .when(F.col("_in_n").isNull(), F.lit("D"))
        .when(changed if changed is not None else F.lit(False),
              F.lit("U"))
    )
    out_cols = [
        F.when(op == "D", F.col("_o_" + c)).otherwise(F.col("_n_" + c))
        .alias(c)
        for c in payload
    ]
    return (
        j.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(*keys, op_col, *out_cols)
    )
