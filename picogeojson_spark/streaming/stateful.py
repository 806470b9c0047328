"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming (SURVEY §2.9); this is the engine-level
stateful path for a continuously-crawled pages table. The flagship operator
is **cross-batch exact dedup**: the first page with a given content hash is
emitted, every later arrival of the same hash — in this micro-batch or any
future one — is dropped. State is the per-hash seen marker, persisted in the
checkpoint, so dedup survives stream restarts (tested).

Scale shape: state is partitioned by the group key (the content hash), so
it shards across executors exactly like a shuffle on that key; per-group
state is one boolean-sized blob, and a processing-time timeout can bound
state for truly unbounded crawls (`ttl_minutes`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEDUP_OUT_SCHEMA = "url string, h string"
DEDUP_STATE_SCHEMA = "seen int"


def _dedup_fn(timeout):
    import pandas as pd

    def fn(key, pdf_iter, state):
        # TTL expiry: the timed-out invocation carries no data — drop the
        # state so a later re-arrival of this hash re-emits (the documented
        # state-bounding behavior)
        if timeout is not None and state.hasTimedOut:
            state.remove()
            return
        # one group == one content hash; emit only the first row ever seen
        if state.exists:
            already = True
        else:
            already = False
        out = []
        for pdf in pdf_iter:
            if already or pdf.empty:
                continue
            out.append(pdf.iloc[:1][["url", "h"]])
            already = True
        if not state.exists:
            state.update((1,))
        if timeout is not None:
            # re-arm EVERY invocation: a state update for an existing key
            # cancels the pending timeout, so arming only at creation would
            # leave re-seen keys immortal
            state.setTimeoutDuration(timeout)
        if out:
            yield pd.concat(out)

    return fn


def stream_dedup_exact(pages: DataFrame, text_col: str = "text",
                       ttl_minutes: int = None) -> DataFrame:
    """Streaming pages -> first-seen rows only (cross-batch exact dedup).

    ``pages`` must be a streaming DataFrame with ``url`` and ``text_col``.
    Output: (url, h) of first occurrences. Use ``ttl_minutes`` to expire
    state for unbounded streams (a re-arrival after expiry re-emits —
    the standard state-bounding tradeoff).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = pages.select(
        "url", F.sha2(F.col(text_col), 256).alias("h")
    )
    timeout = ttl_minutes * 60_000 if ttl_minutes else None  # ms (int)
    mode = (GroupStateTimeout.ProcessingTimeTimeout if ttl_minutes
            else GroupStateTimeout.NoTimeout)
    return hashed.groupBy("h").applyInPandasWithState(
        _dedup_fn(timeout),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=mode,
    )
