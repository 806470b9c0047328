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


NEARDUP_OUT_SCHEMA = "doc_id long, band int, rep_id long"
NEARDUP_STATE_SCHEMA = "rep long"


def _band_keys_udf(n: int, num_hashes: int, bands: int,
                   id_col: str, text_col: str):
    """Per-row minhash band keys via hashlib — the SAME arithmetic as the
    batch operator (min md5 hex digest per hash index over the doc's
    distinct word n-grams; md5('{i}:{shingle}')), computed in-row so the
    streaming path needs NO aggregation state for signatures (each doc is
    one row; only the band-key dedup state below is stateful). Tokenization
    matches the batch split(trim(text), '\\s+') on the ASCII whitespace
    class (parity pinned by a test against minhash_signatures)."""
    import hashlib
    import re

    import pandas as pd

    rows_per = num_hashes // bands
    ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s — ASCII whitespace

    def fn(batches):
        for pdf in batches:
            out_id, out_band, out_key = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = ws.split(str(text).strip().lower())
                if len(toks) < n or toks == [""]:
                    continue
                sh = {" ".join(toks[i:i + n])
                      for i in range(len(toks) - n + 1)}
                sigs = [
                    min(hashlib.md5("{}:{}".format(i, s).encode())
                        .hexdigest() for s in sh)
                    for i in range(num_hashes)
                ]
                for b in range(bands):
                    out_id.append(did)
                    out_band.append(b)
                    out_key.append("".join(
                        sigs[b * rows_per:(b + 1) * rows_per]))
            yield pd.DataFrame(
                {"doc_id": out_id, "band": out_band, "key": out_key}
            )

    return fn


def _neardup_fn():
    import pandas as pd

    def fn(key, pdf_iter, state):
        # one group == one (band, key) signature bucket. The representative
        # is the first doc ever seen in the bucket (ties within an
        # invocation broken by min doc_id — deterministic given the batch
        # sequence); every other doc in the bucket, now or in any future
        # batch, emits a (doc, band, rep) candidate row.
        rows = []
        for pdf in pdf_iter:
            if not pdf.empty:
                rows.append(pdf[["doc_id", "band"]])
        if not rows:
            return
        docs = pd.concat(rows).sort_values("doc_id")
        if state.exists:
            rep = int(state.get[0])
        else:
            rep = int(docs["doc_id"].iloc[0])
            state.update((rep,))
        dups = docs[docs["doc_id"] != rep]
        if len(dups):
            out = dups.copy()
            out["rep_id"] = rep
            yield out[["doc_id", "band", "rep_id"]]

    return fn


def stream_dedup_minhash(docs: DataFrame, n: int = 3, num_hashes: int = 16,
                         bands: int = 4, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Streaming near-duplicate CANDIDATES: docs whose minhash band key
    collides with any earlier doc's — in this micro-batch or any prior one.

    Output (doc_id, band, rep_id): ``doc_id`` shares band ``band``'s
    signature with representative ``rep_id`` (the bucket's first-seen doc).
    A doc colliding in several bands emits one row per band — downstream
    consumers dedupe on (doc_id, rep_id) and, exactly like the batch LSH
    path, verify candidates with an exact Jaccard join against the corpus
    (stream-static join by id); the sketch only ever GATES work.

    Scale shape: band keys are a narrow per-row map (signatures need no
    aggregation state — one doc is one row); the only stateful exchange is
    the groupBy on (band, key), whose state is one long per bucket,
    sharded across executors like any shuffle and persisted in the
    checkpoint (restart-proof, tested)."""
    keyed = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(
        _band_keys_udf(n, num_hashes, bands, "doc_id", "text"),
        schema="doc_id long, band int, key string",
    )
    return keyed.groupBy("band", "key").applyInPandasWithState(
        _neardup_fn(),
        outputStructType=NEARDUP_OUT_SCHEMA,
        stateStructType=NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


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
