"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode step is a clearly-marked stub (image/audio libraries are not in
this environment — see build constraints); everything Spark-side is real and
tested: schemas, Arrow batch shape, partition-preserving mapInPandas, and a
deterministic fake feature extractor that stands in for a model.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, payload binary, "
    "meta struct<width: int, height: int, duration_ms: int, codec: string>"
)


def decode_image(payload: bytes):
    """STUB: real deployments plug a codec here (PIL/libvips/ffmpeg).

    Raises NotImplementedError by design; the pipeline routes around it via
    ``fake_features`` unless a codec is injected.
    """
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "environment; inject a decoder or use fake_features"
    )


def decode_media(media: DataFrame, decoder=None,
                 decoded_ddl: str = "decoded binary") -> DataFrame:
    """media -> (media_id, kind, decoded, n_bytes): the decode seam.

    ``decoder(payload: bytes, kind: str) -> value-matching-decoded_ddl`` is
    injectable through the public API, so a production environment that has
    codec libraries (PIL/libvips/ffmpeg) activates the real path with zero
    code change — e.g. ``decode_media(df, decoder=lambda p, k:
    bytes(PIL.Image.open(io.BytesIO(p)).tobytes()))``. With no decoder
    injected it routes to :func:`decode_image`, which raises the honest
    environment stub. All Spark-side plumbing (schema, Arrow batch shape,
    partition preservation) is real and tested either way.
    """
    import pandas as pd

    if decoder is None:
        def decoder(payload, kind):  # pragma: no cover - env stub
            return decode_image(payload)

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "decoded": [
                        decoder(bytes(p), str(k))
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run,
        schema="media_id long, kind string, {}, n_bytes long".format(
            decoded_ddl),
    )


def fake_features(payload: bytes, dim: int = 8):
    """Deterministic stand-in feature vector: md5-derived floats in [0, 1)."""
    h = hashlib.md5(payload).digest()
    return [
        int.from_bytes(h[2 * i: 2 * i + 2], "big") / 65536.0 for i in range(dim)
    ]


def extract_media_features(media: DataFrame, dim: int = 8,
                           feature_fn=fake_features,
                           decoder=None) -> DataFrame:
    """media -> (media_id, kind, features array<double>, n_bytes).

    One mapInPandas, batch-shaped like a real model-inference stage (payload
    bytes in, fixed-width vectors out), partitioning preserved. When a
    ``decoder(payload, kind) -> bytes`` is injected (see
    :func:`decode_media`), features are computed over the DECODED bytes —
    the decode+featurize fusion a real pipeline runs in one Python stage
    (two chained mapInPandas stages would oversubscribe python workers).
    """
    import pandas as pd

    def run(batches):
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            if decoder is not None:
                payloads = [
                    decoder(p, str(k)) for p, k in zip(payloads, pdf["kind"])
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [feature_fn(p, dim) for p in payloads],
                    # n_bytes reports the RAW payload size (ingest metric),
                    # independent of whether a decoder ran
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run,
        schema="media_id long, kind string, features array<double>, n_bytes long",
    )


def synth_media(spark, n_rows: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                payload = hashlib.sha256(str(i).encode()).digest() * (4 + i % 5)
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": 64 * (1 + i % 8),
                            "height": 64 * (1 + i % 6),
                            "duration_ms": 0 if kind == "image" else 1000 * (i % 30),
                            "codec": {"image": "png", "audio": "opus",
                                      "video": "av1"}[kind],
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n_rows, numPartitions=partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA_DDL
    )


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: a real deployment plugs
    PIL/libvips here (see decode_image). The fake emits a payload whose
    content is a pure function of (input bytes, target dims) so tests can
    assert exact bytes."""
    h = hashlib.sha256(payload + "{}x{}".format(width, height).encode()).digest()
    return h * max(1, (width * height) // (32 * 1024) + 1)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """media -> (media_id, kind, payload, meta) with image payloads resized.

    One mapInPandas (batch-shaped like a real codec stage); non-image rows
    pass through untouched. The meta struct is updated JVM-side — only the
    byte transform runs in Python.
    """
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = pdf.copy()
            mask = out["kind"] == "image"
            out.loc[mask, "payload"] = [
                fake_resize(bytes(p), width, height)
                for p in out.loc[mask, "payload"]
            ]
            yield out

    resized = media.mapInPandas(run, schema=media.schema)
    new_meta = F.struct(
        F.when(F.col("kind") == "image", F.lit(width)).otherwise(
            F.col("meta.width")).alias("width"),
        F.when(F.col("kind") == "image", F.lit(height)).otherwise(
            F.col("meta.height")).alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
        F.col("meta.codec").alias("codec"),
    )
    return resized.withColumn("meta", new_meta)


def frame_sample(media: DataFrame, every_ms: int = 1000,
                 max_frames: int = 16, frame_fn=None) -> DataFrame:
    """video rows -> one row per sampled frame:
    (media_id, frame_idx, ts_ms, frame payload).

    The frame count comes from the typed metadata JVM-side (sequence +
    explode — the fan-out never runs in Python); only the per-frame byte
    extraction is a Pandas UDF, and the deterministic fake stands in for
    an ffmpeg seek+decode.

    ``frame_fn(payload: bytes, ts_ms: int) -> bytes`` is injectable
    (the decode_media ``decoder=`` seam): a production environment
    plugs the real ffmpeg seek+decode here with zero code change; the
    default is the sha256(payload + 8-byte-BE ts) fake."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if frame_fn is None:
        def frame_fn(p, t):
            return hashlib.sha256(p + int(t).to_bytes(8, "big")).digest()

    n_frames = F.floor(F.col("meta.duration_ms") / every_ms).cast("int")
    frames = (
        media.filter(F.col("kind") == "video")
        # a clip shorter than the sampling interval yields ZERO frames —
        # without this gate every row emitted a ts=0 frame even when
        # duration_ms is 0 (a frame beyond the media's duration)
        .filter(n_frames >= 1)
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.least(n_frames - 1, F.lit(max_frames - 1)),
                )
            ),
        )
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )

    @pandas_udf("binary")
    def extract_frame(payload, ts_ms):
        out = []
        for p, t in zip(payload, ts_ms):
            out.append(frame_fn(bytes(p), int(t)))
        return pd.Series(out)

    return frames.select(
        "media_id", "frame_idx", "ts_ms",
        extract_frame(F.col("payload"), F.col("ts_ms")).alias("frame"),
    )


def media_dedup(media: DataFrame, id_col: str = "media_id",
                payload_col: str = "payload",
                min_copies: int = 2) -> DataFrame:
    """Exact binary-payload deduplication over a media table — the
    multimodal twin of the text dedup_exact stage (recrawled images,
    re-encoded mirrors of the same asset): group by the payload's
    content hash, report every group with ``min_copies`` or more
    copies as ``(payload_md5, n_copies, canonical_id)`` with the
    smallest id as canonical (the keep-rule).

    The hash is ``md5(hex(payload))`` — hex first so the SAME digest
    is computable by engines whose hash functions are string-only
    (DuckDB), while Spark stays one JVM-side expression.  hex, NOT
    base64: Spark's ``base64()`` MIME-chunks inputs past 57 bytes
    (newlines every 76 chars) while DuckDB's does not — a probed
    divergence that only bites on REAL payload sizes; both engines'
    ``hex`` is uppercase and unchunked at any length.  The 2x hash
    input is the price of the portable contract (a production fork can
    hash raw bytes).

    Scale shape: ONE map-side-combined aggregate on the 32-char digest
    (payload bytes never shuffle — only their hashes); pure codegen
    before it.  No python, no windows.
    """
    if min_copies < 1:
        raise ValueError("need min_copies >= 1")
    h = F.md5(F.hex(F.col(payload_col)))
    return (
        media.select(h.alias("payload_md5"),
                     F.col(id_col).alias("_id"))
        .groupBy("payload_md5")
        .agg(F.count("*").cast("long").alias("n_copies"),
             F.min("_id").cast("long").alias("canonical_id"))
        .filter(F.col("n_copies") >= int(min_copies))
    )
