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


def fake_features(payload: bytes, dim: int = 8):
    """Deterministic stand-in feature vector: md5-derived floats in [0, 1)."""
    h = hashlib.md5(payload).digest()
    return [
        int.from_bytes(h[2 * i: 2 * i + 2], "big") / 65536.0 for i in range(dim)
    ]


def extract_media_features(media: DataFrame, dim: int = 8,
                           feature_fn=fake_features) -> DataFrame:
    """media -> (media_id, kind, features array<double>, n_bytes).

    One mapInPandas, batch-shaped like a real model-inference stage (payload
    bytes in, fixed-width vectors out), partitioning preserved.
    """
    import pandas as pd

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [
                        feature_fn(bytes(p), dim) for p in pdf["payload"]
                    ],
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
