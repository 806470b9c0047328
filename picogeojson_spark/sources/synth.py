"""Deterministic synthesized ``pages`` corpus (the engine's input table).

Schema per BASELINE.json ``input_hint``::

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Every row is a pure function of ``(seed, doc_id)``, so any slice can be
generated independently on any executor — the distributed generator is
``spark.range(n).mapInPandas(...)`` with zero shuffle and linear scaling.

Content mix (per FIXTURES.md §1): 0–3 embedded GeoJSON blocks per page over
all nine RFC-7946 types, including unclosed rings, wrong winding, holes,
dateline crossers, 3-D coordinates, crs members, nested GeometryCollections,
Features with ids and nested-dict properties; multilingual filler text; and a
deliberate hot-spot: ~5% of geometries concentrate in 3 "hot" cells to
exercise the skew-handling join path.
"""

from __future__ import annotations

import datetime as _dt
import json
import random

from .extract import extract_text

SEED = 20260816

LANGS = ["en", "de", "fr", "ja", "pt", "es"]

_FILLER = {
    "en": "the quick brown fox jumps over the lazy dog near the old harbor",
    "de": "der schnelle braune fuchs springt über den faulen hund am alten hafen",
    "fr": "le rapide renard brun saute par dessus le chien paresseux du vieux port",
    "ja": "素早い茶色の狐が怠け者の犬を飛び越える 古い港の近くで",
    "pt": "a rápida raposa marrom salta sobre o cão preguiçoso perto do porto velho",
    "es": "el rápido zorro marrón salta sobre el perro perezoso cerca del puerto viejo",
}

# hot-spot centers (lon, lat): ~5% of geometries land within these
HOT_SPOTS = [(139.7, 35.7), (-74.0, 40.7), (2.35, 48.85)]
HOT_FRACTION = 0.05

_EPOCH = _dt.datetime(2026, 6, 1, tzinfo=_dt.timezone.utc)


def _center(rng):
    if rng.random() < HOT_FRACTION:
        cx, cy = HOT_SPOTS[rng.randrange(len(HOT_SPOTS))]
        return cx + rng.uniform(-0.02, 0.02), cy + rng.uniform(-0.02, 0.02)
    if rng.random() < 0.08:  # dateline neighbourhood
        return rng.choice([178.0, -178.0]) + rng.uniform(-1.5, 1.5), rng.uniform(-60, 60)
    return rng.uniform(-179, 179), rng.uniform(-84, 84)


def _pos(rng, cx, cy, spread=0.5, three_d=False):
    p = [round(cx + rng.uniform(-spread, spread), 6), round(cy + rng.uniform(-spread, spread), 6)]
    if three_d:
        p.append(round(rng.uniform(0, 1000), 1))
    return p


def _ring(rng, cx, cy, r=None, reverse=False, unclosed=False):
    import math

    r = r if r is not None else rng.uniform(0.05, 0.8)
    n = rng.randint(4, 9)
    ring = [
        [round(cx + r * math.cos(2 * math.pi * i / n), 6),
         round(cy + r * math.sin(2 * math.pi * i / n), 6)]
        for i in range(n)
    ]
    if reverse:
        ring = ring[::-1]
    if not unclosed:
        ring.append(list(ring[0]))
    return ring


def _geometry(rng, depth=0):
    kinds = [
        "Point", "Point", "Point",
        "MultiPoint", "LineString", "LineString",
        "MultiLineString", "Polygon", "Polygon",
        "MultiPolygon",
    ]
    if depth == 0:
        kinds.append("GeometryCollection")
    k = rng.choice(kinds)
    cx, cy = _center(rng)
    # 3-D only for standalone Points: mixing 2-D and 3-D members in one
    # GeometryCollection crashes the reference's n-dim bbox aggregation
    # (/root/reference/picogeojson/bbox.py:48-53), so a conformant corpus
    # never contains that shape
    three_d = depth == 0 and rng.random() < 0.1
    if k == "Point":
        return {"type": "Point", "coordinates": _pos(rng, cx, cy, three_d=three_d)}
    if k == "MultiPoint":
        return {
            "type": "MultiPoint",
            "coordinates": [_pos(rng, cx, cy) for _ in range(rng.randint(2, 6))],
        }
    if k == "LineString":
        return {
            "type": "LineString",
            "coordinates": [_pos(rng, cx, cy, spread=2.0) for _ in range(rng.randint(2, 8))],
        }
    if k == "MultiLineString":
        return {
            "type": "MultiLineString",
            "coordinates": [
                [_pos(rng, cx, cy, spread=2.0) for _ in range(rng.randint(2, 5))]
                for _ in range(rng.randint(1, 3))
            ],
        }
    if k == "Polygon":
        rings = [_ring(rng, cx, cy, reverse=rng.random() < 0.4, unclosed=rng.random() < 0.3)]
        if rng.random() < 0.3:
            rings.append(_ring(rng, cx, cy, r=0.02, reverse=rng.random() < 0.5))
        return {"type": "Polygon", "coordinates": rings}
    if k == "MultiPolygon":
        return {
            "type": "MultiPolygon",
            "coordinates": [
                [_ring(rng, *_center(rng))] for _ in range(rng.randint(1, 3))
            ],
        }
    return {
        "type": "GeometryCollection",
        "geometries": [_geometry(rng, depth + 1) for _ in range(rng.randint(1, 3))],
    }


def _geojson_doc(rng, doc_id, block_idx):
    g = _geometry(rng)
    roll = rng.random()
    if roll < 0.35:
        return g
    feat = {
        "type": "Feature",
        "geometry": g,
        "properties": {
            "name": "site-{}-{}".format(doc_id, block_idx),
            "kind": rng.choice(["city", "river", "boundary", "poi"]),
            "meta": {"rank": rng.randint(0, 9)},
        },
    }
    if rng.random() < 0.5:
        feat["id"] = doc_id * 10 + block_idx
    if roll < 0.75:
        return feat
    return {
        "type": "FeatureCollection",
        "features": [feat]
        + [
            {
                "type": "Feature",
                "geometry": _geometry(rng),
                "properties": {"kind": "extra"},
            }
            for _ in range(rng.randint(0, 2))
        ],
    }


def make_page(doc_id: int, seed: int = SEED):
    """Pure function (seed, doc_id) -> pages row dict."""
    rng = random.Random((seed << 20) ^ doc_id)
    lang = LANGS[doc_id % len(LANGS)]
    url = "https://synth.example/{}/{:08d}".format(lang, doc_id)
    ts = _EPOCH + _dt.timedelta(seconds=rng.randint(0, 30 * 24 * 3600))

    n_blocks = rng.choice([0, 1, 1, 1, 2, 2, 3])
    blocks = [
        json.dumps(_geojson_doc(rng, doc_id, i), separators=(",", ":"))
        for i in range(n_blocks)
    ]

    filler = _FILLER[lang]
    paras = " ".join(
        "{} {}".format(filler, rng.randint(0, 10**6)) for _ in range(rng.randint(2, 6))
    )
    parts = [
        "<html><head><title>doc {}</title>".format(doc_id),
        "<style>body {{ margin: {}px; }}</style>".format(rng.randint(0, 9)),
        "<script>var x = {};</script>".format(rng.randint(0, 999)),
        "</head><body><h1>Page {}</h1>".format(doc_id),
        "<p>{}</p>".format(paras),
    ]
    for i, b in enumerate(blocks):
        if rng.random() < 0.7:
            parts.append('<script type="application/geo+json">{}</script>'.format(b))
        else:
            parts.append("<p>data: {}</p>".format(b.replace("<", "&lt;")))
    parts.append("</body></html>")
    html = "".join(parts).encode("utf-8")

    return {
        "url": url,
        "warc_ts": ts.replace(tzinfo=None),
        "html": html,
        "text": extract_text(html),
        "lang": lang,
    }


PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_dataframe(spark, n_rows: int, seed: int = SEED, partitions: int = None):
    """Distributed deterministic generator: spark.range -> mapInPandas."""
    import pandas as pd

    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches):
        for pdf in batches:
            rows = [make_page(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_rows, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA_DDL)
    )


def write_pages_parquet(path: str, n_rows: int, seed: int = SEED):
    """Local (driver-side) writer for small test fixtures, via pyarrow."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [make_page(i, seed) for i in range(n_rows)]
    table = pa.Table.from_pylist(rows)
    pq.write_table(table, path)
    return path


def clustered_embeddings(spark, n_clusters: int = 8, per_cluster: int = 30,
                         dim: int = 16):
    """Deterministic clustered embedding corpus: well-separated axis-aligned
    cluster centers with small integer-derived jitter (no RNG state). The
    realistic regime for clustering-based ANN — used by both the pytest
    quantizer-quality test and the correctness gate's k-means IVF recall
    floor, so the two always measure the same distribution."""
    rows = []
    vid = 0
    for c in range(n_clusters):
        for m in range(per_cluster):
            vid += 1
            v = [0.0] * dim
            v[(c * 2) % dim] = 10.0
            v[(c * 2 + 1) % dim] = 3.0
            v[(c + m) % dim] += ((m * 7) % 5) * 0.1
            rows.append((vid, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")
