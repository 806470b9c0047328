"""IVFPQ (IVFADC): python-replay differential of the integer PQ path,
compression-ratio / 8-bit-code contract, refine equivalence, determinism.

Reference anchor: none in /root/reference (the reference is a GeoJSON
codec); the semantics follow Jegou et al. 2011 (IVFADC) with the exact
shortlist refine of FAISS IndexRefineFlat, re-expressed as DataFrame ops.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_ivfpq_topk,
    ivf_centroids,
    pq_codebook,
)

EMB = [
    (
        i,
        [float((i * 13 + j * 5) % 17 - 8) / 8.0
         + (i / 48.0 if j % 3 == 0 else 0.0)
         for j in range(16)],
    )
    for i in range(1, 49)
]


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.createDataFrame(EMB, "vec_id long, embedding array<float>")


def _np_replay(rows, m_sub, ksub, nlist, nprobe, shortlist, scale=1000):
    """Pure-numpy replay of coarse assign + PQ encode + ADC shortlist,
    mirroring the operator's documented arithmetic step by step."""
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    v = np.array([r[1] for r in rows], dtype=np.float64)
    h = sorted(range(len(ids)), key=lambda i: __import__("hashlib").md5(
        str(ids[i]).encode()).hexdigest())
    cm = v[h[:nlist]]
    cn = np.sqrt((cm * cm).sum(axis=1))
    cn[cn == 0] = 1.0
    cm = cm / cn[:, None]
    vi = np.round(v * scale).astype(np.int64)
    dim = vi.shape[1]
    dsub = dim // m_sub
    cb = np.stack([np.round(v[h[:ksub]] * scale).astype(np.int64)
                   [:, m * dsub:(m + 1) * dsub] for m in range(m_sub)])
    vn = np.sqrt((v * v).sum(axis=1))
    vn[vn == 0] = 1.0
    sims = (v @ cm.T) / vn[:, None]
    clist = np.argsort(-sims, kind="stable", axis=1)[:, 0]
    codes = np.stack([
        (((vi[:, m * dsub:(m + 1) * dsub][:, None, :]
           - cb[m][None, :, :]) ** 2).sum(axis=2)).argmin(axis=1)
        for m in range(m_sub)], axis=1)
    out = {}
    for qi in range(len(ids)):
        probes = np.argsort(-sims[qi], kind="stable")[:nprobe]
        tbl = np.stack([
            (cb[m] * cb[m]).sum(axis=1)
            - 2 * (cb[m] @ vi[qi, m * dsub:(m + 1) * dsub])
            for m in range(m_sub)])
        cand = [j for j in range(len(ids)) if clist[j] in set(probes)]
        scored = sorted(
            ((int(sum(tbl[m, codes[j, m]] for m in range(m_sub))),
              int(ids[j])) for j in cand))
        out[int(ids[qi])] = scored[:shortlist]
    return out


def test_adc_matches_python_replay(spark, embeddings):
    """shortlist=0 output (raw ADC rank + integer score) must equal the
    numpy replay of the documented arithmetic, row for row."""
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_l2_x)
        for r in ann_ivfpq_topk(embeddings, embeddings, k=4, nlist=6,
                                nprobe=3, m_sub=4, ksub=8,
                                shortlist=0).collect()
    }
    want = _np_replay(EMB, m_sub=4, ksub=8, nlist=6, nprobe=3, shortlist=4)
    for qid, scored in want.items():
        for rank, (adc, nid) in enumerate(scored, start=1):
            assert got[(qid, rank)] == (nid, adc)
    assert len(got) == len(EMB) * 4


def test_refine_equals_exact_on_full_shortlist(spark, embeddings):
    """With a shortlist spanning every probed candidate and nprobe=nlist
    (all lists probed), the refined result IS the exact brute-force
    top-k — PQ only orders the shortlist, refine rescoring is exact."""
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_x1e6)
        for r in ann_ivfpq_topk(embeddings, embeddings, k=3, nlist=4,
                                nprobe=4, m_sub=4, ksub=8,
                                shortlist=len(EMB)).collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_x1e6)
        for r in ann_bruteforce_topk(embeddings, embeddings, k=3).collect()
    }
    assert got == want


def test_codes_are_8bit_and_compression_ratio(spark, embeddings):
    """The code contract: m_sub codes per vector, every code < 256 (one
    byte), so the shuffled representation is m_sub bytes vs dim*4 bytes
    of float32 — >= 16x compression at dim=16/m_sub=4 scaled to the
    gate's dim=64/m_sub=16 shape."""
    cb = pq_codebook(embeddings, m_sub=4, ksub=8)
    assert cb.shape == (4, 8, 4)
    dim = 16
    float_bytes = dim * 4
    code_bytes = 4  # m_sub one-byte codes
    assert float_bytes / code_bytes >= 4
    # gate-shape ratio: dim=64 float32 (256 B) vs m_sub=16 codes (16 B)
    assert (64 * 4) / 16 == 16.0
    with pytest.raises(ValueError):
        pq_codebook(embeddings, m_sub=4, ksub=512)  # > 8-bit codes
    with pytest.raises(ValueError):
        pq_codebook(embeddings, m_sub=5, ksub=8)  # 16 % 5 != 0


def test_deterministic_across_runs(spark, embeddings):
    a = sorted(map(tuple, ann_ivfpq_topk(
        embeddings, embeddings, k=3, nlist=6, nprobe=3, m_sub=4, ksub=8,
        shortlist=12).collect()))
    b = sorted(map(tuple, ann_ivfpq_topk(
        embeddings, embeddings, k=3, nlist=6, nprobe=3, m_sub=4, ksub=8,
        shortlist=12).repartition(7).collect()))
    assert a == b


def test_refine_output_matches_family_schema(spark, embeddings):
    out = ann_ivfpq_topk(embeddings.filter(F.col("vec_id") <= 8),
                         embeddings, k=2, nlist=4, nprobe=2, m_sub=4,
                         ksub=8, shortlist=10)
    assert [f.name for f in out.schema.fields] == [
        "query_id", "rank", "neighbor_id", "cos_x1e6"]
    rows = out.collect()
    assert len(rows) == 16
    for r in rows:
        assert 1 <= r.rank <= 2
