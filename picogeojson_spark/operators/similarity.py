"""Similarity search over embedding columns (array<float>).

- ``ann_bruteforce_topk``: exact cosine top-k via JVM-side higher-order
  functions (``zip_with`` + ``aggregate`` — no Python in the hot path) and a
  window; the baseline every approximate method is judged against.
- ``ann_lsh_topk``: random-hyperplane LSH bucketing as the scale path —
  hyperplane components derive deterministically from (plane, dim) via md5,
  so buckets are reproducible across engines and runs. Exactness is restored
  per-bucket (full scoring inside the bucket); recall vs brute force is a
  measured, tested property.
- ``cosine_pairs``: all pairs with cosine >= threshold (near-dup detection
  on embeddings).

Numeric determinism: scores are computed in float64 with a fixed
left-to-right ``aggregate`` fold — the same sequential order DuckDB's
``list_dot_product`` uses, so oracle comparisons are exact when inputs are
cast to double on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a):
    return F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )


def with_norm(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return embeddings.withColumn("norm2", _norm2(F.col(vec_col)))


def ann_bruteforce_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, neighbor_id, cos_x1e6)."""
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", F.sqrt(_norm2(F.col("qv"))))
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("cn", F.sqrt(_norm2(F.col("cv"))))
    scored = q.crossJoin(c).select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "neighbor_id",
            F.round(F.col("cos") * 1e6).cast("long").alias("cos_x1e6"),
        )
    )


def _hyperplane_sign(vec_col, plane: int, dim: int):
    """Deterministic pseudo-random hyperplane: component c_j for dimension j
    is (md5-derived integer in [-500, 499]) / 500; sign of <v, c>."""
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("{}:".format(plane)), j.cast("string"))),
                    1, 6,
                ),
                16, 10,
            ).cast("long") % 1000 - 500
        ).cast("double") / 500.0,
    )
    dot = F.aggregate(
        F.zip_with(vec_col, comps, lambda x, c: x.cast("double") * c),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (dot >= 0).cast("int")


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    planes: int = 8,
    dim: int = None,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed cosine top-k (approximate: searches the query's bucket)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])

    def bucket(df, id_alias):
        sig = None
        for p in range(planes):
            bit = _hyperplane_sign(F.col(vec_col), p, dim) * (2**p)
            sig = bit if sig is None else sig + bit
        return df.select(
            F.col("*"), sig.alias("bucket")
        ).withColumnRenamed(query_id if id_alias == "query_id" else corpus_id,
                            id_alias)

    q = bucket(queries, "query_id").select(
        "query_id", "bucket", F.col(vec_col).alias("qv")
    ).withColumn("qn", F.sqrt(_norm2(F.col("qv"))))
    c = bucket(corpus, "neighbor_id").select(
        "neighbor_id", "bucket", F.col(vec_col).alias("cv")
    ).withColumn("cn", F.sqrt(_norm2(F.col("cv"))))

    scored = q.join(c, on="bucket").select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "neighbor_id",
            F.round(F.col("cos") * 1e6).cast("long").alias("cos_x1e6"),
        )
    )


def cosine_pairs(embeddings: DataFrame, threshold: float,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All (a < b) pairs with cosine >= threshold (embedding near-dups)."""
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    ).withColumn("na", F.sqrt(_norm2(F.col("va"))))
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    ).withColumn("nb", F.sqrt(_norm2(F.col("vb"))))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select(
            "id_a", "id_b",
            F.round(F.col("cos") * 1e6).cast("long").alias("cos_x1e6"),
        )
    )


def ann_bruteforce_topk_np(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """numpy-matmul brute-force cosine top-k (the fast exact path).

    The corpus is broadcast as one float64 matrix; each Arrow batch of
    queries does a single (B x D) @ (D x C) matmul and a partial-sort —
    orders of magnitude faster than per-pair expression folds. Appropriate
    while the corpus fits in executor memory (the standard brute-force ANN
    regime); beyond that, shard the corpus and union per-shard top-k.

    Tie-break identical to ``ann_bruteforce_topk``: cos desc, neighbor id
    asc. Scores emitted as ``cos_x1e6`` like the expression variant.
    """
    import numpy as np
    import pandas as pd

    rows = corpus.select(corpus_id, vec_col).collect()
    ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    mat = np.asarray([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = queries.sparkSession.sparkContext.broadcast((ids, mat, norms))

    def topk(batches):
        c_ids, c_mat, c_norms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            qn = np.sqrt((q * q).sum(axis=1))
            cos = (q @ c_mat.T) / (qn[:, None] * c_norms[None, :])
            # lexicographic: primary cos desc, secondary id asc
            order = np.lexsort((c_ids[None, :].repeat(len(q), 0), -cos), axis=1)
            out_q, out_r, out_n, out_c = [], [], [], []
            for i, qid in enumerate(pdf[query_id]):
                sel = order[i, :k]
                out_q.extend([qid] * len(sel))
                out_r.extend(range(1, len(sel) + 1))
                out_n.extend(int(c_ids[j]) for j in sel)
                out_c.extend(int(v) for v in np.round(cos[i, sel] * 1e6))
            yield pd.DataFrame(
                {"query_id": out_q, "rank": out_r, "neighbor_id": out_n,
                 "cos_x1e6": out_c}
            )

    return queries.select(
        F.col(query_id).alias(query_id), vec_col
    ).mapInPandas(
        topk, schema="query_id long, rank int, neighbor_id long, cos_x1e6 long"
    )


def ivf_centroids(
    corpus: DataFrame,
    nlist: int,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic IVF coarse quantizer: the ``nlist`` corpus vectors with
    the smallest md5(id) form the centroid set (a reproducible pseudo-random
    sample — no RNG state, identical across runs/engines), L2-normalized so
    nearest-centroid-by-dot == nearest-by-cosine.

    Returns (ids, matrix) as numpy arrays; callers broadcast the matrix. At
    production scale, centroids train once offline (k-means over a sample)
    and persist as a tiny side table — the query path is unchanged.
    """
    import numpy as np

    seeds = (
        corpus.select(F.col(corpus_id).alias("cid"), F.col(vec_col).alias("v"))
        .withColumn("h", F.md5(F.col("cid").cast("string")))
        .orderBy("h")
        .limit(nlist)
        .collect()
    )
    mat = np.asarray([r["v"] for r in seeds], dtype=np.float64)
    mat = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
    return np.asarray([r["cid"] for r in seeds], dtype=np.int64), mat


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-bucketed cosine top-k (approximate: searches ``nprobe`` inverted
    lists per query).

    Scale shape: the corpus is partitioned into ``nlist`` inverted lists by
    nearest centroid (one vectorized matmul per Arrow batch — the centroid
    matrix is a broadcast of nlist*D doubles, tiny). Each query probes its
    ``nprobe`` nearest lists, so per-query scored candidates shrink by
    ~nlist/nprobe vs brute force while the scoring itself stays exact
    (full cosine inside the probed lists — same JVM-side expression as the
    brute-force baseline, so scores for returned pairs are bit-identical).
    At 100 TB the list assignment is a narrow map (no shuffle); the
    list-id equi-join is the only exchange and AQE handles hot lists.
    """
    import numpy as np
    import pandas as pd

    _, cmat = ivf_centroids(corpus, nlist, corpus_id, vec_col)
    bc = corpus.sparkSession.sparkContext.broadcast(cmat)

    def assign(id_name, probes):
        def run(batches):
            C = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = np.asarray(list(pdf["v"]), dtype=np.float64)
                vn = np.sqrt((v * v).sum(axis=1))
                vn[vn == 0] = 1.0
                sims = (v @ C.T) / vn[:, None]
                # lexicographic tie-break: sim desc, list id asc (np.argsort
                # is stable, so sorting -sims keeps index order on ties)
                lists = np.argsort(-sims, kind="stable", axis=1)[:, :probes]
                n = len(pdf)
                yield pd.DataFrame(
                    {
                        id_name: pdf[id_name].repeat(probes).values,
                        "list_id": lists.reshape(-1).astype("int32"),
                        "v": [row for row in pdf["v"].repeat(probes)],
                    }
                )

        return run

    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("v")
    ).mapInPandas(
        assign("query_id", nprobe),
        schema="query_id long, list_id int, v array<float>",
    ).select(
        "query_id", "list_id", F.col("v").alias("qv")
    ).withColumn("qn", F.sqrt(_norm2(F.col("qv"))))

    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("v")
    ).mapInPandas(
        assign("neighbor_id", 1),
        schema="neighbor_id long, list_id int, v array<float>",
    ).select(
        "neighbor_id", "list_id", F.col("v").alias("cv")
    ).withColumn("cn", F.sqrt(_norm2(F.col("cv"))))

    scored = q.join(c, on="list_id").select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "neighbor_id",
            F.round(F.col("cos") * 1e6).cast("long").alias("cos_x1e6"),
        )
    )
