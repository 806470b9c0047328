"""Top principal direction of an embedding corpus — integer power
iteration on the Gram matrix.

The PCA-whitening / dominant-direction read of embedding curation:
anisotropy diagnosis (one direction eating the variance ruins cosine
retrieval), ABTT-style common-direction removal, and projection features
all start from the top eigenvector of X^T X.

Exactness contract: components quantize to integers (floor(x * SCALE_Q),
the IVFPQ quantization discipline — float64 multiply + floor is
IEEE-identical in both engines), so the Gram matrix is EXACT int64; the
iteration renormalizes through an exact integer divide by the max
|component| each round.  The result after R rounds is a pure function of
the input — bit-identical across engines, partitionings, and reruns (the
pagerank discipline applied to eigenvectors).  Uncentered second moment
by design (embeddings are typically length-normalized; center upstream
if means matter).

Scale shape: the Gram build is the only corpus-sized stage — a double
posexplode to (i, j, xi*xj) feeding ONE map-side-combined (i, j)
aggregate, so the shuffle carries tasks x d² rows no matter the corpus
(at production dims swap the explode for a per-partition numpy matmul
mapInPandas emitting the same d² partials — identical downstream).  The
power iteration then runs entirely on the d²-row Gram table: per round
one broadcast-sized equi-join + d-row aggregate + the sanctioned 1-row
scalar attach for the normalizer, eagerly localCheckpointed (d-row
vector) to keep plan depth O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ._util import attach_scalar

#: component quantization scale (floor(x * SCALE_Q) — int per component)
SCALE_Q = 1000
#: iteration vector scale (components renormalize into [-SCALE_V, SCALE_V])
SCALE_V = 10 ** 6


def gram_matrix(vectors: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact integer Gram matrix ``(i, j, g)`` (1-based indices) of the
    quantized corpus: ``g = sum over rows of q_i * q_j`` with
    ``q = floor(x * SCALE_Q)``."""
    q = vectors.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col)).alias("i0", "x"),
    ).select(
        "vid", (F.col("i0") + 1).cast("int").alias("i"),
        F.floor(F.col("x").cast("double") * SCALE_Q).cast("long")
        .alias("xi"),
    )
    a, b = q.alias("a"), q.alias("b")
    return (
        a.join(b, F.col("a.vid") == F.col("b.vid"))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.xi") * F.col("b.xi")).cast("long").alias("g"))
    )


def top_direction(vectors: DataFrame, rounds: int = 8,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """``(i, v)`` — the dominant eigenvector of the quantized Gram
    matrix after ``rounds`` integer power iterations, components scaled
    into ``[-SCALE_V, SCALE_V]`` (max |component| = SCALE_V exactly).
    Sign follows the all-ones start vector (deterministic).  Negative
    divisions use the explicit floor spelling on both engines.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    gram = gram_matrix(vectors, id_col=id_col, vec_col=vec_col) \
        .localCheckpoint(eager=True)
    dims = gram.select(F.col("i").alias("d")).distinct() \
        .localCheckpoint(eager=True)
    v = dims.select("d", F.lit(int(SCALE_V)).cast("long").alias("v"))
    for _ in range(int(rounds)):
        w = (
            gram.join(v, gram["j"] == v["d"])
            .groupBy(F.col("i").alias("d"))
            .agg(F.sum(F.expr("cast(g as decimal(38,0)) * v"))
                 .alias("w"))
        )
        wmax = w.agg(F.max(F.abs(F.col("w"))).alias("wmax"))
        v = (
            attach_scalar(w, wmax)
            .select(
                "d",
                F.expr(
                    "CASE WHEN wmax <> 0 THEN cast(div("
                    " w * {s} - pmod(w * {s}, wmax), wmax) as bigint)"
                    " ELSE cast(0 as bigint) END".format(s=int(SCALE_V))
                ).alias("v"),
            )
            .localCheckpoint(eager=True)
        )
    return v.select(F.col("d").alias("i"), "v")


def centroid_outliers(vectors: DataFrame, k: int = 20,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Embedding-space outlier screen — the curation read that flags
    mis-embedded / off-distribution documents: the ``k`` vectors
    farthest (squared L2) from the corpus centroid, in the exact
    quantized integer space (``q = floor(x * SCALE_Q)``, the module's
    quantization discipline — float only in the per-value quantize,
    never in an order-dependent aggregate).  The centroid uses the
    explicit-floor per-dimension mean (off by < 1 quantum per dim from
    the true mean — irrelevant for a screen, and exactly reproducible
    on both engines).  Output: ``(vec_id, dist2)``, ``dist2`` the exact
    integer squared distance, ordered farthest first (ties break on
    vec_id).

    Scale shape: the centroid is ONE posexplode + per-dim aggregate
    (d-bounded) packed into a 1-row array by a keys=[] global aggregate
    and attached via the sanctioned structural scalar attach; the
    per-vector distance is a JVM-side higher-order fold whose lambdas
    touch only their own lambda vars (the documented HOF-safe shape);
    top-k is TakeOrderedAndProject (per-partition heaps, never a global
    sort).  The corpus never shuffles.
    """
    if k < 1:
        raise ValueError("need k >= 1")
    dims = vectors.select(
        F.posexplode(F.col(vec_col)).alias("i0", "x"),
    ).select(
        F.col("i0").cast("int").alias("i"),
        F.floor(F.col("x").cast("double") * SCALE_Q).cast("long")
        .alias("xi"),
    ).groupBy("i").agg(
        F.sum("xi").cast("long").alias("s"),
        F.count("*").cast("long").alias("n"),
    ).select(
        "i",
        F.expr("cast(div(s - pmod(s, n), n) as bigint)").alias("c"),
    )
    cvec = dims.agg(
        F.expr("transform(array_sort(collect_list(struct(i, c))),"
               " p -> p.c)").alias("_cvec"))
    from ._util import attach_scalar

    scored = attach_scalar(
        vectors.select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).alias("_v")),
        cvec,
    ).select(
        "vec_id",
        F.expr(
            "aggregate(zip_with({v}, _cvec,"
            " (x, y) -> (floor(cast(x as double) * {sq}) - y)"
            "           * (floor(cast(x as double) * {sq}) - y)),"
            " 0L, (acc, t) -> acc + t)".format(v="_v", sq=SCALE_Q))
        .cast("long").alias("dist2"),
    )
    return (
        scored.orderBy(F.col("dist2").desc(), F.col("vec_id").asc())
        .limit(int(k))
    )


def norm_profile(vectors: DataFrame, vec_col: str = "embedding"
                 ) -> DataFrame:
    """Embedding-norm health profile — collapsed (near-zero) or
    exploded norms are the classic sign of a broken encoder run or a
    mixed-model corpus: squared L2 norms in the exact quantized space
    (``q = floor(x * SCALE_Q)``), bucketed by doubling ranges; one row
    per non-empty bucket ``(bucket, norm2_lo, n_vecs, share_ppm)``
    plus bucket -1 for exact-zero norms (log2 undefined).

    Scale shape: per-vector norm2 is a JVM-side HOF fold (lambda vars
    only); ONE map-side-combined bucket aggregate; total window on the
    <= 64-row bucket table.  The corpus never shuffles vectors.
    """
    norm2 = F.expr(
        "aggregate(transform({v}, x -> cast(floor(cast(x as double)"
        " * {sq}) as bigint)), 0L, (acc, q) -> acc + q * q)".format(
            v=vec_col, sq=SCALE_Q))
    b = vectors.select(norm2.alias("_n2")).select(
        F.when(F.col("_n2") == 0, F.lit(-1))
        .otherwise(F.length(F.bin(F.col("_n2"))) - 1).cast("int")
        .alias("bucket"),
    ).groupBy("bucket").agg(F.count("*").cast("long").alias("n_vecs"))
    from pyspark.sql import Window

    wall = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return b.select(
        "bucket",
        F.when(F.col("bucket") >= 0,
               F.expr("cast(pow(2, bucket) as bigint)"))
        .otherwise(F.lit(0)).alias("norm2_lo"),
        "n_vecs",
        F.sum("n_vecs").over(wall).cast("long").alias("_tot"),
    ).select(
        "bucket", "norm2_lo", "n_vecs",
        F.expr("cast(div(cast(n_vecs as decimal(38,0)) * 1000000,"
               " _tot) as bigint)").alias("share_ppm"),
    )
