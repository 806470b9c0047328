"""Data-selection importance resampling (DSIR-style, Xie et al. 2023).

The production question: given a huge raw crawl and a (much smaller)
target corpus that looks like what you want to train on, score every raw
document by how target-like it is and sample proportionally. DSIR does
this with hashed n-gram features and an importance weight
``p_target(x)/p_raw(x)``; this operator keeps that construction but makes
every step integer-exact so the DuckDB oracle replays it bit-for-bit:

- tokens hash into ``n_buckets`` feature buckets (md5, the repo-wide
  bucket pattern shared with ``linear_quality``/``hash_sample``);
- each corpus reduces to a BUCKET RATE table: occurrences per bucket in
  parts-per-million of the corpus total, +1 smoothed — a ``n_buckets``-row
  aggregate with map-side combine, shuffle volume independent of corpus
  size, same sketch shape as CMS;
- a bucket's likelihood ratio is ``(target_ppm * 1e6) div raw_ppm``
  (integer ppm of the ratio). Documented divergence from the paper: DSIR
  sums LOG ratios; engine-exact logs across Spark/DuckDB libms are not
  contractible, so the score here is the per-occurrence MEAN ratio —
  monotone in the same direction, integer end to end;
- a document's score is the mean bucket ratio over its token occurrences
  (``div`` both engines — truncation parity is pinned in build notes);
- resampling keeps a doc iff ``h30 * cap_ppm < min(cap_ppm, score) <<
  30`` where ``h30`` is a 30-bit md5 of (salt, doc_id): an inclusion
  probability of ``min(1, score/cap_ppm)`` with zero RNG state, zero
  shuffle beyond the scoring, and exact cross-engine arithmetic
  (products stay under 2^61).

Scale shape at 100 TB: two bucket-rate aggregates (bounded), one
broadcast of the 2 x n_buckets ratio table onto the token stream (no
join shuffle — ``element_at`` on a literal array would need a collect;
the bucket table is joined instead and AQE broadcasts it), one
groupBy(doc) with partial aggregation. The raw corpus is never
self-joined, sorted, or collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._util import attach_scalar

PPM = 1_000_000
H30 = 1 << 30


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    return toks


def _bucket(col, salt: str, n_buckets: int):
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.lit(":"), col)), 1, 8),
        16, 10,
    ).cast("long")
    return F.pmod(h, F.lit(int(n_buckets)))


def bucket_rates(docs: DataFrame, n_buckets: int = 256, salt: str = "ir0",
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(bucket, ppm): smoothed per-bucket token-occurrence rate.

    ``ppm = ((count + 1) * 1e6) div (total + n_buckets)`` — Laplace
    smoothing so unseen buckets never divide by zero, integer division on
    both engines. Missing buckets are densified to count 0 so the table
    is always exactly ``n_buckets`` rows.
    """
    spark = docs.sparkSession
    toks = _tokens(docs, id_col, text_col)
    counts = (
        toks.select(_bucket(F.col("tok"), salt, n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    dense = spine.join(counts, "bucket", "left").select(
        "bucket", F.coalesce("cnt", F.lit(0).cast("long")).alias("cnt")
    )
    total = dense.agg(F.sum("cnt").alias("t")).select(
        (F.col("t") + F.lit(int(n_buckets))).alias("denom")
    )
    return attach_scalar(dense, total).select(
        "bucket",
        F.expr("((cnt + 1) * {ppm}) div denom".format(ppm=PPM))
        .cast("long").alias("ppm"),
    )


def importance_scores(raw: DataFrame, target: DataFrame,
                      n_buckets: int = 256, salt: str = "ir0",
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Score every raw doc: (doc_id, n_tokens, score_ppm) where score_ppm
    is the mean per-occurrence likelihood ratio in ppm (1e6 = ratio 1.0,
    i.e. 'looks equally target-like and raw-like'). Token-less docs score
    0 (nothing to judge — the resampler then never keeps them).
    """
    t_rates = bucket_rates(target, n_buckets, salt, id_col, text_col)
    r_rates = bucket_rates(raw, n_buckets, salt, id_col, text_col)
    ratios = (
        t_rates.alias("t")
        .join(r_rates.alias("r"), "bucket")
        .select(
            "bucket",
            F.expr("(t.ppm * {ppm}) div r.ppm".format(ppm=PPM))
            .cast("long").alias("ratio_ppm"),
        )
    )
    toks = _tokens(raw, id_col, text_col).select(
        "doc_id", _bucket(F.col("tok"), salt, n_buckets).alias("bucket")
    )
    scored = (
        toks.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("ratio_ppm").cast("long").alias("ratio_sum"),
        )
        .select(
            "doc_id", "n_tokens",
            F.expr("ratio_sum div n_tokens").cast("long").alias("score_ppm"),
        )
    )
    spine = raw.select(F.col(id_col).alias("doc_id"))
    return spine.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        F.coalesce("score_ppm", F.lit(0).cast("long")).alias("score_ppm"),
    )


def importance_resample(raw: DataFrame, target: DataFrame,
                        cap_ppm: int = 2_000_000, n_buckets: int = 256,
                        salt: str = "ir0", id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Scores plus the deterministic weighted-Bernoulli keep decision:
    P(keep) = min(1, score_ppm / cap_ppm). ``cap_ppm`` is the ratio at
    which a doc is kept with certainty (2.0 by default: anything twice as
    target-like as average is always kept).

    Returns (doc_id, n_tokens, score_ppm, keep) — callers filter on
    ``keep`` for the resampled corpus; emitting the full decision table
    keeps the operator one narrow projection over the scores.
    """
    if not 0 < cap_ppm <= 2**31:
        raise ValueError("cap_ppm out of range: " + str(cap_ppm))
    scores = importance_scores(raw, target, n_buckets, salt, id_col,
                               text_col)
    # 8 hex chars (32 bits) — the repo-wide md5 pattern; 16 chars would
    # overflow a signed 64-bit cast in both engines
    h30 = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.lit("|keep|"),
                               F.col("doc_id").cast("string"))), 1, 8),
            16, 10,
        ).cast("long"),
        F.lit(H30),
    )
    keep = (h30 * F.lit(int(cap_ppm))) < (
        F.least(F.lit(int(cap_ppm)).cast("long"), F.col("score_ppm"))
        * F.lit(H30)
    )
    return scores.select("doc_id", "n_tokens", "score_ppm",
                         keep.alias("keep"))


def importance_oracle_sql(raw_sql: str, target_sql: str,
                          cap_ppm: int = 2_000_000, n_buckets: int = 256,
                          salt: str = "ir0") -> str:
    """DuckDB replay of ``importance_resample`` (and, by projection,
    ``importance_scores``): same md5 buckets, same smoothed integer ppm
    rates, same div arithmetic, same 30-bit keep hash."""
    def rates(src, name):
        return """
{name}_tok AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM ({src})),
{name}_cnt AS (
  SELECT CAST(('0x' || substring(md5('{salt}:' || tok), 1, 8)) AS BIGINT)
           % {nb} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM {name}_tok WHERE tok <> '' GROUP BY 1),
{name}_dense AS (
  SELECT r.range AS bucket, COALESCE(cnt, CAST(0 AS BIGINT)) AS cnt
  FROM range({nb}) r LEFT JOIN {name}_cnt ON {name}_cnt.bucket = r.range),
{name}_rate AS (
  SELECT bucket,
         CAST(((cnt + 1) * {ppm})
              // ((SELECT SUM(cnt) FROM {name}_dense) + {nb}) AS BIGINT)
           AS ppm
  FROM {name}_dense)""".format(name=name, src=src, salt=salt,
                               nb=n_buckets, ppm=PPM)

    return """
WITH {t_rates},
{r_rates},
ratios AS (
  SELECT t.bucket, CAST((t.ppm * {ppm}) // r.ppm AS BIGINT) AS ratio_ppm
  FROM t_rate t JOIN r_rate r USING (bucket)),
doc_tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM ({raw})),
doc_bkt AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5('{salt}:' || tok), 1, 8)) AS BIGINT)
           % {nb} AS bucket
  FROM doc_tok WHERE tok <> ''),
scored AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(ratio_ppm) // COUNT(*) AS BIGINT) AS score_ppm
  FROM doc_bkt JOIN ratios USING (bucket) GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
       COALESCE(score_ppm, CAST(0 AS BIGINT)) AS score_ppm,
       (CAST(('0x' || substring(md5('{salt}|keep|'
              || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % {h30}) * {cap}
         < least(CAST({cap} AS BIGINT), COALESCE(score_ppm, 0)) * {h30}
         AS keep
FROM ({raw}) d
LEFT JOIN scored ON scored.doc_id = d.doc_id
ORDER BY d.doc_id
""".format(
        t_rates=rates(target_sql, "t").lstrip(),
        r_rates=rates(raw_sql, "r").lstrip(),
        raw=raw_sql, salt=salt, nb=n_buckets, ppm=PPM,
        h30=H30, cap=int(cap_ppm),
    )
