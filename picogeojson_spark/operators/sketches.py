"""Count-min sketch: fixed-size frequency summaries of unbounded token streams.

At 100 TB the exact token-frequency table is itself huge (vocabulary grows
with the corpus — URLs, hashes, typos); a count-min sketch (Cormode &
Muthukrishnan 2005) bounds the summary at ``depth x width`` counters with
a one-sided error guarantee: estimates never under-count, and over-count
by more than ``2N/width`` with probability at most ``(1/2)^depth``.

Spark shape: the build is ONE linear pass — explode tokens, fan each out
to ``depth`` (row, bucket) keys, and hash-aggregate. The map-side partial
combine reduces every task's contribution to at most ``depth*width``
counters before the (tiny) shuffle, so the exchange volume is bounded by
the sketch size times the task count — independent of corpus size. The
result is a ``<= depth*width``-row table, broadcastable for point queries
or mergeable across corpus shards by plain ``cnt`` addition (the sketch is
a linear projection — union the rows, re-aggregate).

Determinism: the bucket hash is the repo-standard md5 construction
(``conv(substr(md5('cms' || row || ':' || token), 1, 8), 16, 10) % width``,
see ``sampling.hash_bucket``), replayed bit-for-bit by the DuckDB oracle.
Every count is an exact integer; the ONLY approximation is bucket
collision, which is itself deterministic given (depth, width, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = r"\s+"


def _bucket(row_j, tok, width: int, salt: str):
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), row_j.cast("string"),
                           F.lit(":"), tok)),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    return F.pmod(h, F.lit(int(width)))


def cms_build(docs: DataFrame, depth: int = 4, width: int = 1024,
              text_col: str = "text", salt: str = "cms") -> DataFrame:
    """Build the sketch: one row per touched counter
    ``(row_j, bucket, cnt)`` with ``0 <= row_j < depth``.

    Untouched counters are implicitly zero (the estimate side coalesces),
    so the table is at most ``depth * width`` rows regardless of corpus
    size. Tokens are the whitespace-split non-empty words of ``text_col``.
    """
    if depth <= 0 or width <= 0:
        raise ValueError("depth and width must be positive")
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.col(text_col), _TOKEN_RE, -1),
                     lambda x: F.length(x) > 0)
        ).alias("tok")
    )
    fan = toks.select(
        F.explode(F.sequence(F.lit(0), F.lit(int(depth) - 1))).alias("row_j"),
        "tok",
    )
    return (
        fan.select(
            "row_j",
            _bucket(F.col("row_j"), F.col("tok"), width, salt).alias("bucket"),
        )
        .groupBy("row_j", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, terms: DataFrame, depth: int = 4,
                 width: int = 1024, term_col: str = "term",
                 salt: str = "cms") -> DataFrame:
    """Point-query the sketch: ``(term, est)`` where ``est`` is the minimum
    over the ``depth`` rows of the term's counter (0 when never touched).

    The terms table is fanned out to its ``depth`` probe keys and
    equi-joined to the sketch — with the sketch bounded at depth*width
    rows, Spark broadcasts it and the probe never shuffles the terms side.
    """
    probes = terms.select(
        F.col(term_col).alias("term"),
        F.explode(F.sequence(F.lit(0), F.lit(int(depth) - 1))).alias("row_j"),
    )
    keyed = probes.withColumn(
        "bucket", _bucket(F.col("row_j"), F.col("term"), width, salt)
    )
    return (
        keyed.join(F.broadcast(sketch), ["row_j", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
             .alias("est"))
    )


def cms_oracle_sql(source_sql: str, terms_sql: str, depth: int, width: int,
                   salt: str = "cms") -> str:
    """DuckDB replay of build + estimate + the exact count comparison the
    contract query emits: (term, est, exact) — ``est >= exact`` always.
    """
    bucket = (
        "CAST(('0x' || substring(md5('{salt}' || CAST(j.row_j AS VARCHAR)"
        " || ':' || {tok}), 1, 8)) AS BIGINT) % {width}"
    )
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                            t -> len(t) > 0)) AS tok
  FROM ({source_sql})),
fan AS (
  SELECT j.row_j, toks.tok,
         {bucket.format(salt=salt, tok='toks.tok', width=int(width))} AS bucket
  FROM toks, (SELECT unnest(range(0, {int(depth)})) AS row_j) j),
sketch AS (
  SELECT row_j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM fan GROUP BY row_j, bucket),
terms AS ({terms_sql}),
probes AS (
  SELECT terms.term, j.row_j,
         {bucket.format(salt=salt, tok='terms.term', width=int(width))} AS bucket
  FROM terms, (SELECT unnest(range(0, {int(depth)})) AS row_j) j),
est AS (
  SELECT p.term, MIN(COALESCE(s.cnt, 0)) AS est
  FROM probes p LEFT JOIN sketch s USING (row_j, bucket)
  GROUP BY p.term),
exact AS (
  SELECT tok AS term, CAST(COUNT(*) AS BIGINT) AS exact
  FROM toks GROUP BY tok)
SELECT e.term, CAST(e.est AS BIGINT) AS est,
       CAST(COALESCE(x.exact, 0) AS BIGINT) AS exact
FROM est e LEFT JOIN exact x USING (term)
ORDER BY term
"""
