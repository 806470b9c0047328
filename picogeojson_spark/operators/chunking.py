"""Fixed-size token chunking: split documents into training-window pieces.

Context-window preparation cuts each document's token stream into
consecutive chunks of ``chunk_size`` tokens (the last chunk may be short).
This is per-document work, so the tempting formulation is fully in-row:

    transform(sequence(0, n_chunks-1), i -> slice(words, i*cs+1, cs))

That formulation is a trap in Spark: higher-order-function lambdas
evaluate INTERPRETED, and CollapseProject inlines the ``split(text)``
alias into the lambda, so ``slice(words, ...)`` re-runs the regex split
once per chunk — O(tokens * chunks) per document (see CLAUDE.md, the
minhash shingle incident). The scalable shape is the same one line-dedup
uses: posexplode tokens once, shuffle (doc_id, chunk) keyed rows, and
reassemble each chunk with an in-row sort — one linear pass, ONE hash
shuffle (HashPartitioning(doc_id) already clusters the (doc_id, chunk)
groups), no window over the corpus, no Python.

Empty tokens are dropped BEFORE positions are assigned, in-row, via
``filter(split(...), x -> length(x) > 0)`` — a HOF whose lambda touches
only its own lambda variable, which is the safe side of the interpreted-
HOF line: the split input is evaluated once per row, never per element.
``posexplode`` of the filtered array then yields compact positions
directly, so no rank window is needed at all.

The DuckDB oracle (`chunk_documents` contract query) replays the explode
and reassembly verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(docs: DataFrame, chunk_size: int,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """One row per (document, chunk): (doc_id, chunk_id, n_tokens, chunk_text).

    Tokens are the whitespace-split words of ``text_col`` (empty tokens
    from leading/trailing/repeated whitespace are dropped). ``chunk_id``
    counts from 0 in token order; ``chunk_text`` re-joins the chunk's
    tokens with single spaces. Documents with no tokens produce no rows.
    """
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(
                F.split(F.col(text_col), r"\s+", -1),
                lambda x: F.length(x) > 0,
            )
        ).alias("pos", "tok"),
    )
    return (
        toks.withColumn(
            "chunk_id",
            (F.col("pos") / F.lit(int(chunk_size))).cast("long"),
        )
        .groupBy("doc_id", "chunk_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
            ).alias("chunk_text"),
        )
    )


def chunking_oracle_sql(source_sql: str, chunk_size: int) -> str:
    """DuckDB replay of :func:`chunk_documents` over a doc_id/text relation."""
    return f"""
WITH toks AS (
  SELECT doc_id, s.i AS raw_pos, t.w[s.i] AS tok
  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS w
        FROM ({source_sql})) t,
       LATERAL (SELECT unnest(range(1, len(t.w) + 1)) AS i) s),
pos AS (
  SELECT doc_id, tok,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY raw_pos) - 1 AS pos
  FROM toks WHERE len(tok) > 0)
SELECT doc_id,
       CAST(pos // {int(chunk_size)} AS BIGINT) AS chunk_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       string_agg(tok, ' ' ORDER BY pos) AS chunk_text
FROM pos
GROUP BY doc_id, pos // {int(chunk_size)}
ORDER BY doc_id, chunk_id
"""
