"""Line-level corpus cleaning: cross-document duplicate-line removal.

The CCNet / RefinedWeb family of web-corpus pipelines removes *lines* that
repeat across many documents (navigation bars, cookie banners, footers)
before any document-level dedup runs — boilerplate lines otherwise both
inflate near-dup similarity and pollute the training stream.

Scale shape (the part that must survive 100 TB):

- lines are keyed by their **md5 digest**, not the raw string, so the
  count shuffle ships 32-char digests instead of arbitrary-length
  boilerplate lines;
- the hot-line table (lines present in >= ``min_docs`` distinct docs) is
  a tiny fraction of the corpus; the removal join is a digest equi-join
  (left_anti) that AQE is free to broadcast when the hot set is small;
- the rebuild is one groupBy(doc) of the *kept* lines — ``collect_list``
  of (pos, line) then ``array_sort`` + in-row transform, so document
  reassembly never needs a global order, only a per-doc sort of its own
  lines. No window over the corpus, no driver action.
- whitespace-only lines never participate in counting (they would all be
  "duplicates" of each other); they are always kept, preserving the
  document's blank-line structure byte-for-byte.

The per-row arithmetic (md5 keying, distinct-doc counting, ordered
reassembly) is replayed verbatim by the DuckDB oracle (`dedup_lines`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_lines(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (doc, line position): posexplode of split(text, '\\n')."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("pos", "line"),
    )


def hot_lines(docs: DataFrame, min_docs: int = 2, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Digests of lines that occur in >= ``min_docs`` DISTINCT documents.

    Distinct-doc counting (not raw occurrence counting) means a line
    repeated many times inside one document is not boilerplate by itself.
    Whitespace-only lines are excluded up front. Returns (line_h, n_docs).
    """
    lines = _doc_lines(docs, id_col, text_col)
    return (
        lines
        .filter(F.length(F.trim(F.col("line"))) > 0)
        .select("doc_id", F.md5("line").alias("line_h"))
        .groupBy("line_h")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= F.lit(int(min_docs)))
    )


def remove_duplicate_lines(docs: DataFrame, min_docs: int = 2,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Drop every line that appears in >= ``min_docs`` distinct docs.

    Returns one row per input document:
      (doc_id, n_lines, n_kept, text_clean)
    where ``text_clean`` is the surviving lines re-joined with '\\n' in
    their original order ('' when every line was boilerplate). Documents
    whose lines are ALL removed still appear (n_kept = 0).
    """
    lines = _doc_lines(docs, id_col, text_col)
    hot = hot_lines(docs, min_docs, id_col, text_col).select("line_h")
    kept = (
        lines.withColumn("line_h", F.md5("line"))
        .join(hot, "line_h", "left_anti")
    )
    # per-doc reassembly: sort this doc's own kept lines by position and
    # re-join. The transform lambda touches only its own lambda var (x.line)
    # -- safe from the interpreted-HOF outer-array trap (see CLAUDE.md).
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
        ).alias("text_clean"),
    )
    # total line count is a narrow expression on the doc row itself — no
    # explode, no shuffle (split arrays are never materialized corpus-wide)
    totals = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), "\n", -1)).cast("long")
        .alias("n_lines"),
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )
