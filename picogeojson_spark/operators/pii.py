"""PII redaction for web corpora: regex scrubbing as pure JVM expressions.

Training-data pipelines (BigScience/ROOTS, RefinedWeb, Dolma) scrub
personally identifiable strings — email addresses, IPv4 addresses, phone
numbers — before anything else sees the text. Here the scrub is a chain of
``regexp_replace`` expressions plus ``regexp_extract_all`` counts: zero
UDFs, zero shuffles, whole-stage codegen end to end, so at 100 TB it rides
the first scan of the corpus for free (Catalyst fuses it into whatever
stage reads the text).

Cross-engine determinism (the DuckDB oracle replays every expression):

- the regexes use ONLY the dialect subset where Java's backtracking
  (leftmost-first) and RE2's leftmost-longest agree: no alternation, no
  backreferences, greedy quantifiers over disjoint character classes;
- replacement is sequential (emails, then IPv4, then phones) in BOTH
  engines, and counts are taken on the ORIGINAL text, so engine-side
  fusion order can never change the answer;
- DuckDB's ``regexp_replace`` is first-match-only by default — the oracle
  passes the ``'g'`` flag; Spark's is always global.

The phone pattern is deliberately conservative (international ``+`` form
with 9-14 digits over separators) — recall tuning is a data decision, not
an engine one; swapping patterns changes one expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex / RE2 agreeing subset — see module docstring before editing.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9][0-9 ()-]{7,12}[0-9]\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def _count(col: Column, pat: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pat), 0)).cast("long")


def redact_pii(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """One row per document: (doc_id, n_emails, n_ips, n_phones, text_clean).

    Counts are measured on the original text; ``text_clean`` applies the
    three replacements in the fixed order emails -> IPv4 -> phones (the
    email pattern can span digits that would otherwise look phone-like,
    so it runs first; the order is part of the contract and the oracle).
    """
    t = F.col(text_col)
    cleaned = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN),
            IPV4_RE, IPV4_TOKEN),
        PHONE_RE, PHONE_TOKEN)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        _count(t, EMAIL_RE).alias("n_emails"),
        _count(t, IPV4_RE).alias("n_ips"),
        _count(t, PHONE_RE).alias("n_phones"),
        cleaned.alias("text_clean"),
    )


def pii_oracle_sql(source_sql: str) -> str:
    """DuckDB replay of :func:`redact_pii` over ``source_sql`` (a relation
    with doc_id/text). Kept beside the operator so query and oracle can
    never drift apart."""
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g'),
           '{IPV4_RE}', '{IPV4_TOKEN}', 'g'),
         '{PHONE_RE}', '{PHONE_TOKEN}', 'g') AS text_clean
FROM ({source_sql})
ORDER BY doc_id
"""
