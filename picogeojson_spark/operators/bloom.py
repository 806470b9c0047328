"""Bloom-filter membership: build a bit array from a bounded key set,
probe an unbounded corpus with pure JVM expressions.

The 100 TB shape: the FILTER side (a URL/domain blocklist, a seen-key
set, a benchmark id list) is bounded — megabytes of bits — while the
probe side is the corpus. So the bitmap is built once, collected to the
driver as ``m/64`` packed int64 words (a documented bounded collect, the
same contract as ``textstats.linear_quality``'s weight vector), embedded
as ONE array literal, and broadcast with the plan. Probing is k bit
tests — ``element_at`` + ``shiftright`` + ``&1`` — whole-stage codegen,
zero shuffles, zero UDFs, zero joins on the corpus.

Hash family: position_i(key) = int(md5("b{i}:" || key)[:8], 16) % m —
the repo's standard cross-engine md5 arithmetic, replayed bit-for-bit by
DuckDB oracles.

False positives are inherent Bloom semantics (never false negatives):
tune ``m_bits``/``k`` to the key count. The packing stays exact for any
``m_bits`` multiple of 64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pos_expr(col, i: int, m_bits: int):
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit("b%d:" % i), col)), 1, 8),
               16, 10).cast("long") % F.lit(int(m_bits))
    )


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 1 << 20,
                k: int = 5) -> list[int]:
    """Distinct bit positions of every key -> packed signed-int64 words
    (length ``m_bits // 64``). The collect is bounded by ``m_bits/8``
    bytes regardless of key count (positions are distinct-ed and the
    word table is dense)."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos_arr = F.array(*[_pos_expr(F.col(key_col), i, m_bits)
                        for i in range(k)])
    rows = (
        keys.select(F.explode(pos_arr).alias("pos"))
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        p = int(r.pos)
        words[p // 64] |= 1 << (p % 64)
    # two's-complement into signed int64 so the literals round-trip
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_probe(df: DataFrame, col: str, words: list[int],
                m_bits: int = 1 << 20, k: int = 5,
                out_col: str = "bloom_hit") -> DataFrame:
    """Append ``out_col`` (int 0/1): 1 iff all k bit positions of ``col``
    are set in the bitmap. Pure expressions over a broadcast literal."""
    if m_bits != 64 * len(words):
        raise ValueError("words length does not match m_bits")
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    hit = F.lit(True)
    for i in range(k):
        pos = _pos_expr(F.col(col), i, m_bits)
        word = F.element_at(arr, (pos / F.lit(64)).cast("int") + F.lit(1))
        # F.shiftright's python wrapper only takes an int amount; the SQL
        # function itself accepts a column — call it directly.
        bit = F.call_function(
            "shiftright", word, (pos % F.lit(64)).cast("int")
        ).bitwiseAND(F.lit(1))
        hit = hit & (bit == F.lit(1))
    return df.withColumn(out_col, hit.cast("int"))
