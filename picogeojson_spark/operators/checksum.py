"""Order-invariant content checksums for replica / migration comparison.

At 100 TB the question "do these two copies of the table hold the same
rows?" cannot be answered by sorting and diffing.  The standard answer
is an order- and partitioning-invariant checksum: hash every row
canonically, SUM the hashes per shard (addition commutes — any task
order, any partitioning, any engine gives the same sums), and compare
the tiny per-shard digest tables.  A mismatched shard localizes the
divergence to 1/n of the table for drill-down.
"""

from pyspark.sql import DataFrame, functions as F

#: Modulus for the published digest (prime, < 2^31 so the digest is a
#: plain portable BIGINT on every engine).
CHECKSUM_MOD = 2_000_000_011


def shard_checksums(df: DataFrame, cols, shard_col, n_shards: int = 16
                    ) -> DataFrame:
    """Per-shard order-invariant content checksum: rows canonicalize to
    ``'|'``-joined strings over ``cols`` (NULL -> the sentinel ``\\N`` —
    ``concat_ws`` SKIPS nulls, which would collide ('a',NULL) with
    ('a','')), hash to the first 15 hex digits of md5 (60 bits, exact
    in int64 on every engine), and SUM per shard with the sum carried
    in decimal(38,0) (overflow-free past 10^19 rows) before reducing
    mod :data:`CHECKSUM_MOD`.

    ``cols`` must already be engine-portable strings or integers —
    cast floats to scaled integers first (the repo's money-in-cents
    convention); float formatting is NOT portable.  ``shard_col`` is an
    integer column/expression; shards are ``pmod(shard_col, n_shards)``.

    Returns ``(shard, n_rows, checksum)`` — n_shards rows.  Scale
    shape: one projection + ONE map-side-combined hash aggregate; the
    exchange carries n_shards partial rows per task.  Duplicate rows
    are counted (sum, not xor): copies that differ only in duplication
    produce different digests.
    """
    row = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("\\N"))
               for c in cols])
    h = F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("long")
    return (
        df.select(
            F.pmod(shard_col.cast("long"), F.lit(int(n_shards)))
            .alias("shard"),
            h.alias("_h"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.pmod(F.sum(F.col("_h").cast("decimal(38,0)")),
                   F.lit(CHECKSUM_MOD)).cast("long").alias("checksum"),
        )
    )
