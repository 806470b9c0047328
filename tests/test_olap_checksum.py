"""cube_rollup + shard_checksums: hand cases, invariance properties."""

import hashlib

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.checksum import CHECKSUM_MOD, \
    shard_checksums
from picogeojson_spark.operators.olap import cube_rollup


# ---------------------------------------------------------------- cube

CUBE_SCHEMA = "cat string, day long, v long"
CUBE_ROWS = [("a", 1, 10), ("a", 1, 5), ("a", 2, 1), ("b", 1, 100)]


def _cube(spark):
    df = spark.createDataFrame(CUBE_ROWS, CUBE_SCHEMA)
    out = cube_rollup(
        df, ["cat", "day"],
        {"n": F.count("*").cast("long"),
         "sum_v": F.sum("v").cast("long")},
    ).collect()
    return {(r.cat, r.day, r.gflags): (r.n, r.sum_v) for r in out}


def test_cube_all_grouping_sets(spark):
    got = _cube(spark)
    assert got[("a", 1, 0)] == (2, 15)          # fully keyed
    assert got[("a", -1, 1)] == (3, 16)         # day rolled up
    assert got[("(all)", 1, 2)] == (3, 115)     # cat rolled up
    assert got[("(all)", -1, 3)] == (4, 116)    # grand total
    assert len(got) == 3 + 2 + 2 + 1            # 2^2 grouping sets


def test_cube_empty_dims_raise(spark):
    with pytest.raises(ValueError):
        cube_rollup(spark.range(1), [], {"n": F.count("*")})


# ------------------------------------------------------------ checksum

CS_SCHEMA = "k long, name string, amt long"
CS_ROWS = [(1, "x", 10), (2, "y", 20), (3, None, 30), (18, "x", 10)]


def _brute(rows, n_shards=16):
    out = {}
    for k, name, amt in rows:
        s = "|".join("\\N" if c is None else str(c)
                     for c in (k, name, amt))
        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        sh = k % n_shards
        n, tot = out.get(sh, (0, 0))
        out[sh] = (n + 1, tot + h)
    return {sh: (n, tot % CHECKSUM_MOD) for sh, (n, tot) in out.items()}


def _run(spark, rows):
    df = spark.createDataFrame(rows, CS_SCHEMA)
    got = shard_checksums(df, ["k", "name", "amt"], F.col("k")).collect()
    return {r.shard: (r.n_rows, r.checksum) for r in got}


def test_checksum_matches_python_md5(spark):
    assert _run(spark, CS_ROWS) == _brute(CS_ROWS)


def test_checksum_order_and_partitioning_invariant(spark):
    a = _run(spark, CS_ROWS)
    df = spark.createDataFrame(list(reversed(CS_ROWS)), CS_SCHEMA) \
        .repartition(7)
    got = shard_checksums(df, ["k", "name", "amt"], F.col("k")).collect()
    assert {r.shard: (r.n_rows, r.checksum) for r in got} == a


def test_checksum_null_sentinel_no_collision(spark):
    a = _run(spark, [(1, None, 10)])
    b = _run(spark, [(1, "", 10)])
    assert a != b


def test_checksum_detects_single_row_change_and_dups(spark):
    base = _run(spark, CS_ROWS)
    changed = _run(spark, [(1, "x", 11)] + CS_ROWS[1:])
    assert base[1] != changed[1]
    assert {s for s in base if base[s] != changed.get(s)} == {1}
    duped = _run(spark, CS_ROWS + [(2, "y", 20)])
    assert base[2] != duped[2]
