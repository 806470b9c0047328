"""rendezvous_assign: python md5 replay, minimal-disruption guarantee on
shard removal AND addition, rough balance, pure-codegen plan."""

import hashlib

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.sampling import rendezvous_assign

pytestmark = pytest.mark.usefixtures("spark")


def _py_assign(key, shards, salt="hrw"):
    def score(s):
        h = hashlib.md5(f"{salt}:{s}:{key}".encode()).hexdigest()
        return (int(h[:15], 16), s)
    return max(score(s) for s in shards)[1]


def _keys_df(spark, n=400):
    return spark.range(1, n + 1).select(F.col("id").alias("doc_id"))


def test_matches_python_md5_replay(spark):
    shards = ["s-a", "s-b", "s-c", "s-d"]
    got = {r.doc_id: r.shard for r in
           rendezvous_assign(_keys_df(spark), shards).collect()}
    for k, s in got.items():
        assert s == _py_assign(k, shards)


def test_removal_remaps_only_that_shard(spark):
    shards = ["s-a", "s-b", "s-c", "s-d"]
    full = {r.doc_id: r.shard for r in
            rendezvous_assign(_keys_df(spark), shards).collect()}
    without_c = {r.doc_id: r.shard for r in
                 rendezvous_assign(_keys_df(spark),
                                   [s for s in shards
                                    if s != "s-c"]).collect()}
    for k in full:
        if full[k] != "s-c":
            assert without_c[k] == full[k]
        else:
            assert without_c[k] != "s-c"


def test_addition_steals_only_new_shards_keys(spark):
    shards = ["s-a", "s-b", "s-c"]
    base = {r.doc_id: r.shard for r in
            rendezvous_assign(_keys_df(spark), shards).collect()}
    grown = {r.doc_id: r.shard for r in
             rendezvous_assign(_keys_df(spark),
                               shards + ["s-d"]).collect()}
    moved = {k for k in base if grown[k] != base[k]}
    assert moved and all(grown[k] == "s-d" for k in moved)


def test_roughly_balanced(spark):
    shards = [f"s-{i}" for i in range(4)]
    counts = {r.shard: r["count"] for r in
              rendezvous_assign(_keys_df(spark, 2000), shards)
              .groupBy("shard").count().collect()}
    assert set(counts) == set(shards)
    assert all(2000 / 4 * 0.7 < c < 2000 / 4 * 1.3
               for c in counts.values())


def test_pure_codegen_no_shuffle(spark):
    df = rendezvous_assign(_keys_df(spark), ["a", "b", "c"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_empty_shards_raises(spark):
    with pytest.raises(ValueError):
        rendezvous_assign(_keys_df(spark), [])
