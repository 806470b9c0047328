"""random_walks: deterministic DeepWalk-style corpus on crafted graphs."""

import hashlib

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, pairs, walk_length=4, salt="w0"):
    from picogeojson_spark.operators.graph import random_walks

    df = spark.createDataFrame(pairs, "src long, dst long")
    out = random_walks(df, walk_length=walk_length, salt=salt).collect()
    walks = {}
    for r in out:
        walks.setdefault(r.walk_id, {})[r.step] = r.node
    return {w: [s[k] for k in sorted(s)] for w, s in walks.items()}


def _pick(salt, walk, step, cur, deg):
    h = hashlib.md5(
        "{}:{}:{}:{}".format(salt, walk, step, cur).encode()).hexdigest()
    return int(h[:8], 16) % deg + 1


def test_chain_degree_one_is_forced(spark):
    # 1->2->3->4: every node has exactly one successor, so the walk from 1
    # is the chain itself regardless of the hash picks.
    got = _run(spark, [(1, 2), (2, 3), (3, 4)], walk_length=3)
    assert got[1] == [1, 2, 3, 4]


def test_dead_end_stops_early(spark):
    # 2's walk ends at 3 (no out-edges): steps 0 and 1 only.
    got = _run(spark, [(2, 3)], walk_length=4)
    assert got == {2: [2, 3]}


def test_picks_replay_md5(spark):
    # node 1 has neighbors 10 < 20 < 30 (ranks 1..3); replay the md5 pick
    # chain in python and require the exact same trajectory.
    edges = [(1, 10), (1, 20), (1, 30),
             (10, 1), (20, 1), (30, 1)]
    got = _run(spark, edges, walk_length=4)
    nbrs = {1: [10, 20, 30], 10: [1], 20: [1], 30: [1]}
    for start, path in got.items():
        cur = start
        expect = [cur]
        for t in range(1, 5):
            ns = nbrs[cur]
            cur = ns[_pick("w0", start, t, cur, len(ns)) - 1]
            expect.append(cur)
        assert path == expect, start


def test_deterministic_across_runs_and_salts(spark):
    edges = [(a, b) for a in range(1, 6) for b in range(1, 6) if a != b]
    one = _run(spark, edges, walk_length=3)
    two = _run(spark, edges, walk_length=3)
    assert one == two
    other = _run(spark, edges, walk_length=3, salt="w1")
    assert other != one  # salt actually feeds the picks


def test_walk_length_validated(spark):
    from picogeojson_spark.operators.graph import random_walks

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        random_walks(df, walk_length=0)
