"""skipgram_pairs + knn_classify: hand pair sets, window bounds, walk
boundaries, vote/tie semantics, python brute replays."""

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.graph import skipgram_pairs
from picogeojson_spark.operators.knn import knn_classify

pytestmark = pytest.mark.usefixtures("spark")


def _walks(spark, rows):
    return spark.createDataFrame(rows, "walk_id long, step long, node long")


def _py_pairs(rows, window):
    from collections import Counter, defaultdict

    by = defaultdict(dict)
    for w, s, n in rows:
        by[w][s] = n
    c = Counter()
    for w, steps in by.items():
        for s, center in steps.items():
            for d in range(-window, window + 1):
                if d and (s + d) in steps:
                    c[(center, steps[s + d])] += 1
    return {k + (v,) for k, v in c.items()}


def test_skipgram_single_walk_hand(spark):
    rows = [(1, 0, 10), (1, 1, 11), (1, 2, 12)]
    got = {tuple(r) for r in
           skipgram_pairs(_walks(spark, rows), window=1).collect()}
    assert got == {(10, 11, 1), (11, 10, 1), (11, 12, 1), (12, 11, 1)}


def test_skipgram_window_two_and_boundaries(spark):
    rows = [(1, s, 100 + s) for s in range(4)]
    got = {tuple(r) for r in
           skipgram_pairs(_walks(spark, rows), window=2).collect()}
    assert got == _py_pairs(rows, 2)
    # ends only pair inward: (100,102) present, (100,103) absent
    assert (100, 102, 1) in got and not any(
        c == 100 and x == 103 for c, x, _ in got)


def test_skipgram_counts_aggregate_across_walks(spark):
    rows = [(1, 0, 5), (1, 1, 6), (2, 0, 5), (2, 1, 6)]
    got = {tuple(r) for r in
           skipgram_pairs(_walks(spark, rows), window=1).collect()}
    assert got == {(5, 6, 2), (6, 5, 2)}


def test_skipgram_revisit_same_node(spark):
    # walk revisits node 7: pairs (7,8) twice from different steps
    rows = [(1, 0, 7), (1, 1, 8), (1, 2, 7)]
    got = {tuple(r) for r in
           skipgram_pairs(_walks(spark, rows), window=1).collect()}
    assert got == {(7, 8, 2), (8, 7, 2)}
    with pytest.raises(ValueError):
        skipgram_pairs(_walks(spark, rows), window=0)


def _q(spark, rows):
    return spark.createDataFrame(rows, "query_id long, lon double, lat double")


def _c(spark, rows):
    return spark.createDataFrame(
        rows, "neighbor_id long, lon double, lat double, label string")


def test_knn_classify_majority(spark):
    q = _q(spark, [(1, 0.25, 0.25)])
    c = _c(spark, [(10, 0.75, 0.25, "a"), (11, 1.25, 0.25, "a"),
                   (12, 1.75, 0.25, "b"), (13, 40.0, 40.0, "b")])
    r = knn_classify(q, c, k=3, level=4).collect()[0]
    assert (r.label, r.votes) == ("a", 2)


def test_knn_classify_tie_goes_to_nearer_class(spark):
    q = _q(spark, [(1, 0.25, 0.25)])
    c = _c(spark, [(10, 0.75, 0.25, "b"), (11, 1.25, 0.25, "a"),
                   (12, 1.75, 0.25, "a"), (13, 2.25, 0.25, "b")])
    # votes 2-2; class b holds rank 1 -> b wins
    r = knn_classify(q, c, k=4, level=4).collect()[0]
    assert r.label == "b" and r.nearest_rank == 1


def test_knn_classify_full_tie_alphabetical(spark):
    q = _q(spark, [(1, 0.25, 0.25)])
    # equidistant pair (symmetric offsets), one of each class:
    # ranks 1,2 decided by neighbor_id; class of rank1 = "z"
    c = _c(spark, [(10, 0.75, 0.25, "z"), (11, -0.25, 0.25, "y")])
    r = knn_classify(q, c, k=2, level=4).collect()[0]
    # votes tie 1-1, nearest_rank tie impossible (ranks distinct):
    # rank1 is neighbor 10 ("z") by id tiebreak inside knn_join
    assert r.label == "z" and r.nearest_rank == 1
