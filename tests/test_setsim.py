"""Prefix-filtered (AllPairs/PPJoin) exact set-similarity join tests.

The operator's whole claim is candidate COMPLETENESS: the prefix filter may
prune, never lose, a qualifying pair.  These tests pin that against the
brute shared-shingle plan (same contract ngram_jaccard_pairs implements),
plus the boundary cases the prefix theorem has to survive.
"""

import pytest

from picogeojson_spark.operators.dedup import (
    ngram_jaccard_pairs,
    prefix_jaccard_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    path = "/root/testdata/sf0.001/documents.parquet"
    return spark.read.parquet(path).select("doc_id", "text")


def _rows(df):
    return sorted(
        (r.doc_a, r.doc_b, r.inter_sz, r.union_sz) for r in df.collect()
    )


def test_prefix_equals_brute_on_corpus(spark, docs):
    """Output identical to the brute all-pairs plan at t=4/5 (and the brute
    plan itself is oracle-verified in the gate)."""
    brute = ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    fast = prefix_jaccard_pairs(docs, n=3, t_num=4, t_den=5)
    assert _rows(fast) == _rows(brute)


def test_prefix_equals_brute_low_threshold(spark, docs):
    """t=1/2 makes prefixes half of each doc — a different pruning regime."""
    brute = ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    fast = prefix_jaccard_pairs(docs, n=3, t_num=1, t_den=2)
    assert _rows(fast) == _rows(brute)


def test_exact_boundary_pair(spark):
    """A pair sitting EXACTLY on the threshold must be kept (inter*den ==
    num*union) — the float formulation 0.8*union can get this wrong, the
    integer rational one cannot."""
    # 1-gram sets: A={a,b,c,d,e,f,g,h,k}, B={a,b,c,d,e,f,g,h,j}:
    # inter=8, union=10, J=0.8 exactly.
    rows = [
        (1, "a b c d e f g h k"),
        (2, "a b c d e f g h j"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = _rows(prefix_jaccard_pairs(df, n=1, t_num=4, t_den=5))
    assert out == [(1, 2, 8, 10)]


def test_disjoint_prefixes_pair_below_threshold_dropped(spark):
    """A pair far below t produces no row even though it shares tokens."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a q r s t u v w")],
        ["doc_id", "text"],
    )
    assert _rows(prefix_jaccard_pairs(df, n=1, t_num=4, t_den=5)) == []


def test_identical_docs_pair(spark):
    df = spark.createDataFrame(
        [(7, "x y z w"), (9, "x y z w")], ["doc_id", "text"]
    )
    assert _rows(prefix_jaccard_pairs(df, n=1, t_num=1, t_den=1)) == [
        (7, 9, 4, 4)
    ]


def test_plan_has_no_cross_join(spark, docs):
    plan = prefix_jaccard_pairs(docs, n=3, t_num=4, t_den=5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
