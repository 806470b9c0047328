"""Unit tests: persisted inverted text index (build once, pruned query)."""

import pytest


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "the five boxing wizards jump quickly"),
        (4, "quick quick quick brown wizards"),
        (5, "sphinx of black quartz judge my vow"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_indexed_equals_adhoc(spark, corpus, tmp_path_factory):
    """The persisted-index query path must reproduce the ad-hoc operator
    row for row (same shared scoring arithmetic)."""
    from picogeojson_spark.operators.retrieval import bm25_topk
    from picogeojson_spark.operators.text_index import (
        bm25_query_indexed,
        build_text_index,
    )

    path = str(tmp_path_factory.mktemp("tidx"))
    build_text_index(corpus, path, n_buckets=16)
    terms = ["quick", "wizards", "dog"]
    want = [tuple(r) for r in bm25_topk(corpus, terms, k=5).collect()]
    got = [tuple(r) for r in
           bm25_query_indexed(spark, path, terms, k=5,
                              n_buckets=16).collect()]
    assert got == want and got


def test_index_query_prunes_partitions(spark, corpus, tmp_path_factory):
    """The bucket filter must reach the scan as a PARTITION filter: the
    postings read lists only the query terms' bucket directories."""
    from picogeojson_spark.operators.text_index import (
        bm25_query_indexed,
        build_text_index,
    )

    path = str(tmp_path_factory.mktemp("tidx2"))
    build_text_index(corpus, path, n_buckets=16)
    df = bm25_query_indexed(spark, path, ["sphinx"], k=3, n_buckets=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan[:2000]
    # exactly one term -> exactly one bucket directory survives pruning
    scans = re.search(r"partition count: (\d+)", plan)
    if scans:  # format varies by Spark version; assert when present
        assert int(scans.group(1)) == 1, plan[:2000]


def test_index_empty_terms_raises(spark, corpus, tmp_path_factory):
    from picogeojson_spark.operators.text_index import (
        bm25_query_indexed,
        build_text_index,
    )

    path = str(tmp_path_factory.mktemp("tidx3"))
    build_text_index(corpus, path, n_buckets=4)
    with pytest.raises(ValueError):
        bm25_query_indexed(spark, path, [], k=3, n_buckets=4)
