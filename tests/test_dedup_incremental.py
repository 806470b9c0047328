"""Unit tests: incremental near-dup flagging (increment vs corpus)."""


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy dog again and again"


def test_dedup_against_flags_known_dup(spark):
    from picogeojson_spark.operators.dedup import dedup_against

    existing = _docs(spark, [(2, BASE), (4, "completely different words "
                                            "about solar panel efficiency")])
    incoming = _docs(spark, [(1, BASE), (3, "unrelated fresh content about "
                                            "mountain weather patterns")])
    got = {r["doc_id"]: r["dup_of"]
           for r in dedup_against(existing, incoming).collect()}
    assert got == {1: 2}


def test_dedup_against_picks_smallest_existing_id(spark):
    from picogeojson_spark.operators.dedup import dedup_against

    existing = _docs(spark, [(10, BASE), (6, BASE)])
    incoming = _docs(spark, [(7, BASE)])
    rows = dedup_against(existing, incoming).collect()
    assert len(rows) == 1 and rows[0]["dup_of"] == 6


def test_dedup_against_never_self_pairs_corpus(spark):
    """Two identical docs BOTH in the corpus must not appear in the
    output (the corpus is never self-joined)."""
    from picogeojson_spark.operators.dedup import dedup_against

    existing = _docs(spark, [(2, BASE), (4, BASE)])
    incoming = _docs(spark, [(1, "totally novel text with nothing shared "
                                 "across any shingle boundary here")])
    assert dedup_against(existing, incoming).count() == 0


def test_dedup_against_matches_entry_oracle(spark):
    """The contract query's parity split vs its DuckDB oracle on sf0.001."""
    import duckdb

    import __spark_entry__ as entry

    got = [tuple(r) for r in
           entry.queries()["dedup_incremental"](
               spark, "/root/testdata/sf0.001").collect()]
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'")
    want = [tuple(r) for r in con.execute(
        entry.oracle_sql()["dedup_incremental"]).fetchall()]
    assert got == want and len(got) > 0
