"""Unit tests: fixed-size token chunking and PII redaction."""

import pytest

from picogeojson_spark.operators.chunking import chunk_documents
from picogeojson_spark.operators.pii import redact_pii


# ---------------------------------------------------------------- chunking

@pytest.fixture(scope="module")
def chunk_docs(spark):
    rows = [
        (1, "a b c d e f g"),              # 7 tokens -> 3+3+1 at size 3
        (2, "  x   y\t z \n w  "),         # messy whitespace -> 4 tokens
        (3, ""),                           # no tokens -> no rows
        (4, "   \t  "),                    # whitespace only -> no rows
        (5, "solo"),                       # 1 token -> 1 chunk
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_sizes_and_order(spark, chunk_docs):
    out = {(r["doc_id"], r["chunk_id"]): r
           for r in chunk_documents(chunk_docs, 3).collect()}
    assert out[(1, 0)]["chunk_text"] == "a b c"
    assert out[(1, 1)]["chunk_text"] == "d e f"
    assert out[(1, 2)]["chunk_text"] == "g"
    assert out[(1, 2)]["n_tokens"] == 1
    assert out[(2, 0)]["chunk_text"] == "x y z"
    assert out[(2, 1)]["chunk_text"] == "w"
    assert out[(5, 0)]["chunk_text"] == "solo"
    # empty / whitespace-only docs contribute nothing
    assert not any(d in (3, 4) for d, _ in out)
    assert len(out) == 6


def test_chunk_concat_roundtrip(spark, chunk_docs):
    """Joining every chunk back in chunk order reproduces the normalized
    (single-space) document for every chunk size."""
    import re
    want = {r["doc_id"]: " ".join(re.split(r"\s+", r["text"].strip()))
            for r in chunk_docs.collect() if r["text"].strip()}
    for cs in (1, 2, 5, 100):
        got = {}
        for r in sorted(chunk_documents(chunk_docs, cs).collect(),
                        key=lambda r: (r["doc_id"], r["chunk_id"])):
            got[r["doc_id"]] = (got.get(r["doc_id"], "") + " "
                                + r["chunk_text"]).strip()
        assert got == want, cs


def test_chunk_invalid_size(chunk_docs):
    with pytest.raises(ValueError):
        chunk_documents(chunk_docs, 0)


def test_chunk_plan_single_shuffle(spark, chunk_docs):
    """HashPartitioning(doc_id-side keys) must cover the groupBy — exactly
    one Exchange in the plan, and no Window."""
    plan = chunk_documents(chunk_docs, 3)._jdf.queryExecution() \
        .executedPlan().toString()
    # AQE dumps initial+current plans; count on the deduped half
    half = plan.split("== Initial Plan ==")[0]
    assert half.count("Exchange") <= 1, half
    assert "Window" not in half


# ---------------------------------------------------------------- pii

@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (1, "write to alice.smith+x@sub.example.org or bob@ex.io soon"),
        (2, "server 192.168.0.1 and 10.0.0.255 replied"),
        (3, "call +4915001234567 now"),
        (4, "clean document with no pii at all"),
        (5, "mixed joe@a.bc from 8.8.8.8 dial +12125550123 end"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts_and_tokens(spark, pii_docs):
    out = {r["doc_id"]: r for r in redact_pii(pii_docs).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (2, 0, 0)
    assert out[1]["text_clean"] == "write to <EMAIL> or <EMAIL> soon"
    assert out[2]["n_ips"] == 2
    assert out[2]["text_clean"] == "server <IP> and <IP> replied"
    assert out[3]["n_phones"] == 1
    assert out[3]["text_clean"] == "call <PHONE> now"
    assert out[4]["text_clean"] == out[4]["text_clean"] == \
        "clean document with no pii at all"
    assert (out[5]["n_emails"], out[5]["n_ips"], out[5]["n_phones"]) == (1, 1, 1)
    assert out[5]["text_clean"] == "mixed <EMAIL> from <IP> dial <PHONE> end"
    assert out[6]["text_clean"] == "" and out[6]["n_emails"] == 0


def test_pii_matches_duckdb_replay(spark, pii_docs):
    """The operator and its published oracle SQL agree row for row."""
    import duckdb
    from picogeojson_spark.operators.pii import pii_oracle_sql

    pdf = pii_docs.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(
        pii_oracle_sql("SELECT doc_id, text FROM docs")).df()
    got = redact_pii(pii_docs).orderBy("doc_id").toPandas()
    assert list(got["text_clean"]) == list(want["text_clean"])
    for c in ("n_emails", "n_ips", "n_phones"):
        assert list(got[c]) == list(want[c]), c


def test_pii_plan_no_shuffle_no_python(spark, pii_docs):
    plan = redact_pii(pii_docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


# ------------------------------------------------------------ link graph

def test_extract_links_and_domain_graph(spark):
    from picogeojson_spark.operators.web import (domain_link_graph,
                                                 extract_links)

    rows = [
        # two double-quoted links (one duplicated), one single-quoted (ignored)
        (1, "https://a.com/x",
         '<a href="https://b.com/1">x</a> <a href="https://b.com/1">y</a>'
         " <a href='https://c.com/skip'>z</a>"),
        # intra-domain link (www + port variations of the same domain)
        (2, "https://www.a.com/y", '<a href="http://a.com:8080/z">s</a>'),
        # no links at all
        (3, "https://d.org/", "plain text"),
        # link to a bare host (no dot -> domain is the host itself)
        (4, "https://e.io/", '<a href="http://localhost/admin">l</a>'),
        # relative / empty / malformed hrefs: extracted but excluded from
        # the domain graph (no resolvable absolute domain)
        (5, "https://f.com/",
         '<a href="/about">r</a> <a href="">e</a> <a href="not a url">j</a>'),
    ]
    pages = spark.createDataFrame(rows, "doc_id long, url string, html string")

    links = extract_links(pages).collect()
    assert len(links) == 7  # +3 malformed/relative (extracted, graph-excluded)
    assert sum(r["dst_url"] == "https://b.com/1" for r in links) == 2

    g = {(r["src_domain"], r["dst_domain"]): r["n_links"]
         for r in domain_link_graph(pages).collect()}
    assert g == {("a.com", "b.com"): 2, ("e.io", "localhost"): 1}


def test_extract_links_stream_equals_batch(spark, tmp_path):
    """extract_links is stateless scan-stage work — it runs unchanged on a
    streaming DataFrame in append mode (the Common-Crawl shape: link
    extraction riding the crawl ingest stream)."""
    from picogeojson_spark.operators.web import extract_links

    d = str(tmp_path / "link_pages")
    rows = [(f"https://s{i % 9}.com/p{i}",
             f'<a href="https://t{i % 4}.org/x{i}">x</a>'
             + ('<a href="https://u.net/y">y</a>' if i % 3 == 0 else ""))
            for i in range(120)]
    batch = spark.createDataFrame(rows, "url string, html string")
    batch.write.mode("overwrite").parquet(d)

    stream = spark.readStream.schema("url string, html string").parquet(d)
    q = (
        extract_links(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("links_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = sorted(map(tuple, spark.sql(
        "select src_url, dst_url from links_stream_t").collect()))
    want = sorted(map(tuple,
                      extract_links(spark.read.parquet(d)).collect()))
    assert got == want and len(got) == 160
