"""mirror_candidates: host-pair content-overlap semantics."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


# ---------------------------------------------------------------------------
# mirror_candidates
# ---------------------------------------------------------------------------

def _mirror(spark, rows, **kw):
    from picogeojson_spark.operators.web import mirror_candidates

    df = spark.createDataFrame(rows, "host string, fp string")
    out = mirror_candidates(df, host_col="host", fp_col="fp", **kw)
    return {(r.host_a, r.host_b): r for r in out.collect()}


def test_mirror_pair_jaccard(spark):
    rows = ([("a", "f%d" % i) for i in range(4)]
            + [("b", "f%d" % i) for i in range(2)]   # shares f0,f1
            + [("b", "g0"), ("b", "g1")]
            + [("c", "z0")])
    got = _mirror(spark, rows, min_shared=2)
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    assert (r.shared, r.n_a, r.n_b) == (2, 4, 4)
    assert r.jaccard_ppm == 2 * 1000000 // 6


def test_mirror_boilerplate_fp_pruned(spark):
    # "bp" is on every host: with max_fp_hosts=2 it can't create pairs.
    rows = [(h, "bp") for h in "abc"] + \
           [("a", "x1"), ("b", "x1"), ("a", "x2"), ("b", "x2")]
    got = _mirror(spark, rows, min_shared=2, max_fp_hosts=2)
    assert set(got) == {("a", "b")}
    assert got[("a", "b")].shared == 2  # bp excluded from shared...
    assert got[("a", "b")].n_a == 3     # ...but counted in site size


def test_mirror_min_shared_filters(spark):
    rows = [("a", "f0"), ("b", "f0")]
    assert _mirror(spark, rows, min_shared=2) == {}
    got = _mirror(spark, rows, min_shared=1)
    assert got[("a", "b")].shared == 1


def test_mirror_duplicate_rows_count_once(spark):
    rows = [("a", "f0")] * 3 + [("b", "f0")] * 2 + \
           [("a", "f1"), ("b", "f1")]
    got = _mirror(spark, rows, min_shared=2)
    assert got[("a", "b")].shared == 2
    assert got[("a", "b")].n_a == 2


# ---------------------------------------------------------------------------
# crawl_schedule
# ---------------------------------------------------------------------------

def test_schedule_politeness_invariants(spark):
    from picogeojson_spark.operators.web import crawl_schedule

    rows = [(i, "host%d" % (i % 7)) for i in range(70)]
    df = spark.createDataFrame(rows, "url_id long, host string")
    out = crawl_schedule(df, n_workers=4).collect()
    byhost = {}
    for r in out:
        byhost.setdefault(r.host, []).append(r)
    assert len(out) == 70
    for h, rs in byhost.items():
        # one worker per host
        assert len({r.worker for r in rs}) == 1
        # one delay per host, in the synthesized range
        delays = {r.delay_ms for r in rs}
        assert len(delays) == 1 and 500 <= delays.pop() <= 2250
        # slots are (rank-1)*delay in url_id order: spaced exactly delay
        rs.sort(key=lambda r: r.url_id)
        for i, r in enumerate(rs):
            assert r.slot_ms == i * r.delay_ms


def test_schedule_host_affinity_stable_under_growth(spark):
    from picogeojson_spark.operators.web import crawl_schedule

    small = spark.createDataFrame(
        [(i, "h%d" % (i % 3)) for i in range(9)], "url_id long, host string")
    big = spark.createDataFrame(
        [(i, "h%d" % (i % 5)) for i in range(25)], "url_id long, host string")
    ws = {r.host: r.worker for r in crawl_schedule(small).collect()}
    wb = {r.host: r.worker for r in crawl_schedule(big).collect()}
    for h in ws:
        assert wb[h] == ws[h]  # new hosts never move existing ones
