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
