"""segment_crossings: exact proper-crossing semantics + dedup + guard."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")

_M = 1_000_000  # micro-degrees per degree


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, seg_id long, ax long, ay long, bx long, by long")


def _run(spark, rows, **kw):
    from picogeojson_spark.operators.segjoin import segment_crossings

    out = segment_crossings(_df(spark, rows), **kw).collect()
    return {(r.doc_a, r.doc_b): r.n_crossings for r in out}


def test_proper_cross_and_exclusions(spark):
    rows = [
        # doc 1: X-crossing pair with doc 2
        (1, 1, 0, 0, 2 * _M, 2 * _M),
        (2, 1, 0, 2 * _M, 2 * _M, 0),
        # doc 3: endpoint TOUCHES doc 1's segment (excluded: not proper)
        (3, 1, 1 * _M, 1 * _M, 3 * _M, 1 * _M),
        # doc 4: collinear overlap with doc 1 (excluded)
        (4, 1, 0, 0, 1 * _M, 1 * _M),
        # doc 5: disjoint far away
        (5, 1, 50 * _M, 50 * _M, 51 * _M, 50 * _M),
    ]
    got = _run(spark, rows, cell_udeg=10 * _M)
    # doc3's endpoint lies ON doc1/doc2 (touch, not proper) and doc4 is
    # collinear with doc1 -- all excluded; only the X-cross survives.
    assert got == {(1, 2): 1}


def _py_proper(s, t):
    def cross(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (qx - ox) * (py - oy)

    d1 = cross(s[0], s[1], s[2], s[3], t[0], t[1])
    d2 = cross(s[0], s[1], s[2], s[3], t[2], t[3])
    d3 = cross(t[0], t[1], t[2], t[3], s[0], s[1])
    d4 = cross(t[0], t[1], t[2], t[3], s[2], s[3])
    return ((d1 > 0 > d2) or (d1 < 0 < d2)) and \
           ((d3 > 0 > d4) or (d3 < 0 < d4))


def test_brute_differential(spark):
    # deterministic short segments in a 20-degree box; includes verticals
    rows = []
    for i in range(40):
        ax = ((i * 13) % 20) * _M
        ay = ((i * 7) % 20) * _M
        bx = ax + (((i * 5) % 9) - 4) * _M
        by = ay + (((i * 11) % 9) - 4) * _M
        if (ax, ay) != (bx, by):
            rows.append((i, 0, ax, ay, bx, by))
    got = _run(spark, rows, cell_udeg=5 * _M)
    want = {}
    for s in rows:
        for t in rows:
            if s[0] < t[0] and _py_proper(s[2:], t[2:]):
                k = (s[0], t[0])
                want[k] = want.get(k, 0) + 1
    assert got == want


def test_pair_spanning_many_cells_counted_once(spark):
    # both segments span 4+ cells and cross once in the middle
    rows = [
        (1, 1, 0, 0, 40 * _M, 40 * _M),
        (2, 1, 0, 40 * _M, 40 * _M, 0),
    ]
    got = _run(spark, rows, cell_udeg=10 * _M)
    assert got == {(1, 2): 1}


def test_same_doc_pairs_excluded(spark):
    rows = [
        (1, 1, 0, 0, 2 * _M, 2 * _M),
        (1, 2, 0, 2 * _M, 2 * _M, 0),
    ]
    assert _run(spark, rows, cell_udeg=10 * _M) == {}


def test_max_cells_guard_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    rows = [(1, 1, -170 * _M, -80 * _M, 170 * _M, 80 * _M),
            (2, 1, -170 * _M, 80 * _M, 170 * _M, -80 * _M)]
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception),
                       match="cells"):
        _run(spark, rows, cell_udeg=1 * _M, max_cells=100)


def test_no_cartesian_in_plan(spark):
    from picogeojson_spark.operators.segjoin import segment_crossings

    df = _df(spark, [(1, 1, 0, 0, _M, _M), (2, 1, 0, _M, _M, 0)])
    plan = (segment_crossings(df, cell_udeg=10 * _M)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
