"""k_core: cascade peeling semantics on crafted graphs."""

from itertools import combinations

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, pairs, k, **kw):
    from picogeojson_spark.operators.graph import k_core

    df = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "u long, v long")
    out = k_core(df, k, **kw).collect()
    return {r.node: r.core_degree for r in out}


def test_clique_with_dangling_chain(spark):
    # K5 + a 3-link chain hanging off node 1: the chain peels one link
    # per round (multi-round cascade), K5 survives as the 2-core.
    k5 = list(combinations([1, 2, 3, 4, 5], 2))
    chain = [(1, 10), (10, 11), (11, 12)]
    got = _run(spark, k5 + chain, k=2)
    assert got == {n: 4 for n in (1, 2, 3, 4, 5)}


def test_path_graph_2core_empty(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 4)], k=2)
    assert got == {}


def test_cycle_is_its_own_2core(spark):
    cyc = [(1, 2), (2, 3), (3, 4), (4, 1)]
    got = _run(spark, cyc, k=2)
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}


def test_core_degree_is_in_core_not_original(spark):
    # K4 + extra spokes to leaf nodes: leaves peel, core degrees are the
    # K4-internal 3, not the original degree.
    k4 = list(combinations([1, 2, 3, 4], 2))
    spokes = [(1, 100), (2, 200), (3, 300)]
    got = _run(spark, k4 + spokes, k=3)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_max_rounds_raises(spark):
    # a 6-link chain at k=2 peels one link per round from each end ->
    # needs 3 rounds to empty; cap at 1 must raise, not truncate
    chain = [(i, i + 1) for i in range(7)]
    with pytest.raises(RuntimeError, match="converge"):
        _run(spark, chain, k=2, max_rounds=1)
