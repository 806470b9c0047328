"""markov_stationary: integer power iteration on crafted chains."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, trans, rounds=6):
    from picogeojson_spark.operators.forecast import markov_stationary

    df = spark.createDataFrame(trans, "prev string, next string, n long")
    out = markov_stationary(df, rounds=rounds).collect()
    return {r.state: r for r in out}


def test_two_state_symmetric_settles_uniform(spark):
    got = _run(spark, [("a", "b", 5), ("b", "a", 5)])
    assert got["a"].p_ppm == got["b"].p_ppm == 500_000


def test_absorbing_sink_collects_all_mass(spark):
    # a -> b always; b has no outgoing edges (sink holds mass)
    got = _run(spark, [("a", "b", 3)], rounds=8)
    assert got["b"].mass == 10 ** 12
    assert got["a"].mass == 0


def test_python_replay_exact(spark):
    # asymmetric 3-state chain; replay the integer recurrence exactly
    trans = [("a", "a", 6), ("a", "b", 2), ("b", "a", 1),
             ("b", "c", 3), ("c", "a", 4)]
    got = _run(spark, trans, rounds=4)

    states = sorted({p for p, _, _ in trans}
                    | {q for _, q, _ in trans})
    row = {}
    for p, q, n in trans:
        row[p] = row.get(p, 0) + n
    mass = {s: 10 ** 12 // len(states) for s in states}
    for _ in range(4):
        nxt = {s: 0 for s in states}
        for p, q, n in trans:
            nxt[q] += mass[p] * n // row[p]
        for s in states:
            if s not in row:          # sink holds
                nxt[s] += mass[s]
        mass = nxt
    for s in states:
        assert got[s].mass == mass[s], s


def test_rounds_validated(spark):
    from picogeojson_spark.operators.forecast import markov_stationary

    df = spark.createDataFrame([("a", "b", 1)],
                               "prev string, next string, n long")
    with pytest.raises(ValueError):
        markov_stationary(df, rounds=0)
