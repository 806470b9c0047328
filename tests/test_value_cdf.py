"""value_cdf: hand cases + brute differential."""

from picogeojson_spark.operators.stats import value_cdf

SCHEMA = "key string, v long"


def _run(spark, rows):
    got = value_cdf(spark.createDataFrame(rows, SCHEMA)).collect()
    return {(r.key, r.v): (r.cnt, r.cum, r.n, r.cdf_ppm) for r in got}


def _brute(rows):
    from collections import Counter, defaultdict

    by = defaultdict(Counter)
    for k, v in rows:
        by[k][v] += 1
    out = {}
    for k, c in by.items():
        n = sum(c.values())
        cum = 0
        for v in sorted(c):
            cum += c[v]
            out[(k, v)] = (c[v], cum, n, 10**6 * cum // n)
    return out


def test_hand_case_with_ties(spark):
    rows = [("a", 10), ("a", 10), ("a", 20), ("a", 30)]
    got = _run(spark, rows)
    assert got[("a", 10)] == (2, 2, 4, 500000)
    assert got[("a", 20)] == (1, 3, 4, 750000)
    assert got[("a", 30)] == (1, 4, 4, 1000000)


def test_keys_independent_and_negative_values(spark):
    rows = [("a", -5), ("a", 5), ("b", 100)]
    got = _run(spark, rows)
    assert got[("a", -5)] == (1, 1, 2, 500000)
    assert got[("b", 100)] == (1, 1, 1, 1000000)


def test_brute_differential(spark):
    rows = [("k%d" % (i % 4), (i * 37) % 25 - 10) for i in range(200)]
    assert _run(spark, rows) == _brute(rows)


def test_max_value_hits_one_million_exactly(spark):
    rows = [("a", i) for i in range(7)]
    got = _run(spark, rows)
    assert got[("a", 6)][3] == 1_000_000
    assert all(got[("a", i)][3] == 10**6 * (i + 1) // 7 for i in range(7))
