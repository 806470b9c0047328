"""gini_concentration: hand cases + brute differential."""

from picogeojson_spark.operators.stats import gini_concentration

SCHEMA = "key string, v long"


def _run(spark, rows):
    got = gini_concentration(
        spark.createDataFrame(rows, SCHEMA)).collect()
    return {r.key: (r.n, r.sum_v, r.gini_ppm) for r in got}


def _brute(rows):
    from collections import defaultdict

    by = defaultdict(list)
    for k, v in rows:
        by[k].append(v)
    out = {}
    for k, vs in by.items():
        vs.sort()
        n, s = len(vs), sum(vs)
        if s == 0:
            out[k] = (n, 0, None)
            continue
        t = sum((i + 1) * x for i, x in enumerate(vs))
        out[k] = (n, s, 10**6 * (2 * t - (n + 1) * s) // (n * s))
    return out


def test_equality_and_total_concentration(spark):
    rows = ([("eq", 5)] * 4
            + [("conc", 0)] * 3 + [("conc", 100)])
    got = _run(spark, rows)
    assert got["eq"] == (4, 20, 0)
    # one holder of everything among 4: G = (n-1)/n = 0.75
    assert got["conc"] == (4, 100, 750_000)
    assert got == _brute(rows)


def test_all_zero_values_null(spark):
    assert _run(spark, [("z", 0), ("z", 0)])["z"] == (2, 0, None)


def test_tie_expansion_matches_per_row_ranks(spark):
    rows = [("k", v) for v in [1, 1, 1, 2, 2, 7, 7, 7, 7, 30]]
    assert _run(spark, rows) == _brute(rows)


def test_brute_differential(spark):
    rows = [("k%d" % (i % 5), (i * i * 37) % 97) for i in range(300)]
    assert _run(spark, rows) == _brute(rows)
