"""benford_deviation: exact TV distance to Benford on crafted values."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, rows):
    from picogeojson_spark.operators.profile import benford_deviation

    df = spark.createDataFrame(rows, "grp string, v long")
    return {r.grp: r for r in benford_deviation(df).collect()}


def test_perfect_benford_sample_near_zero(spark):
    # counts proportional to the ppm literals themselves (scaled down):
    # observed cnt_d*1e6 == ben_d * n only if counts ARE the literals.
    from picogeojson_spark.operators.profile import BENFORD_PPM

    rows = []
    for d, p in enumerate(BENFORD_PPM, start=1):
        rows += [("g", d * 10)] * p  # first digit d, p copies
    r = _run(spark, rows)["g"]
    n = sum(BENFORD_PPM)  # 999995
    # dev_d = |p*1e6 - p*n| = p*(1e6-n) = 5p -> tv = 5*sum(p)/(2n)
    assert r.n == n
    assert r.tv_ppm == (5 * n) // (2 * n)  # == 2


def test_all_same_digit_max_deviation(spark):
    # everything starts with 9: tv = (sum_d!=9 ben_d*n + |1e6-45757|*n)/(2n)
    rows = [("g", 900 + i) for i in range(50)]
    r = _run(spark, rows)["g"]
    from picogeojson_spark.operators.profile import BENFORD_PPM

    dev = sum(BENFORD_PPM[:8]) + (1_000_000 - BENFORD_PPM[8])
    assert r.tv_ppm == dev // 2


def test_nonpositive_ignored(spark):
    rows = [("g", 0), ("g", -5), ("g", 123)]
    r = _run(spark, rows)["g"]
    assert r.n == 1


def test_first_digit_by_string(spark):
    # 7, 70, 7000 all count digit 7
    rows = [("g", 7), ("g", 70), ("g", 7000)]
    r = _run(spark, rows)["g"]
    from picogeojson_spark.operators.profile import BENFORD_PPM

    dev = (sum(BENFORD_PPM) - BENFORD_PPM[6]) * 3 \
        + abs(3 * 1_000_000 - BENFORD_PPM[6] * 3)
    assert r.tv_ppm == dev // 6


def test_group_isolation(spark):
    rows = [("a", 111)] * 3 + [("b", 999)] * 3
    got = _run(spark, rows)
    assert set(got) == {"a", "b"}
    assert got["a"].tv_ppm != 0 and got["b"].tv_ppm != 0
