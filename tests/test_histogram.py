"""equi_width_histogram: exact integer binning on crafted values."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, rows, n_bins=4):
    from picogeojson_spark.operators.profile import equi_width_histogram

    df = spark.createDataFrame(rows, "key string, v long")
    out = equi_width_histogram(df, n_bins=n_bins).collect()
    return {(r.key, r.bin): r for r in out}


def test_uniform_range_splits_evenly(spark):
    # values 0..7, 4 bins of width 2
    rows = [("k", v) for v in range(8)]
    got = _run(spark, rows, n_bins=4)
    assert {b for _, b in got} == {0, 1, 2, 3}
    for b in range(4):
        r = got[("k", b)]
        assert (r.bin_lo, r.bin_hi, r.cnt) == (2 * b, 2 * b + 1, 2)


def test_every_value_in_exactly_one_bin(spark):
    rows = [("k", v) for v in range(-5, 17)]  # negative range too
    got = _run(spark, rows, n_bins=3)
    assert sum(r.cnt for r in got.values()) == 22
    # bins tile the closed range without gap or overlap
    bins = sorted(got.values(), key=lambda r: r.bin)
    assert bins[0].bin_lo == -5 and bins[-1].bin_hi == 16
    for a, b in zip(bins, bins[1:]):
        assert b.bin_lo == a.bin_hi + 1


def test_max_value_clamps_to_last_bin(spark):
    rows = [("k", 0), ("k", 10)]
    got = _run(spark, rows, n_bins=4)
    assert got[("k", 3)].cnt == 1
    assert got[("k", 3)].bin_hi == 10


def test_single_value_single_bin(spark):
    got = _run(spark, [("k", 7)] * 3, n_bins=8)
    [r] = got.values()
    assert (r.bin, r.bin_lo, r.bin_hi, r.cnt) == (0, 7, 7, 3)


def test_sparse_bins_omitted(spark):
    rows = [("k", 0)] * 2 + [("k", 100)] * 3
    got = _run(spark, rows, n_bins=4)
    assert set(got) == {("k", 0), ("k", 3)}
