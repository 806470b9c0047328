"""robust_anomaly: median/MAD flags on crafted series."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, series, k=5):
    from picogeojson_spark.operators.forecast import robust_anomaly

    rows = [(key, t, v) for key, vs in series.items()
            for t, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "key string, t long, v long")
    out = robust_anomaly(df, k=k).collect()
    return {(r.key, r.t): r for r in out}


def test_single_spike_flagged(spark):
    xs = [10, 11, 9, 10, 12, 10, 100]
    got = _run(spark, {"a": xs})
    assert set(got) == {("a", 6)}
    r = got[("a", 6)]
    assert r.med == 10 and r.mad == 1 and r.v == 100


def test_masking_resistant(spark):
    # TWO huge spikes: mean/stddev rules often miss both (the spikes
    # inflate the stddev); the median/MAD rule flags both.
    xs = [10] * 10 + [500, 600]
    got = _run(spark, {"a": xs})
    assert {t for _, t in got} == {10, 11}


def test_mad_zero_fallback(spark):
    # majority-constant: MAD = 0, any nonzero deviation flags
    xs = [7, 7, 7, 7, 8]
    got = _run(spark, {"a": xs})
    assert set(got) == {("a", 4)}


def test_quiet_series_no_flags(spark):
    assert _run(spark, {"a": [10, 11, 9, 10, 12, 11, 9]}) == {}


def test_k_scales_sensitivity(spark):
    xs = [10, 12, 8, 10, 30]
    loose = _run(spark, {"a": xs}, k=20)
    tight = _run(spark, {"a": xs}, k=2)
    assert loose == {} and ("a", 4) in tight
