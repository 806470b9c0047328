"""Bloom filter: no false negatives, python-replay bit arithmetic,
zero-shuffle probe plan."""

import hashlib

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _py_positions(key, m_bits, k):
    return [int(hashlib.md5(("b%d:%s" % (i, key)).encode()).hexdigest()[:8],
                16) % m_bits for i in range(k)]


def _py_hit(key, words, m_bits, k):
    uwords = [w & 0xFFFFFFFFFFFFFFFF for w in words]
    return int(all((uwords[p // 64] >> (p % 64)) & 1
                   for p in _py_positions(key, m_bits, k)))


def test_no_false_negatives_and_replay(spark):
    from picogeojson_spark.operators.bloom import bloom_build, bloom_probe

    keys = ["alpha.com", "beta.org", "gamma.net", "delta.io", "x.y"]
    kdf = spark.createDataFrame([(x,) for x in keys], "domain string")
    words = bloom_build(kdf, "domain", m_bits=128, k=3)
    assert len(words) == 2

    probe_keys = keys + ["other-%d.com" % i for i in range(40)]
    pdf = spark.createDataFrame([(x,) for x in probe_keys], "domain string")
    got = {r.domain: r.bloom_hit
           for r in bloom_probe(pdf, "domain", words, m_bits=128, k=3)
           .collect()}
    # inserted keys always hit
    assert all(got[x] == 1 for x in keys)
    # every probe matches the pure-python replay (incl. any FPs)
    for x in probe_keys:
        assert got[x] == _py_hit(x, words, 128, 3), x


def test_bitmap_bounded_by_m_not_keys(spark):
    from picogeojson_spark.operators.bloom import bloom_build

    kdf = spark.range(500).selectExpr("cast(id as string) as domain")
    words = bloom_build(kdf, "domain", m_bits=64, k=2)
    assert len(words) == 1  # dense word table regardless of key count


def test_probe_plan_has_no_exchange_or_python(spark):
    from picogeojson_spark.operators.bloom import bloom_probe

    df = spark.range(100).selectExpr("cast(id as string) as domain")
    plan = (bloom_probe(df, "domain", [0, 0], m_bits=128, k=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_m_bits_validation(spark):
    from picogeojson_spark.operators.bloom import bloom_build, bloom_probe

    kdf = spark.createDataFrame([("a",)], "domain string")
    with pytest.raises(ValueError):
        bloom_build(kdf, "domain", m_bits=100)
    with pytest.raises(ValueError):
        bloom_probe(kdf, "domain", [0], m_bits=128)
