"""code_signals: exact symbol/digit densities on crafted docs."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, docs, **kw):
    from picogeojson_spark.operators.textstats import code_signals

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string")
    return {r.doc_id: r for r in code_signals(df, **kw).collect()}


def test_plain_prose_not_code(spark):
    r = _run(spark, ["the quick brown fox jumps over the lazy dog"])[0]
    assert r.n_sym == 0 and r.sym_ppm == 0
    assert not r.is_code


def test_code_snippet_flagged(spark):
    doc = "if (x[0] >= 1) { y = f(2); }"
    r = _run(spark, [doc])[0]
    assert r.n_sym == sum(doc.count(c) for c in ";{}()=<>[]") == 12
    assert r.is_code


def test_exact_counts(spark):
    r = _run(spark, ["a=1;b=22"])[0]
    assert (r.n_chars, r.n_sym, r.n_digit) == (8, 3, 3)
    assert r.sym_ppm == 3 * 1_000_000 // 8
    assert r.digit_ppm == 3 * 1_000_000 // 8


def test_empty_doc_zeroes(spark):
    r = _run(spark, [""])[0]
    assert (r.n_chars, r.sym_ppm, r.digit_ppm) == (0, 0, 0)
    assert not r.is_code


def test_threshold_configurable(spark):
    doc = "x = 1 and some more prose to dilute the density a bit"
    lo = _run(spark, [doc], sym_threshold_ppm=10_000)[0]
    hi = _run(spark, [doc], sym_threshold_ppm=500_000)[0]
    assert lo.is_code and not hi.is_code
