"""garbage_signals + fk_orphans: control/replacement/multibyte counts,
clean ASCII, empty docs; orphan counting, NULL keys, key-histogram
dedup, clean FK."""

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.expectations import fk_orphans
from picogeojson_spark.operators.textstats import garbage_signals

pytestmark = pytest.mark.usefixtures("spark")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_garbage_counts(spark):
    rows = [(1, "clean ascii text"),
            (2, "bad\x01\x1fhere"),
            (3, "repl �� char"),
            (4, "café résumé")]
    out = {r.doc_id: r for r in garbage_signals(_docs(spark, rows),
                                                ).collect()}
    assert out[1].control_n == 0 and not out[1].is_garbage
    assert out[1].multibyte_bytes == 0
    assert out[2].control_n == 2 and out[2].is_garbage
    assert out[3].repl_n == 2 and out[3].is_garbage
    # é is 2 utf-8 bytes: 3 extra bytes over 11 chars
    assert out[4].multibyte_bytes == 3 and out[4].n_bytes == 14


def test_garbage_tab_newline_legitimate(spark):
    out = garbage_signals(_docs(spark, [(1, "a\tb\nc\rd")])).collect()[0]
    assert out.control_n == 0 and not out.is_garbage


def test_garbage_multibyte_threshold(spark):
    # all-CJK text: high multibyte share trips the density knob
    out = garbage_signals(_docs(spark, [(1, "漢字漢字")]),
                          multibyte_threshold_ppm=300000).collect()[0]
    assert out.multibyte_bytes == 8 and out.is_garbage
    # raising the knob clears it (routing knob, not verdict)
    out2 = garbage_signals(_docs(spark, [(1, "漢字")]),
                           multibyte_threshold_ppm=900000).collect()[0]
    assert not out2.is_garbage


def test_garbage_empty(spark):
    out = garbage_signals(_docs(spark, [(1, "")])).collect()[0]
    assert (out.n_chars, out.n_bytes, out.control_n,
            bool(out.is_garbage)) == (0, 0, 0, False)


def _t(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_fk_orphans_counts(spark):
    child = _t(spark, [(1, 10), (2, 10), (3, 99), (4, 99), (5, 98),
                       (6, None)], "rid int, k int")
    parent = _t(spark, [(10,), (11,)], "k int")
    r = fk_orphans(child, parent, "k", "k").collect()[0]
    assert r.fk == "k->k"
    assert (r.n_child, r.n_null) == (5, 1)
    assert (r.orphan_rows, r.orphan_keys) == (3, 2)
    assert r.orphan_ppm == 3 * 10**6 // 5


def test_fk_clean(spark):
    child = _t(spark, [(1, 10), (2, 11)], "rid int, k int")
    parent = _t(spark, [(10,), (11,), (12,)], "k int")
    r = fk_orphans(child, parent, "k", "k", fk_name="demo").collect()[0]
    assert r.fk == "demo" and r.orphan_rows == 0 and r.orphan_ppm == 0


def test_fk_duplicate_parent_keys_ok(spark):
    # parent with duplicate keys must not multiply matches
    child = _t(spark, [(1, 10)], "rid int, k int")
    parent = _t(spark, [(10,), (10,)], "k int")
    r = fk_orphans(child, parent, "k", "k").collect()[0]
    assert r.orphan_rows == 0 and r.n_child == 1


def test_fk_all_null(spark):
    child = _t(spark, [(1, None)], "rid int, k int")
    parent = _t(spark, [(10,)], "k int")
    r = fk_orphans(child, parent, "k", "k").collect()[0]
    assert r.n_child == 0 and r.n_null == 1 and r.orphan_ppm is None
