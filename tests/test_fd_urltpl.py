"""fd_profile + url_templates: holding/violated FDs, g3 hand values,
NULL-key semantics, template masking, host normalization, top-k cut."""

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.profile import fd_profile
from picogeojson_spark.operators.web import url_templates

pytestmark = pytest.mark.usefixtures("spark")


def test_fd_holds_and_violated(spark):
    rows = [(1, "a", "x"), (2, "b", "x"), (3, "b", "x"),
            (1, "a", "y"), (4, "c", "x")]
    df = spark.createDataFrame(rows, "k int, d string, v string")
    out = {(r.det, r.dep): r for r in
           fd_profile(df, [("k", "d"), ("d", "v")]).collect()}
    r = out[("k", "d")]  # k -> d holds (each k one d)
    assert r.holds and r.violating_groups == 0 and r.g3_rows == 0
    assert r.n_groups == 4 and r.n_rows == 5 and r.error_ppm == 0
    r = out[("d", "v")]  # d=a maps to {x,y}: one violation, g3 = 1
    assert not r.holds and r.violating_groups == 1
    assert r.g3_rows == 1 and r.error_ppm == 10**6 // 5


def test_fd_g3_plurality(spark):
    # group g: 3x'x', 2x'y', 1x'z' -> remove 3 rows to fix
    rows = [("g", "x")] * 3 + [("g", "y")] * 2 + [("g", "z")]
    df = spark.createDataFrame(rows, "d string, v string")
    r = fd_profile(df, [("d", "v")]).collect()[0]
    assert r.g3_rows == 3 and r.n_groups == 1 and r.violating_groups == 1


def test_fd_null_det_is_a_group_null_dep_a_value(spark):
    rows = [(None, "x"), (None, "x"), ("a", None), ("a", None)]
    df = spark.createDataFrame(rows, "d string, v string")
    r = fd_profile(df, [("d", "v")]).collect()[0]
    assert r.holds and r.n_groups == 2 and r.g3_rows == 0


def test_fd_rejects_empty_candidates(spark):
    df = spark.createDataFrame([("a",)], "d string")
    with pytest.raises(ValueError):
        fd_profile(df, [])


def test_fd_empty_input(spark):
    df = spark.createDataFrame([], "d string, v string")
    r = fd_profile(df, [("d", "v")]).collect()[0]
    assert r.n_rows == 0 and r.g3_rows == 0 and r.holds
    assert r.error_ppm is None


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_tpl_digit_masking_and_query_strip(spark):
    out = url_templates(_urls(spark, [
        "https://s.com/a/12/b/9?x=3", "https://s.com/a/777/b/0",
    ])).collect()
    assert len(out) == 1
    r = out[0]
    assert r.template == "/a/{n}/b/{n}" and r.n_pages == 2 and r.n_urls == 2


def test_tpl_host_normalization(spark):
    out = url_templates(_urls(spark, [
        "https://www.S.com/p/1", "http://s.com:80/p/2", "https://s.com/p/3",
    ])).collect()
    assert len(out) == 1 and out[0].host == "s.com" and out[0].n_pages == 3


def test_tpl_recrawl_dedup(spark):
    out = url_templates(_urls(spark, ["https://s.com/p/1"] * 3)).collect()
    assert out[0].n_pages == 3 and out[0].n_urls == 1


def test_tpl_hex_does_not_mask(spark):
    out = url_templates(_urls(spark, ["https://s.com/id/ab3f"])).collect()
    assert out[0].template == "/id/ab{n}f"


def test_tpl_topk_and_share(spark):
    urls = (["https://s.com/a/%d" % i for i in range(5)]
            + ["https://s.com/b"] * 3 + ["https://s.com/c"] * 2
            + ["https://s.com/d"])
    out = url_templates(_urls(spark, urls), top_k=2).orderBy("rnk").collect()
    assert [(r.template, r.rnk) for r in out] == [("/a/{n}", 1), ("/b", 2)]
    # shares use the PRE-cut host total (11 pages)
    assert out[0].share_ppm == 5 * 10**6 // 11
    with pytest.raises(ValueError):
        url_templates(_urls(spark, urls), top_k=0)


def test_tpl_bare_host_is_root(spark):
    out = url_templates(_urls(spark, ["https://s.com", "https://s.com/"]))
    r = out.collect()[0]
    assert r.template == "/" and r.n_pages == 2 and r.n_urls == 2
