"""abc_classes: Pareto cut on hand-crafted rollups."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, totals, **kw):
    from picogeojson_spark.operators.olap import abc_classes

    df = spark.createDataFrame(totals, "key string, v long")
    return {r.key: r for r in abc_classes(df, **kw).collect()}


def test_textbook_80_15_5(spark):
    # values 80, 15, 5 of total 100: boundaries land exactly
    got = _run(spark, [("x", 80), ("y", 15), ("z", 5)])
    assert got["x"].cls == "A"       # cum_before 0 < 80
    assert got["y"].cls == "B"       # cum_before 80, not < 80 -> B
    assert got["z"].cls == "C"       # cum_before 95, not < 95 -> C


def test_first_item_always_a(spark):
    got = _run(spark, [("whale", 999), ("m", 1)])
    assert got["whale"].cls == "A"


def test_crossing_item_upper_class(spark):
    # 50+40: the 40 item starts at 50% (< 80) -> still A
    got = _run(spark, [("a", 50), ("b", 40), ("c", 10)])
    assert got["a"].cls == "A" and got["b"].cls == "A"
    assert got["c"].cls == "B"       # cum_before 90 -> B


def test_tie_break_by_key(spark):
    got = _run(spark, [("b", 10), ("a", 10)])
    assert got["a"].rnk == 1 and got["b"].rnk == 2


def test_validation(spark):
    from picogeojson_spark.operators.olap import abc_classes

    df = spark.createDataFrame([("a", 1)], "key string, v long")
    with pytest.raises(ValueError):
        abc_classes(df, a_pct=95, b_pct=80)
