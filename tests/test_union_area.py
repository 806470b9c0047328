"""rect_union_area: exact union area vs brute unit-cell rasterization."""

import random

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _run(spark, rects):
    from picogeojson_spark.operators.measures import rect_union_area

    rows = [(g, i, x1, x2, y1, y2)
            for i, (g, x1, x2, y1, y2) in enumerate(rects)]
    df = spark.createDataFrame(
        rows, "grp string, rid long, x1 long, x2 long, y1 long, y2 long")
    return {r.grp: r for r in rect_union_area(df).collect()}


def _brute(rects):
    # count unit cells covered by any half-open box (small coords only)
    cells = set()
    for x1, x2, y1, y2 in rects:
        for x in range(x1, x2):
            for y in range(y1, y2):
                cells.add((x, y))
    return len(cells)


def test_disjoint_boxes_add(spark):
    rects = [("g", 0, 2, 0, 3), ("g", 10, 12, 10, 13)]
    assert _run(spark, rects)["g"].area == 12


def test_identical_boxes_count_once(spark):
    rects = [("g", 0, 4, 0, 4), ("g", 0, 4, 0, 4)]
    assert _run(spark, rects)["g"].area == 16


def test_partial_overlap_hand(spark):
    # 4x4 at origin + 4x4 shifted by (2,2): 16 + 16 - 4 = 28
    rects = [("g", 0, 4, 0, 4), ("g", 2, 6, 2, 6)]
    assert _run(spark, rects)["g"].area == 28


def test_nested_box_absorbed(spark):
    rects = [("g", 0, 10, 0, 10), ("g", 3, 5, 3, 5)]
    assert _run(spark, rects)["g"].area == 100


def test_degenerate_dropped(spark):
    rects = [("g", 0, 0, 0, 5), ("g", 1, 3, 2, 2), ("g", 0, 2, 0, 2)]
    r = _run(spark, rects)["g"]
    assert (r.n_rects, r.area) == (1, 4)


def test_seeded_brute_differential(spark):
    rng = random.Random(42)
    rects = []
    for g in ("a", "b"):
        for _ in range(12):
            x1 = rng.randrange(0, 30)
            y1 = rng.randrange(0, 30)
            rects.append((g, x1, x1 + rng.randrange(1, 12),
                          y1, y1 + rng.randrange(1, 12)))
    got = _run(spark, rects)
    for g in ("a", "b"):
        expect = _brute([r[1:] for r in rects if r[0] == g])
        assert got[g].area == expect, g
