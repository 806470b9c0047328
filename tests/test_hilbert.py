"""hilbert_key: automaton tables proven against the textbook recursive
algorithm (exhaustive bijection + unit-step adjacency), Spark and DuckDB
spellings pinned to the same pure-python replay, and the locality claim
vs the Morton key measured, not asserted."""

import duckdb
import pytest

from picogeojson_spark.operators.layout import (
    _HILBERT_Q,
    _HILBERT_S,
    hilbert_key,
    hilbert_key_sql,
    zorder_key,
)

pytestmark = pytest.mark.usefixtures("spark")


def _xy2d_recursive(order, x, y):
    """Textbook mask-then-transform Hilbert encode (per-level swap /
    reflect of the remaining low bits) — the independent formulation the
    automaton tables must reproduce."""
    d = 0
    for i in range(order - 1, -1, -1):
        s = 1 << i
        rx = (x >> i) & 1
        ry = (y >> i) & 1
        d += s * s * ((3 * rx) ^ ry)
        x &= s - 1
        y &= s - 1
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
    return d


def _xy2d_tables(order, x, y):
    """The operator's own 4-state automaton, replayed in python."""
    st = 0
    d = 0
    for i in range(order - 1, -1, -1):
        idx = st * 4 + ((x >> i) & 1) * 2 + ((y >> i) & 1)
        d |= _HILBERT_Q[idx] << (2 * i)
        st = _HILBERT_S[idx]
    return d


def test_tables_match_recursive_exhaustive_order4():
    for x in range(16):
        for y in range(16):
            assert _xy2d_tables(4, x, y) == _xy2d_recursive(4, x, y)


def test_tables_match_recursive_sampled_order10():
    import random

    rng = random.Random(7)
    for _ in range(2000):
        x, y = rng.randrange(1024), rng.randrange(1024)
        assert _xy2d_tables(10, x, y) == _xy2d_recursive(10, x, y)


def test_bijection_and_unit_step_adjacency_order4():
    """The Hilbert contract: keys 0..255 each hit exactly once, and
    consecutive keys are Manhattan-adjacent cells (the property Morton
    lacks — this is what makes per-file bboxes tight)."""
    inv = {}
    for x in range(16):
        for y in range(16):
            inv[_xy2d_tables(4, x, y)] = (x, y)
    assert sorted(inv) == list(range(256))
    for d in range(255):
        (x0, y0), (x1, y1) = inv[d], inv[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def _grid_rows(order):
    n = 1 << order
    rows = []
    for cx in range(n):
        for cy in range(n):
            rows.append((cx, cy,
                         -180.0 + (cx + 0.5) * 360.0 / n,
                         -90.0 + (cy + 0.5) * 180.0 / n))
    return rows


def test_spark_matches_python_exhaustive_order4(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(_grid_rows(4), "cx int, cy int, "
                                              "lon double, lat double")
    got = df.select("cx", "cy",
                    hilbert_key(F.col("lon"), F.col("lat"), 4)
                    .alias("hk")).collect()
    assert len(got) == 256
    for r in got:
        assert r.hk == _xy2d_tables(4, r.cx, r.cy)


def test_spark_matches_python_order16_lattice(spark):
    """Default bits=16 on the deterministic test lattice — exercises the
    deep expression chain end to end."""
    from pyspark.sql import functions as F

    df = spark.range(1, 401).select(
        F.col("id"),
        ((F.col("id") * 37) % 720).cast("double").alias("qlon"),
        ((F.col("id") * 61) % 360).cast("double").alias("qlat"),
    ).select(
        "id",
        (F.col("qlon") / 2 - 180 + 0.25).alias("lon"),
        (F.col("qlat") / 2 - 90 + 0.25).alias("lat"),
    )
    got = df.select("id", "lon", "lat",
                    hilbert_key(F.col("lon"), F.col("lat"), 16)
                    .alias("hk")).collect()
    n = 1 << 16
    for r in got:
        qx = max(0, min(n - 1, int((r.lon + 180.0) / 360.0 * n)))
        qy = max(0, min(n - 1, int((r.lat + 90.0) / 180.0 * n)))
        assert r.hk == _xy2d_tables(16, qx, qy)


def test_duckdb_sql_matches_python_exhaustive_order4():
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(cx INT, cy INT, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?, ?, ?)", _grid_rows(4))
    expr = hilbert_key_sql("lon", "lat", 4)
    for cx, cy, hk in con.execute(
            f"SELECT cx, cy, {expr} FROM pts").fetchall():
        assert hk == _xy2d_tables(4, cx, cy)


def test_hilbert_locality_beats_morton_order4(spark):
    """The metric range-clustering actually cares about: a contiguous key
    window becomes one file, and scans prune on that file's lon/lat
    min/max — so compare the mean bbox semiperimeter of every contiguous
    16-key window. Hilbert must beat Morton (measured 7.75 vs 10.33), and
    its worst consecutive-key step is 1 cell vs Morton's 16.

    (Deliberately NOT mean |Δkey| between adjacent cells — that metric
    favors Morton (8.5 vs 9.9) while being irrelevant to file pruning.)"""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(_grid_rows(4), "cx int, cy int, "
                                              "lon double, lat double")
    rows = df.select("cx", "cy",
                     hilbert_key(F.col("lon"), F.col("lat"), 4).alias("hk"),
                     zorder_key(F.col("lon"), F.col("lat"), 4).alias("zk"),
                     ).collect()
    hinv = {r.hk: (r.cx, r.cy) for r in rows}
    zinv = {r.zk: (r.cx, r.cy) for r in rows}

    def win_bbox_semiperim(inv, block=16):
        tot = cnt = 0
        for lo in range(0, 256 - block):
            xs = [inv[k][0] for k in range(lo, lo + block)]
            ys = [inv[k][1] for k in range(lo, lo + block)]
            tot += (max(xs) - min(xs)) + (max(ys) - min(ys))
            cnt += 1
        return tot / cnt

    def max_step(inv):
        return max(abs(inv[d][0] - inv[d + 1][0])
                   + abs(inv[d][1] - inv[d + 1][1]) for d in range(255))

    assert win_bbox_semiperim(hinv) < win_bbox_semiperim(zinv)
    assert max_step(hinv) == 1
    assert max_step(zinv) > 1


def test_bits_bounds():
    from pyspark.sql import functions as F

    with pytest.raises(ValueError):
        hilbert_key(F.lit(0.0), F.lit(0.0), 0)
    with pytest.raises(ValueError):
        hilbert_key_sql("lon", "lat", 32)
