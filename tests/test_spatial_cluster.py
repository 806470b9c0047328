"""grid_dbscan / grid_heatmap: hand-computed contracts on tiny point sets.

Coordinates sit on the exact 0.25-degree dyadic lattice (repo rule) so the
micro-degree floor arithmetic is bit-deterministic.
"""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _df(spark, rows):
    return spark.createDataFrame(rows, "point_id long, lon double, lat double")


def _run(spark, rows, **kw):
    from picogeojson_spark.operators.spatial_cluster import grid_dbscan

    out = grid_dbscan(_df(spark, rows), **kw).collect()
    return {r.point_id: (r.cluster_id, r.role) for r in out}


def _key(lon, lat, eps=500_000):
    import math

    cx = math.floor(math.floor(lon * 1e6) / eps)
    cy = math.floor(math.floor(lat * 1e6) / eps)
    return (cx + (1 << 20)) * (1 << 21) + (cy + (1 << 20))


def test_two_blobs_and_noise(spark):
    # blob A: 4 points in two adjacent 0.5-degree cells; blob B: 3 points
    # in one far cell; one lone noise point.
    rows = [
        (1, 10.25, 10.25), (2, 10.25, 10.25),       # cell (20, 20) core
        (3, 10.75, 10.25), (4, 10.75, 10.25),       # cell (21, 20) core
        (5, 50.25, -30.25), (6, 50.25, -30.25), (7, 50.25, -30.25),
        (8, -120.25, 60.25),                        # alone -> noise
    ]
    got = _run(spark, rows, eps_udeg=500_000, min_pts=2)
    a = _key(10.25, 10.25)
    b = _key(50.25, -30.25)
    assert got[1] == (a, "core") and got[4] == (a, "core")
    assert got[2] == got[3] == (a, "core")  # adjacent core cells merge
    assert got[5] == got[6] == got[7] == (b, "core")
    assert got[8] == (-1, "noise")


def test_border_point_takes_min_neighbor_cluster(spark):
    # core cell at (20,20); single point one cell east is BORDER.
    rows = [
        (1, 10.25, 10.25), (2, 10.25, 10.25),
        (3, 10.75, 10.25),                          # non-core, adjacent
    ]
    got = _run(spark, rows, eps_udeg=500_000, min_pts=2)
    a = _key(10.25, 10.25)
    assert got[3] == (a, "border")


def test_chain_of_core_cells_is_one_cluster(spark):
    # five consecutive core cells along lon -> single component whose id
    # is the minimum packed key (the westmost cell).
    rows = []
    pid = 0
    for i in range(5):
        lon = 10.25 + 0.5 * i
        rows += [(pid, lon, 10.25), (pid + 1, lon, 10.25)]
        pid += 2
    got = _run(spark, rows, eps_udeg=500_000, min_pts=2)
    cid = _key(10.25, 10.25)
    assert all(v == (cid, "core") for v in got.values())


def test_diagonal_adjacency_merges(spark):
    rows = [
        (1, 10.25, 10.25), (2, 10.25, 10.25),       # (20, 20)
        (3, 10.75, 10.75), (4, 10.75, 10.75),       # (21, 21) diagonal
    ]
    got = _run(spark, rows, eps_udeg=500_000, min_pts=2)
    cid = _key(10.25, 10.25)
    assert got[1] == got[3] == (cid, "core")


def test_negative_coordinates_floor_not_truncate(spark):
    # lon -0.25 must land in cell -1, not cell 0 (floor vs truncation).
    rows = [(1, -0.25, -0.25), (2, -0.25, -0.25), (3, 0.25, 0.25)]
    got = _run(spark, rows, eps_udeg=500_000, min_pts=2)
    cid = _key(-0.25, -0.25)
    # (−1,−1) core and (0,0) are DIAGONAL neighbors -> point 3 is border.
    assert got[1] == (cid, "core")
    assert got[3] == (cid, "border")


def test_no_cartesian_in_plan(spark):
    from picogeojson_spark.operators.spatial_cluster import grid_dbscan

    rows = [(i, 10.25 + 0.25 * (i % 4), 10.25) for i in range(12)]
    plan = grid_dbscan(_df(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_heatmap_hand_computed(spark):
    from picogeojson_spark.operators.spatial_cluster import grid_heatmap

    # cells (0,0): 3 points, (1,0): 2, (3,3): 1  at 2-degree pitch
    rows = [
        (1, 0.25, 0.25), (2, 1.25, 1.25), (3, 0.75, 0.75),
        (4, 2.25, 0.25), (5, 3.25, 1.75),
        (6, 6.25, 6.25),
    ]
    out = grid_heatmap(_df(spark, rows), cell_udeg=2_000_000).collect()
    got = {(r.cx, r.cy): (r.cnt, r.smoothed) for r in out}
    assert got[(0, 0)] == (3, 5)   # self + east neighbor
    assert got[(1, 0)] == (2, 5)
    assert got[(3, 3)] == (1, 1)
    assert set(got) == {(0, 0), (1, 0), (3, 3)}  # occupied cells only


def test_heatmap_no_cartesian(spark):
    from picogeojson_spark.operators.spatial_cluster import grid_heatmap

    rows = [(i, 0.25, 0.25) for i in range(5)]
    plan = grid_heatmap(_df(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_randomized_brute_differential(spark):
    """30 deterministic pseudo-random point fields vs a pure-python
    replica of the full grid-DBSCAN contract (cells, cores, 8-neighbor
    components, border resolution, noise)."""
    import math

    eps, min_pts = 500_000, 2
    B = 1 << 20

    def key(cx, cy):
        return (cx + B) * (1 << 21) + (cy + B)

    def brute(rows):
        cells = {}
        pc = {}
        for pid, lon, lat in rows:
            cx = math.floor(math.floor(lon * 1e6) / eps)
            cy = math.floor(math.floor(lat * 1e6) / eps)
            pc[pid] = (cx, cy)
            cells[(cx, cy)] = cells.get((cx, cy), 0) + 1
        core = {c for c, n in cells.items() if n >= min_pts}
        # components over 8-neighborhood
        comp = {}
        for c in core:
            comp[c] = key(*c)
        changed = True
        while changed:
            changed = False
            for (cx, cy) in core:
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        nb = (cx + dx, cy + dy)
                        if nb in core and comp[nb] < comp[(cx, cy)]:
                            comp[(cx, cy)] = comp[nb]
                            changed = True
        out = {}
        for pid, c in pc.items():
            if c in core:
                out[pid] = (comp[c], "core")
            else:
                nbrs = [comp[(c[0] + dx, c[1] + dy)]
                        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                        if not (dx == 0 and dy == 0)
                        and (c[0] + dx, c[1] + dy) in core]
                out[pid] = (min(nbrs), "border") if nbrs else (-1, "noise")
        return out

    for seed in range(30):
        rows = []
        for i in range(40):
            # LCG scatter concentrated in a 6x6-degree box + far outliers
            a = (seed * 7919 + i * 104729) % 96
            b = (seed * 15485863 + i * 32452843) % 96
            lon = -10.0 + a * 0.25 / 4 if i % 9 else 120.25
            lat = 20.0 + b * 0.25 / 4 if i % 9 else -60.25
            rows.append((i, lon, lat))
        got = _run(spark, rows, eps_udeg=eps, min_pts=min_pts)
        assert got == brute(rows), seed
