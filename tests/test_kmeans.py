"""kmeans_points: hand-computed convergence, python replay of the exact
integer rounds, tie-break, empty-cluster hold, negative-coordinate floor
division."""

import math

import pytest

from picogeojson_spark.operators.spatial_cluster import (
    _KM_LAT_SHIFT,
    _KM_LON_SHIFT,
    kmeans_points,
)

pytestmark = pytest.mark.usefixtures("spark")


def _pts(spark, rows):
    return spark.createDataFrame(rows, "lat_u long, lon_u long")


def _py_kmeans(points, seeds, rounds):
    """Exact python replay of the operator's contract."""
    pts = [(a + _KM_LAT_SHIFT, o + _KM_LON_SHIFT) for a, o in points]
    cur = [(a + _KM_LAT_SHIFT, o + _KM_LON_SHIFT) for a, o in seeds]

    def assign(p):
        best = min(((p[0] - c[0]) ** 2 + (p[1] - c[1]) ** 2, j)
                   for j, c in enumerate(cur))
        return best

    for _ in range(rounds):
        acc = {}
        for p in pts:
            _, j = assign(p)
            n, sa, so = acc.get(j, (0, 0, 0))
            acc[j] = (n + 1, sa + p[0], so + p[1])
        cur = [(acc[j][1] // acc[j][0], acc[j][2] // acc[j][0])
               if j in acc else cur[j] for j in range(len(cur))]
    out = {}
    for j, c in enumerate(cur):
        out[j] = [c[0] - _KM_LAT_SHIFT, c[1] - _KM_LON_SHIFT, 0, 0]
    for p in pts:
        d, j = assign(p)
        out[j][2] += 1
        out[j][3] += math.floor(math.sqrt(d))
    return {j: tuple(v) for j, v in out.items()}


def test_two_blobs_converge(spark):
    blob_a = [(i, i * 2) for i in range(0, 1000, 100)]
    blob_b = [(50_000_000 + i, 70_000_000 + i) for i in range(0, 1000, 100)]
    got = {r.cid: r for r in kmeans_points(
        _pts(spark, blob_a + blob_b),
        seeds=[(10, 10), (40_000_000, 60_000_000)], rounds=3).collect()}
    assert got[0].n_points == 10 and got[1].n_points == 10
    assert got[0].c_lat_u == sum(a for a, _ in blob_a) // 10
    assert got[1].c_lon_u == sum(o for _, o in blob_b) // 10


def test_matches_python_replay(spark):
    points = [((i * 61) % 360 * 500_000 - 90_000_000,
               (i * 37) % 720 * 500_000 - 180_000_000)
              for i in range(1, 150)]
    seeds = [((j * 20 - 70) * 10**6, (j * 40 - 140) * 10**6)
             for j in range(8)]
    got = {r.cid: (r.c_lat_u, r.c_lon_u, r.n_points, r.inertia_u)
           for r in kmeans_points(_pts(spark, points), seeds,
                                  rounds=4).collect()}
    assert got == _py_kmeans(points, seeds, 4)


def test_tie_breaks_to_smaller_cid(spark):
    # one point exactly between two seeds; 1 round keeps centroids put
    got = {r.cid: r for r in kmeans_points(
        _pts(spark, [(0, 1)]), seeds=[(0, 0), (0, 2)], rounds=1).collect()}
    assert got[0].n_points == 1 and got[1].n_points == 0


def test_empty_cluster_keeps_seed(spark):
    got = {r.cid: r for r in kmeans_points(
        _pts(spark, [(0, 0), (2, 2)]),
        seeds=[(1, 1), (80_000_000, 170_000_000)], rounds=2).collect()}
    assert got[1].n_points == 0
    assert (got[1].c_lat_u, got[1].c_lon_u) == (80_000_000, 170_000_000)
    assert got[0].n_points == 2 and (got[0].c_lat_u, got[0].c_lon_u) == (1, 1)


def test_negative_coords_floor_division(spark):
    # mean of -3 and -4 in shifted space floors consistently: the
    # unshifted centroid must be floor(-3.5) = -4, not trunc -3
    got = kmeans_points(_pts(spark, [(-3, -3), (-4, -4)]),
                        seeds=[(0, 0)], rounds=1).collect()[0]
    assert (got.c_lat_u, got.c_lon_u) == (-4, -4)


def test_validates_args(spark):
    with pytest.raises(ValueError):
        kmeans_points(_pts(spark, [(0, 0)]), seeds=[], rounds=1)
    with pytest.raises(ValueError):
        kmeans_points(_pts(spark, [(0, 0)]), seeds=[(0, 0)], rounds=0)
