"""closeness_sample + centroid_outliers: path/star hand values, hop
truncation, disconnected seeds, python brute replays; centroid floor,
top-k ordering, quantization parity."""

import pytest
from pyspark.sql import functions as F

from picogeojson_spark.operators.graph import closeness_sample
from picogeojson_spark.operators.pca import SCALE_Q, centroid_outliers

pytestmark = pytest.mark.usefixtures("spark")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "seed long")


def _py_closeness(pairs, seeds, max_hops):
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    out = {}
    for s in seeds:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            x = dq.popleft()
            if dist[x] >= max_hops:
                continue
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    dq.append(y)
        reached = len(dist)
        sh = sum(dist.values())
        out[s] = (
            reached, sh,
            (reached - 1) * 10**6 // sh if sh > 0 else None,
            sum(10**6 // d for d in dist.values() if d > 0),
        )
    return out


def test_closeness_path_hand(spark):
    # path 1-2-3-4-5, seed 1, hops 4: d = 0,1,2,3,4
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    r = closeness_sample(e, _seeds(spark, [1]), max_hops=4).collect()[0]
    assert (r.reached, r.sum_hops) == (5, 10)
    assert r.closeness_ppm == 4 * 10**6 // 10
    assert r.harmonic_x1e6 == 10**6 + 500000 + 333333 + 250000


def test_closeness_star_center_vs_leaf(spark):
    e = _edges(spark, [(0, i) for i in range(1, 6)])
    out = {r.seed: r for r in closeness_sample(
        e, _seeds(spark, [0, 1]), max_hops=3).collect()}
    assert out[0].sum_hops == 5 and out[0].closeness_ppm == 10**6
    # leaf: center at 1, siblings at 2 -> 1 + 4*2 = 9
    assert out[1].sum_hops == 9 and out[1].reached == 6


def test_closeness_hop_truncation(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    r = closeness_sample(e, _seeds(spark, [1]), max_hops=2).collect()[0]
    assert r.reached == 3 and r.sum_hops == 3


def test_closeness_isolated_seed_null(spark):
    e = _edges(spark, [(1, 2)])
    out = {r.seed: r for r in closeness_sample(
        e, _seeds(spark, [9]), max_hops=3).collect()}
    assert out[9].reached == 1 and out[9].closeness_ppm is None
    assert out[9].harmonic_x1e6 == 0


def test_closeness_brute_differential(spark):
    pairs = [(i, (i * i + 1) % 13) for i in range(13)]
    pairs = [(min(u, v), max(u, v)) for u, v in pairs if u != v]
    pairs = sorted(set(pairs))
    seeds = [0, 3, 7]
    got = {r.seed: (r.reached, r.sum_hops, r.closeness_ppm,
                    r.harmonic_x1e6)
           for r in closeness_sample(
               _edges(spark, pairs), _seeds(spark, seeds),
               max_hops=3).collect()}
    assert got == _py_closeness(pairs, seeds, 3)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_outliers_hand_case(spark):
    rows = [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 0.0]),
            (4, [1.0, 1.0])]
    # quantized: three (0,0), one (1000,1000); centroid floor = (250,250)
    out = centroid_outliers(_vecs(spark, rows), k=2).collect()
    assert out[0].vec_id == 4
    assert out[0].dist2 == 2 * 750 * 750
    assert out[1].dist2 == 2 * 250 * 250


def test_outliers_negative_floor_centroid(spark):
    # sums negative: s=-3 over n=2 -> floor(-1.5) = -2 (NOT trunc -1)
    rows = [(1, [-0.001]), (2, [-0.002])]
    out = centroid_outliers(_vecs(spark, rows), k=2).collect()
    # q = -1, -2; centroid floor((-3)/2) = -2; dists: 1, 0
    assert [r.dist2 for r in out] == [1, 0]
    assert out[0].vec_id == 1


def test_outliers_tie_breaks_on_id(spark):
    rows = [(7, [1.0]), (3, [1.0]), (5, [0.0])]
    out = centroid_outliers(_vecs(spark, rows), k=3).collect()
    d = [(r.vec_id, r.dist2) for r in out]
    # centroid floor(2000/3)=666: vec 5 at 666^2 is farthest; 3 and 7
    # tie at 334^2 and break on the smaller id
    assert d[0] == (5, 666 * 666)
    assert d[1] == (3, 334 * 334) and d[2] == (7, 334 * 334)


def test_outliers_k_bounds(spark):
    rows = [(1, [0.5]), (2, [0.25])]
    assert len(centroid_outliers(_vecs(spark, rows), k=10).collect()) == 2
    with pytest.raises(ValueError):
        centroid_outliers(_vecs(spark, rows), k=0)
