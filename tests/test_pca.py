"""top_direction: integer power iteration vs python/numpy replays."""

import math

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")


def test_gram_hand_case(spark):
    from picogeojson_spark.operators.pca import gram_matrix

    # [1.0, 2.0] and [0.0, 1.0] -> q rows (1000,2000), (0,1000)
    g = {(r.i, r.j): r.g
         for r in gram_matrix(_df(spark, [[1.0, 2.0], [0.0, 1.0]]))
         .collect()}
    assert g[(1, 1)] == 1000 * 1000
    assert g[(1, 2)] == g[(2, 1)] == 1000 * 2000
    assert g[(2, 2)] == 2000 * 2000 + 1000 * 1000


def test_dominant_axis_found(spark):
    from picogeojson_spark.operators.pca import top_direction

    vecs = [[0.0, 5.0, 0.1], [0.0, -4.0, 0.0], [0.1, 6.0, -0.1],
            [0.0, 5.5, 0.2]]
    out = {r.i: r.v for r in top_direction(_df(spark, vecs)).collect()}
    assert abs(out[2]) == 1_000_000           # axis 2 dominates
    assert abs(out[1]) < 200_000 and abs(out[3]) < 200_000


def test_integer_replay_exact(spark):
    from picogeojson_spark.operators.pca import top_direction

    vecs = [[1.0, 2.0, 3.0], [2.0, 1.0, 0.5], [-1.0, 0.5, 2.0]]
    out = {r.i: r.v for r in
           top_direction(_df(spark, vecs), rounds=5).collect()}

    q = [[math.floor(x * 1000) for x in v] for v in vecs]
    d = 3
    g = [[sum(row[i] * row[j] for row in q) for j in range(d)]
         for i in range(d)]
    v = [10 ** 6] * d
    for _ in range(5):
        w = [sum(g[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w)
        v = [((x * 10 ** 6) - (((x * 10 ** 6) % m) + m) % m) // m
             for x in w] if m else [0] * d
    for i in range(d):
        assert out[i + 1] == v[i], i


def test_numpy_eigenvector_agreement(spark):
    np = pytest.importorskip("numpy")
    from picogeojson_spark.operators.pca import top_direction

    rng = np.random.RandomState(7)
    base = rng.randn(64)
    vecs = [list(base * (1 + 0.1 * k) + rng.randn(64) * 0.05)
            for k in range(20)]
    out = top_direction(_df(spark, vecs), rounds=8).collect()
    got = np.array([r.v for r in sorted(out, key=lambda r: r.i)],
                   dtype=float)
    q = np.floor(np.array(vecs, dtype=np.float64) * 1000)
    gram = q.T @ q
    vals, vecs_e = np.linalg.eigh(gram)
    top = vecs_e[:, -1]
    cos = abs(got @ top) / (np.linalg.norm(got) * np.linalg.norm(top))
    assert cos > 0.999


def test_rounds_validated(spark):
    from picogeojson_spark.operators.pca import top_direction

    with pytest.raises(ValueError):
        top_direction(_df(spark, [[1.0]]), rounds=0)
