"""hex_assign / hex_histogram: brute nearest-center differential,
doubled-coordinate center exactness, conservation, geometry validation."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")

W = 2_000_000
H = 3_464_000  # 2 * floor(W * 866 / 1000)


def _assign(spark, pts, width=W):
    from picogeojson_spark.operators.hexbin import hex_assign

    df = spark.createDataFrame(pts, "lon double, lat double")
    return hex_assign(df, width_udeg=width).collect()


def _brute_nearest(x, y, w, h):
    """True nearest center over a brute window of BOTH lattices, same
    tie rule (A wins ties; within a lattice, larger index wins exact
    half-pitch ties, matching floor((x + p/2)/p))."""
    best = None
    for i in range(x // w - 3, x // w + 4):
        for j in range(y // h - 3, y // h + 4):
            for (cx, cy, hx, hy, is_a) in (
                (i * w, j * h, 2 * i, 2 * j, 1),
                (i * w + w // 2, j * h + h // 2, 2 * i + 1, 2 * j + 1, 0),
            ):
                d = (x - cx) ** 2 + (y - cy) ** 2
                # tie order: smaller distance; then A before B; then the
                # +inf-rounding rule = larger index
                key = (d, -is_a, -hx, -hy)
                if best is None or key < best[0]:
                    best = (key, hx, hy)
    return best[1], best[2]


def test_brute_nearest_center_differential(spark):
    # a deterministic scatter incl. negatives and near-boundary points
    pts = []
    for i in range(400):
        lon = ((i * 37) % 720) / 2.0 - 180 + 0.25
        lat = ((i * 61) % 360) / 2.0 - 90 + 0.25
        pts.append((lon, lat))
    # boundary stress: points on perpendicular bisectors of the lattices
    pts += [(1.0, 0.866), (-1.0, -0.866), (0.5, 0.433), (3.0, 1.732)]
    rows = _assign(spark, pts)
    import math

    for r in rows:
        x = math.floor(r.lon * 1e6)
        y = math.floor(r.lat * 1e6)
        bx, by = _brute_nearest(x, y, W, H)
        # distances must agree exactly (the engine picks A on ties, brute
        # encodes the same order)
        acx = r.hx * (W // 2)
        acy = r.hy * (H // 2)
        bcx = bx * (W // 2)
        bcy = by * (H // 2)
        da = (x - acx) ** 2 + (y - acy) ** 2
        db = (x - bcx) ** 2 + (y - bcy) ** 2
        assert da == db, (r.lon, r.lat, (r.hx, r.hy), (bx, by))


def test_center_is_doubled_coordinate_exact(spark):
    rows = _assign(spark, [(4.0, 3.464), (5.0, 5.196), (-4.0, -3.464)])
    for r in rows:
        assert r.hex_cx_udeg == r.hx * (W // 2)
        assert r.hex_cy_udeg == r.hy * (H // 2)
        # lattice parity invariant: hx and hy share parity
        assert (r.hx % 2) == (r.hy % 2)


def test_exact_centers_assign_to_themselves(spark):
    # points sitting exactly on lattice centers
    pts = [(0.0, 0.0), (2.0, 3.464), (1.0, 1.732), (-2.0, -3.464),
           (-1.0, -1.732)]
    rows = _assign(spark, pts)
    import math

    for r in rows:
        x = math.floor(r.lon * 1e6)
        y = math.floor(r.lat * 1e6)
        assert r.hex_cx_udeg == x and r.hex_cy_udeg == y, r


def test_histogram_conserves_points(spark):
    from picogeojson_spark.operators.hexbin import hex_histogram

    pts = [(((i * 37) % 720) / 2.0 - 180 + 0.25,
            ((i * 61) % 360) / 2.0 - 90 + 0.25) for i in range(500)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    out = hex_histogram(df).collect()
    assert sum(r.cnt for r in out) == 500
    assert len(out) > 50  # scatter actually spreads over many hexes


def test_geometry_validation():
    from picogeojson_spark.operators.hexbin import hex_geometry

    with pytest.raises(ValueError):
        hex_geometry(999)
    with pytest.raises(ValueError):
        hex_geometry(100001)
    assert hex_geometry(W) == (W, H)
