"""geohash_encode: pinned against published geohash values + a pure-python
reference bisection implementation + prefix-hierarchy invariant."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _py_geohash(lat, lon, precision):
    """Canonical successive-bisection reference."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch <<= 1
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(_B32[ch])
            bits, ch = 0, 0
    return "".join(out)


def _encode(spark, pts, precision):
    from pyspark.sql import functions as F

    from picogeojson_spark.operators.layout import geohash_encode

    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    out = df.select(
        "id", geohash_encode(F.col("lon"), F.col("lat"), precision)
        .alias("gh")).collect()
    return {r.id: r.gh for r in out}


def test_published_geohashes(spark):
    # canonical examples from the geohash literature
    pts = [(1, -5.6, 42.6), (2, 10.40744, 57.64911), (3, 0.0, 0.0)]
    got = _encode(spark, pts, 5)
    assert got[1] == "ezs42"
    got6 = _encode(spark, pts, 6)
    assert got6[2] == _py_geohash(57.64911, 10.40744, 6) == "u4pruy"
    assert got6[3] == "s00000"


def test_python_reference_differential(spark):
    pts = [
        (i,
         ((i * 37) % 720) / 2.0 - 180 + 0.25,
         ((i * 61) % 360) / 2.0 - 90 + 0.25)
        for i in range(200)
    ]
    for prec in (1, 4, 7, 12):
        got = _encode(spark, pts, prec)
        for i, lon, lat in pts:
            assert got[i] == _py_geohash(lat, lon, prec), (i, prec)


def test_prefix_hierarchy(spark):
    pts = [(i, -180 + 0.25 + (i * 83) % 360, -90 + 0.25 + (i * 47) % 180)
           for i in range(100)]
    pts = [(i, float(lon), float(lat)) for i, lon, lat in pts]
    g6, g3 = _encode(spark, pts, 6), _encode(spark, pts, 3)
    assert all(g6[i].startswith(g3[i]) for i, _, _ in pts)


def test_precision_validation(spark):
    from pyspark.sql import functions as F

    from picogeojson_spark.operators.layout import geohash_encode

    with pytest.raises(ValueError):
        geohash_encode(F.lit(0.0), F.lit(0.0), 0)
    with pytest.raises(ValueError):
        geohash_encode(F.lit(0.0), F.lit(0.0), 13)
