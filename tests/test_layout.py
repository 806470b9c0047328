"""Z-order layout: key correctness vs a pure-Python interleave, and the
actual pruning payoff — bbox-relevant row groups under Z-order layout vs
ingest order, measured from real parquet footer stats."""

import glob
import math

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _py_zkey(lon, lat, bits):
    n = 1 << bits

    def q(v, lo, hi):
        x = math.floor((v - lo) / (hi - lo) * n)
        return max(0, min(n - 1, x))

    qx, qy = q(lon, -180.0, 180.0), q(lat, -90.0, 90.0)
    out = 0
    for i in range(bits):
        out |= ((qx >> i) & 1) << (2 * i)
        out |= ((qy >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python(spark):
    from picogeojson_spark.operators.layout import zorder_key

    pts = [(i, (i * 37 % 720) / 2.0 - 180 + 0.25,
            (i * 61 % 360) / 2.0 - 90 + 0.25) for i in range(300)]
    # boundary probes: corners and clamping
    pts += [(1000, -180.0, -90.0), (1001, 180.0, 90.0),
            (1002, 0.0, 0.0), (1003, 179.999, 89.999)]
    df = spark.createDataFrame(pts, "point_id long, lon double, lat double")
    for bits in (4, 8, 16):
        got = {r["point_id"]: r["z"] for r in df.select(
            "point_id",
            zorder_key(F.col("lon"), F.col("lat"), bits).alias("z"),
        ).collect()}
        for pid, lon, lat in pts:
            assert got[pid] == _py_zkey(lon, lat, bits), (bits, pid)


def _row_groups_touching(path, lon_rng, lat_rng):
    """(touching, total) row groups whose lon/lat stats intersect the bbox
    — exactly the footer-stats test a pruning scan performs."""
    touching = total = 0
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        li, la = names.index("lon"), names.index("lat")
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            total += 1
            slon, slat = rg.column(li).statistics, rg.column(la).statistics
            if (slon.min <= lon_rng[1] and slon.max >= lon_rng[0]
                    and slat.min <= lat_rng[1] and slat.max >= lat_rng[0]):
                touching += 1
    return touching, total


def test_zorder_layout_prunes_bbox_scans(spark, tmp_path):
    from picogeojson_spark.operators.layout import write_zordered

    n = 20000
    df = spark.range(n).select(
        F.col("id").alias("point_id"),
        ((F.col("id") * 37 % 720).cast("double") / 2 - 180 + 0.25)
        .alias("lon"),
        ((F.col("id") * 61 % 360).cast("double") / 2 - 90 + 0.25)
        .alias("lat"),
    )
    base = str(tmp_path / "ingest")
    zpath = str(tmp_path / "zorder")
    # ingest order: the id-interleaved lattice scatters every file globally
    df.repartition(16).write.mode("overwrite").parquet(base)
    write_zordered(df, zpath, bits=12, num_files=16)

    bbox = ((10.0, 40.0), (20.0, 45.0))  # a ~1% of-the-planet window
    t_ing, n_ing = _row_groups_touching(base, *bbox)
    t_z, n_z = _row_groups_touching(zpath, *bbox)
    assert t_ing == n_ing  # ingest order: every row group touches the bbox
    assert t_z * 4 <= n_z  # z-order: at least 4x fewer row groups touched

    # layout change must not change the data
    a = spark.read.parquet(base).orderBy("point_id").collect()
    b = spark.read.parquet(zpath).orderBy("point_id").collect()
    assert a == b


def _interleave(x, y, bits):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_ranges_exact_and_bounded():
    """Unlimited depth: the ranges are EXACTLY the bbox's cell set.
    Bounded depth: a disjoint sorted superset."""
    import random

    from picogeojson_spark.operators.layout import zorder_ranges

    rng = random.Random(5)
    bits = 6
    n = 1 << bits
    for _ in range(25):
        a, b = sorted(rng.uniform(-180, 180) for _ in range(2))
        c, d = sorted(rng.uniform(-90, 90) for _ in range(2))

        def q(v, lo, hi):
            return max(0, min(n - 1, int((v - lo) / (hi - lo) * n)))

        want = {_interleave(x, y, bits)
                for x in range(q(a, -180, 180), q(b, -180, 180) + 1)
                for y in range(q(c, -90, 90), q(d, -90, 90) + 1)}
        got = set()
        for lo, hi in zorder_ranges(a, c, b, d, bits=bits, max_depth=99):
            got.update(range(lo, hi + 1))
        assert got == want
        got2, prev = set(), -1
        for lo, hi in zorder_ranges(a, c, b, d, bits=bits, max_depth=3):
            assert lo > prev
            prev = hi
            got2.update(range(lo, hi + 1))
        assert want <= got2


def test_bbox_filter_zordered_equals_plain(spark):
    from picogeojson_spark.operators.layout import bbox_filter_zordered

    df = spark.range(5000).select(
        F.col("id").alias("point_id"),
        ((F.col("id") * 37 % 720).cast("double") / 2 - 180 + 0.25)
        .alias("lon"),
        ((F.col("id") * 61 % 360).cast("double") / 2 - 90 + 0.25)
        .alias("lat"),
    )
    bbox = (10.0, 40.0, 30.0, 55.0)
    got = sorted(r["point_id"] for r in
                 bbox_filter_zordered(df, *bbox, bits=12).collect())
    want = sorted(r["point_id"] for r in df.filter(
        (F.col("lon") >= bbox[0]) & (F.col("lat") >= bbox[1])
        & (F.col("lon") <= bbox[2]) & (F.col("lat") <= bbox[3])).collect())
    assert got == want and len(want) > 0
