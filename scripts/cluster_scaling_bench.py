"""Input-size scaling evidence for the spatial clustering/binning family.

Round-4 continuation: gives ``grid_dbscan`` and ``adaptive_quadbin`` the
same two-size throughput curve the pages spine and the dedup/curation
family have. Property under test (100 TB-relevant): per-point cost must
stay flat-or-falling as the input grows — both operators are ONE corpus
shuffle plus cell-sized work, so nothing may scale super-linearly.

Corpus: deterministic LCG-spread clumped points (the entry file's
_clumped_points shape, scaled): 6 dense blobs + scattered noise, all
derived from the row id JVM-side — no RNG, no external data.

Each measurement runs in its own subprocess (fresh JVM); best of two
passes per size. Point generation and parquet writes are excluded from
timing.

Usage: python scripts/cluster_scaling_bench.py [small_n] [ratio]
       (defaults 2000000 4 -> 2M and 8M points)
       python scripts/cluster_scaling_bench.py --child <cores> <path>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _gen(spark, n, path):
    from pyspark.sql import functions as F

    i = F.col("id")
    g = (i * 7) % 6
    lon_c = (g % 3).cast("double") * 100 - 100
    lat_c = F.floor(g / F.lit(3)).cast("double") * 60 - 30
    # wider intra-blob spread than the contract query so cell counts grow
    # with n instead of saturating a handful of lattice positions
    dlon = ((i * 13) % 41).cast("double") * 0.25 - 5.0
    dlat = ((i * 17) % 43).cast("double") * 0.25 - 5.25
    noise = (i % 23) == 0
    (
        spark.range(n)
        .select(
            i.alias("point_id"),
            F.when(noise, ((i * 37) % 720).cast("double") / 2 - 180 + 0.25)
            .otherwise(lon_c + dlon).alias("lon"),
            F.when(noise, ((i * 61) % 360).cast("double") / 2 - 90 + 0.25)
            .otherwise(lat_c + dlat).alias("lat"),
        )
        .write.mode("overwrite").parquet(path)
    )


def child(cores: int, path: str):
    from picogeojson_spark.operators.spatial_cluster import (
        adaptive_quadbin,
        grid_dbscan,
    )
    from picogeojson_spark.session import get_spark

    spark = get_spark(
        master="local[{}]".format(cores),
        shuffle_partitions=2 * cores,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    pts = spark.read.parquet(path)
    n = pts.count()

    # warm JVM + plan shapes on a slice (excluded from timing)
    grid_dbscan(pts.limit(50_000)).count()
    adaptive_quadbin(pts.limit(50_000), cap=1000, max_level=8).count()

    out = {"cores": cores, "n_points": n}
    for name, fn in (
        ("grid_dbscan", lambda d: grid_dbscan(d, eps_udeg=500_000,
                                              min_pts=3)),
        ("adaptive_quadbin", lambda d: adaptive_quadbin(d, cap=10_000,
                                                        max_level=8)),
    ):
        best = float("inf")
        rows = None
        for _ in range(2):
            t0 = time.time()
            rows = fn(pts).count()
            best = min(best, time.time() - t0)
        out[name] = {"sec": round(best, 3), "rows": rows,
                     "pts_per_sec": round(n / best, 1)}
    print(json.dumps(out))
    spark.stop()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
        return

    small = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    ratio = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sizes = [small, small * ratio]

    from picogeojson_spark.session import get_spark

    spark = get_spark(master="local[8]",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    paths = {}
    for n in sizes:
        p = "/tmp/cluster_scale_{}".format(n)
        if not os.path.exists(p + "/_SUCCESS"):
            _gen(spark, n, p)
        paths[n] = p
    spark.stop()

    results = {}
    for n in sizes:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", "8",
             paths[n]],
            capture_output=True, text=True, cwd=REPO, check=True,
        )
        results[n] = json.loads(r.stdout.strip().splitlines()[-1])

    small_r, big_r = results[sizes[0]], results[sizes[1]]
    report = {"sizes": results}
    for op in ("grid_dbscan", "adaptive_quadbin"):
        report[op + "_per_point_ratio_big_over_small"] = round(
            (big_r[op]["sec"] / big_r["n_points"])
            / (small_r[op]["sec"] / small_r["n_points"]), 3)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
