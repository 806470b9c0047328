"""Skew-handling demonstration: a hot-cell point distribution through the
PIP join, comparing the plain shuffled equi-join against the salted path
(both with AQE skew-join on). Output appended to PLANS.md by hand.

Usage: python scripts/skew_bench.py [n_points] [hot_fraction]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hot = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    from pyspark.sql import functions as F

    from picogeojson_spark.session import get_spark
    from picogeojson_spark.operators.pip_join import pip_join

    import __spark_entry__ as em

    spark = get_spark(master="local[16]", shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")

    # hot points in one ~0.04° cell (Tokyo); the rest uniform
    base = spark.range(n)
    is_hot = (F.col("id") % F.lit(int(1 / hot))) == 0
    pts = base.select(
        F.col("id").alias("point_id"),
        F.when(is_hot, 139.70 + (F.col("id") % 400).cast("double") * 1e-4)
        .otherwise(((F.col("id") * 37) % 720).cast("double") / 2 - 180 + 0.25)
        .alias("lon"),
        F.when(is_hot, 35.70 + (F.col("id") % 397).cast("double") * 1e-4)
        .otherwise(((F.col("id") * 61) % 360).cast("double") / 2 - 90 + 0.25)
        .alias("lat"),
    ).persist()
    pts.count()
    polys = em._grid_polygons(spark)

    results = {}
    for label, kwargs in [
        ("broadcast", dict(broadcast_polys=True, salt=1)),
        ("shuffle_plain", dict(broadcast_polys=False, salt=1)),
        ("shuffle_salt8", dict(broadcast_polys=False, salt=8)),
    ]:
        # warm once, then measure
        pip_join(pts.limit(1000), polys, **kwargs).count()
        t0 = time.time()
        c = pip_join(pts, polys, **kwargs).count()
        results[label] = (round(time.time() - t0, 2), c)
        print(label, results[label])

    counts = {c for _, c in results.values()}
    print("outputs identical:", len(counts) == 1)


if __name__ == "__main__":
    main()
