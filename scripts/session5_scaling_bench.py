"""Scaling evidence for the fifth-session operator family.

Same two curves every family in BENCH/BASELINE.md carries:

- INPUT-SIZE leg (fixed local[8], two sizes, fresh JVM each): per-row
  cost must stay flat-or-falling.  Shapes covered: random_walks (the
  per-hop frontier-join family), rect_union_area (grouped window/
  sweep-line — group count scales, per-group occupancy fixed: the
  documented "pre-shard groups" scale path), chi2_association (the
  one-aggregate collapse family).
- PARALLELISM leg (local[2] vs local[8] on the large size): throughput
  ratio / 4 = scaling efficiency (the north-rule two-cluster-size
  substitute, per the sandbox contract).

Inputs are deterministic id-derived tables (no RNG, no external data),
generated once to /tmp and excluded from timing; each measurement runs
in its own subprocess (fresh JVM); best of two passes.

Usage: python scripts/session5_scaling_bench.py [small_n] [ratio]
       (defaults 4000000 4)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _gen_edges(spark, n, path):
    """Closed constant-degree digraph: side = n/20 nodes, outdegree 20,
    targets in the SAME id space (walks never dead-end early)."""
    from pyspark.sql import functions as F

    side = max(1000, n // 20)
    i = F.col("id")
    u = i % side
    j = F.expr("div(id, {})".format(side))
    (
        spark.range(n)
        .select(u.alias("src"),
                ((u * 7919 + j * 104729 + 1) % side).alias("dst"))
        .distinct()
        .write.mode("overwrite").parquet(path)
    )


def _gen_rects(spark, n, path):
    """Fixed per-group occupancy (500 rects, x in [0, 50k), width <=
    1200), group count scales with n — union work is linear in groups."""
    from pyspark.sql import functions as F

    i = F.col("id")
    (
        spark.range(n)
        .select(
            F.expr("div(id, 500)").alias("grp"),
            i.alias("rid"),
            ((i * 37) % 489 * 100).alias("x1"),
            ((i * 37) % 489 * 100 + 100 + (i % 12) * 100).alias("x2"),
            ((i * 53) % 489 * 100).alias("y1"),
            ((i * 53) % 489 * 100 + 100 + (i % 7) * 150).alias("y2"),
        )
        .write.mode("overwrite").parquet(path)
    )


def _gen_cats(spark, n, path):
    from pyspark.sql import functions as F

    i = F.col("id")
    (
        spark.range(n)
        .select((i % 23).cast("string").alias("a"),
                (((i % 23) * 3 + i % 5) % 17).cast("string").alias("b"))
        .write.mode("overwrite").parquet(path)
    )


def child(cores: int, edges_path: str, rects_path: str, cats_path: str):
    from picogeojson_spark.operators.graph import random_walks
    from picogeojson_spark.operators.measures import rect_union_area
    from picogeojson_spark.operators.stats import chi2_association
    from picogeojson_spark.session import get_spark

    spark = get_spark(
        master="local[{}]".format(cores),
        shuffle_partitions=2 * cores,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "16g",
                    "spark.sql.files.maxPartitionBytes": "16m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(edges_path)
    rects = spark.read.parquet(rects_path)
    cats = spark.read.parquet(cats_path)
    n_edges, n_rects, n_cats = edges.count(), rects.count(), cats.count()

    # warm plan shapes on slices (excluded from timing)
    random_walks(edges.limit(20_000), walk_length=2).count()
    rect_union_area(rects.limit(5_000)).count()
    chi2_association(cats.limit(20_000)).count()

    out = {"cores": cores, "n_edges": n_edges, "n_rects": n_rects,
           "n_cats": n_cats}

    def bench(name, fn, n_rows):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        out[name] = {"sec": round(best, 3),
                     "rows_per_sec": round(n_rows / best, 1)}

    bench("graph_walks",
          lambda: random_walks(edges, walk_length=4).count(), n_edges)
    bench("geo_union_area",
          lambda: rect_union_area(rects).agg(
              {"area": "sum"}).collect(), n_rects)
    bench("table_chi2",
          lambda: chi2_association(cats).collect(), n_cats)
    print(json.dumps(out))
    spark.stop()


def _run_child(cores, *paths):
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child",
         str(cores)] + list(paths),
        capture_output=True, text=True, cwd=REPO, check=True,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), *sys.argv[3:6])
        return

    small = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    ratio = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sizes = [small, small * ratio]

    from picogeojson_spark.session import get_spark

    spark = get_spark(master="local[8]",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    paths = {}
    for n in sizes:
        ep = "/tmp/s5_edges_{}".format(n)
        rp = "/tmp/s5_rects_{}".format(n // 8)
        cp = "/tmp/s5_cats_{}".format(n)
        if not os.path.exists(ep + "/_SUCCESS"):
            _gen_edges(spark, n, ep)
        if not os.path.exists(rp + "/_SUCCESS"):
            _gen_rects(spark, n // 8, rp)
        if not os.path.exists(cp + "/_SUCCESS"):
            _gen_cats(spark, n, cp)
        paths[n] = (ep, rp, cp)
    spark.stop()

    results = {}
    for n in sizes:
        results[n] = _run_child(8, *paths[n])
    par2 = _run_child(2, *paths[sizes[1]])

    big, small_r = results[sizes[1]], results[sizes[0]]
    report = {"sizes": sizes, "input_size": results, "local2_large": par2}
    for op in ("graph_walks", "geo_union_area", "table_chi2"):
        c_small = 1.0 / small_r[op]["rows_per_sec"]
        c_big = 1.0 / big[op]["rows_per_sec"]
        eff = big[op]["rows_per_sec"] / par2[op]["rows_per_sec"] / 4.0
        report[op] = {
            "per_row_cost_ratio_4x_input": round(c_big / c_small, 3),
            "parallelism_eff_2to8": round(eff, 3),
        }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
