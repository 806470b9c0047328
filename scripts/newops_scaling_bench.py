"""Scaling evidence for the round-4 fourth-continuation operator family.

Gives the session's heavyweight additions the same two curves every
other family in BENCH/BASELINE.md has:

- INPUT-SIZE leg (fixed local[8], two sizes, fresh JVM each): per-row
  cost must stay flat-or-falling — kmeans is O(rounds * n * k) with
  k-group aggregates, link prediction is wedge-join + node-sized joins,
  the Hilbert key is a pure-codegen scan expression;
- PARALLELISM leg (local[2] vs local[8] on the large size): throughput
  ratio / 4 = scaling efficiency (the north-rule criterion, evidenced at
  two parallelism levels per the sandbox's two-cluster-size substitute).

Inputs are deterministic id-derived tables (no RNG, no external data),
generated once to /tmp and excluded from timing. Each measurement runs
in its own subprocess (fresh JVM); best of two passes.

Usage: python scripts/newops_scaling_bench.py [small_n] [ratio]
       (defaults 8000000 4 -> 8M- and 32M-row point tables; the edge
        table scales at n/8 with constant degree 20, so wedge fan-out
        grows linearly with input.  Sizes chosen so even the fastest op
        runs multiple seconds at local[8] — smaller inputs are fixed-
        overhead-dominated and parallelism reads collapse, the
        documented 200k-size caveat in BENCH/BASELINE.md)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SEEDS = [((j * 20 - 70) * 10**6, (j * 40 - 140) * 10**6) for j in range(8)]


def _gen_points(spark, n, path):
    from pyspark.sql import functions as F

    i = F.col("id")
    (
        spark.range(n)
        .select(
            ((i * 61) % 360_000_000 - 90_000_000).alias("lat_u"),
            ((i * 37) % 720_000_000 - 180_000_000).alias("lon_u"),
        )
        .write.mode("overwrite").parquet(path)
    )


def _gen_edges(spark, n, path):
    """Bipartite constant-degree graph: exactly n distinct edges, degree
    20 on the u side (j = i div side walks 20 distinct v's per u — the
    stride is coprime with side for these sizes), so wedge fan-out is
    ~40n (linear in input)."""
    from pyspark.sql import functions as F

    i = F.col("id")
    side = max(1000, n // 20)
    u = i % side
    j = F.expr("div(id, {})".format(side))
    (
        spark.range(n)
        .select(
            (u + 1).alias("u"),
            (side + 1 + (u * 7919 + j * 104730) % side).alias("v"),
        )
        .distinct()
        .write.mode("overwrite").parquet(path)
    )


def child(cores: int, pts_path: str, edges_path: str):
    from pyspark.sql import functions as F

    from picogeojson_spark.operators.graph import link_prediction
    from picogeojson_spark.operators.layout import hilbert_key
    from picogeojson_spark.operators.spatial_cluster import kmeans_points
    from picogeojson_spark.session import get_spark

    spark = get_spark(
        master="local[{}]".format(cores),
        shuffle_partitions=2 * cores,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "16g",
                    # two-long-column tables compress so well that the
                    # default 128m split sizing caps the scan at ~4 tasks
                    # — size splits so parallelism measures compute, not
                    # split-count artifacts
                    "spark.sql.files.maxPartitionBytes": "16m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    pts = spark.read.parquet(pts_path)
    edges = spark.read.parquet(edges_path)
    n_pts, n_edges = pts.count(), edges.count()

    # warm plan shapes on slices (excluded from timing)
    kmeans_points(pts.limit(20_000), seeds=SEEDS, rounds=1).count()
    link_prediction(edges.limit(20_000)).count()
    pts.limit(20_000).select(
        hilbert_key(F.col("lon_u") / 1e6, F.col("lat_u") / 1e6, 16)
        .alias("h")).agg(F.sum("h")).count()

    out = {"cores": cores, "n_pts": n_pts, "n_edges": n_edges}

    def bench(name, fn, n_rows):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        out[name] = {"sec": round(best, 3),
                     "rows_per_sec": round(n_rows / best, 1)}

    bench("geo_kmeans",
          lambda: kmeans_points(pts, seeds=SEEDS, rounds=4).count(),
          n_pts)
    bench("graph_linkpred",
          lambda: link_prediction(edges).count(), n_edges)
    # agg(sum) forces the key for every row (a bare count() would let
    # Catalyst prune the column away)
    bench("geo_hilbert",
          lambda: pts.select(
              hilbert_key(F.col("lon_u") / 1e6, F.col("lat_u") / 1e6, 16)
              .alias("h")).agg(F.sum("h")).collect(),
          n_pts)
    print(json.dumps(out))
    spark.stop()


def _run_child(cores, pts_path, edges_path):
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child",
         str(cores), pts_path, edges_path],
        capture_output=True, text=True, cwd=REPO, check=True,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return

    small = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    ratio = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sizes = [small, small * ratio]

    from picogeojson_spark.session import get_spark

    spark = get_spark(master="local[8]",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    paths = {}
    for n in sizes:
        pp = "/tmp/newops_pts_{}".format(n)
        ep = "/tmp/newops_edges_{}".format(n // 8)
        if not os.path.exists(pp + "/_SUCCESS"):
            _gen_points(spark, n, pp)
        if not os.path.exists(ep + "/_SUCCESS"):
            _gen_edges(spark, n // 8, ep)
        paths[n] = (pp, ep)
    spark.stop()

    results = {}
    for n in sizes:
        results[n] = _run_child(8, *paths[n])
    # parallelism leg on the large size
    par2 = _run_child(2, *paths[sizes[1]])

    big, small_r = results[sizes[1]], results[sizes[0]]
    report = {"sizes": sizes, "input_size": results, "local2_large": par2}
    for op in ("geo_kmeans", "graph_linkpred", "geo_hilbert"):
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
