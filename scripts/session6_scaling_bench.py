"""Scaling evidence for the sixth-session operator families.

Same two curves every family in BENCH/BASELINE.md carries:

- INPUT-SIZE leg (fixed local[8], two sizes, fresh JVM each): per-row
  cost must stay flat-or-falling.  Shapes covered:
  * containment_pairs — the one-sided prefix ⋈ postings join family
    (group-local vocab: groups scale, per-group occupancy fixed — the
    documented pre-shard path, shingle df bounded by group size);
  * closeness_sample — the (seed,node)-pair BFS frontier family on a
    constant-degree graph (per-seed reach bounded by deg^hops, seed
    count scales linearly with nodes);
  * rolling_active_users — the bounded-sequence-explode rollup family;
  * ams_f2 — the one-aggregate collapse family (k conditional sums).
- PARALLELISM leg (local[2] vs local[8] on the large size): throughput
  ratio / 4 = scaling efficiency (the north-rule two-cluster-size
  substitute, per the sandbox contract).

Inputs are deterministic id-derived tables (no RNG, no external data),
generated once to /tmp and excluded from timing; each measurement runs
in its own subprocess (fresh JVM); best of two passes.

Usage: python scripts/session6_scaling_bench.py [small_n] [ratio]
       (defaults 1000000 4; docs/edges/events derive their own sizes)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _gen_docs(spark, n_docs, path):
    """Groups of 20 docs sharing a group-local 40-token vocabulary:
    12 tokens per doc, one doc-specific perturbation — containment
    candidates exist inside every group, shingle df <= group size."""
    from pyspark.sql import functions as F

    i = F.col("id")
    grp = F.expr("div(id, 20)")
    toks = F.concat_ws(" ", *[
        F.concat(F.lit("g"), grp.cast("string"), F.lit("w"),
                 F.when(i % 12 == j, (i % 7).cast("string"))
                 .otherwise(((grp * 31 + j * 7) % 40).cast("string")))
        for j in range(12)
    ])
    (
        spark.range(n_docs)
        .select(i.alias("doc_id"), toks.alias("text"))
        .write.mode("overwrite").parquet(path)
    )


def _gen_edges(spark, n, path):
    """Closed constant-degree digraph (session5 generator): per-seed
    BFS reach is bounded by deg^hops regardless of graph size."""
    from pyspark.sql import functions as F

    side = max(1000, n // 20)
    i = F.col("id")
    u = i % side
    j = F.expr("div(id, {})".format(side))
    (
        spark.range(n)
        .select(u.alias("u"),
                ((u * 7919 + j * 104729 + 1) % side).alias("v"))
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .write.mode("overwrite").parquet(path)
    )


def _gen_events(spark, n, path):
    from pyspark.sql import functions as F

    i = F.col("id")
    (
        spark.range(n)
        .select((i % F.lit(max(50, n // 50))).alias("user_id"),
                ((i * 7) % 60).alias("day_id"))
        .write.mode("overwrite").parquet(path)
    )


def _gen_keys(spark, n, path):
    from pyspark.sql import functions as F

    i = F.col("id")
    (
        spark.range(n)
        .select(F.when(i % 5 == 0, F.lit(0))
                .otherwise(i % F.lit(max(10, n // 10))).alias("key"))
        .write.mode("overwrite").parquet(path)
    )


def child(cores: int, docs_p, edges_p, events_p, keys_p):
    from pyspark.sql import functions as F

    from picogeojson_spark.operators.cohort import rolling_active_users
    from picogeojson_spark.operators.dedup import containment_pairs
    from picogeojson_spark.operators.graph import closeness_sample
    from picogeojson_spark.operators.sketches import ams_f2
    from picogeojson_spark.session import get_spark

    spark = get_spark(
        master="local[{}]".format(cores),
        shuffle_partitions=2 * cores,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "16g",
                    "spark.sql.files.maxPartitionBytes": "16m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(docs_p)
    edges = spark.read.parquet(edges_p)
    events = spark.read.parquet(events_p)
    keys = spark.read.parquet(keys_p)
    n_docs, n_edges = docs.count(), edges.count()
    n_events, n_keys = events.count(), keys.count()

    # warm plan shapes on slices (excluded from timing)
    containment_pairs(docs.limit(2_000)).count()
    seeds_small = edges.limit(1000).select(F.col("u").alias("seed"))
    closeness_sample(edges.limit(20_000), seeds_small.limit(50),
                     max_hops=2).count()
    rolling_active_users(events.limit(20_000)).count()
    ams_f2(keys.limit(20_000)).collect()

    out = {"cores": cores, "n_docs": n_docs, "n_edges": n_edges,
           "n_events": n_events, "n_keys": n_keys}

    def bench(name, fn, n_rows):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        out[name] = {"sec": round(best, 3),
                     "rows_per_sec": round(n_rows / best, 1)}

    seeds = (
        edges.select(F.col("u").alias("seed"))
        .union(edges.select(F.col("v").alias("seed")))
        .distinct().filter(F.col("seed") % 97 == 0)
    )
    bench("dedup_containment",
          lambda: containment_pairs(docs, n=3, t_num=7, t_den=10).count(),
          n_docs)
    bench("graph_closeness",
          lambda: closeness_sample(edges, seeds, max_hops=3).count(),
          n_edges)
    bench("events_wau",
          lambda: rolling_active_users(events).count(), n_events)
    bench("sketch_ams",
          lambda: ams_f2(keys, k=16).collect(), n_keys)
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
        child(int(sys.argv[2]), *sys.argv[3:7])
        return

    small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ratio = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sizes = [small, small * ratio]

    from picogeojson_spark.session import get_spark

    spark = get_spark(master="local[8]",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    paths = {}
    for n in sizes:
        dp = "/tmp/s6_docs_{}".format(n // 8)
        ep = "/tmp/s6_edges_{}".format(n)
        vp = "/tmp/s6_events_{}".format(n)
        kp = "/tmp/s6_keys_{}".format(n)
        if not os.path.exists(dp + "/_SUCCESS"):
            _gen_docs(spark, n // 8, dp)
        if not os.path.exists(ep + "/_SUCCESS"):
            _gen_edges(spark, n, ep)
        if not os.path.exists(vp + "/_SUCCESS"):
            _gen_events(spark, n, vp)
        if not os.path.exists(kp + "/_SUCCESS"):
            _gen_keys(spark, n, kp)
        paths[n] = (dp, ep, vp, kp)
    spark.stop()

    results = {}
    for n in sizes:
        results[n] = _run_child(8, *paths[n])
    par2 = _run_child(2, *paths[sizes[1]])

    big, small_r = results[sizes[1]], results[sizes[0]]
    report = {"sizes": sizes, "input_size": results, "local2_large": par2}
    for op in ("dedup_containment", "graph_closeness", "events_wau",
               "sketch_ams"):
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
