"""End-to-end 100 TB-shape composition: the FULL training-data pipeline
(quality gates -> LSH near-dup removal -> leakage-safe split -> n-gram
decontamination -> temperature source balancing -> token-budget shard
packing) measured as ONE lazy plan at two input sizes.

The families each have input-size curves (dedup_scaling_bench,
cluster_scaling_bench, geo_scaling_bench, newops_scaling_bench); this
script proves the property COMPOSES: per-doc cost of the whole pipeline —
every stage chained lazily, one terminal aggregate — must stay
flat-or-falling at 4x input (fixed costs amortize, no super-linear stage,
no stage whose intermediate materializes beyond its own operator's
documented checkpoints). Results -> BENCH/BASELINE.md "Full-composition
input-size scaling".

Corpus: the dedup bench's planted-duplicate generator (deterministic
md5 text, groups of 5 with 2 near-dups) extended with a skewed source
column (60/25/10/5) so temperature balancing has real head/tail work.

Each measurement runs in its own subprocess (fresh JVM); best of two
passes per size; generation/parquet write excluded from timing.

Usage: python scripts/composition_bench.py [small_n] [ratio]
       (defaults 50000 4 -> sizes 50k and 200k)
       python scripts/composition_bench.py --child <parquet_path>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_docs(spark, n):
    """Planted-dup corpus + skewed source mix, deterministic (no RNG)."""
    return spark.range(n).selectExpr(
        "id AS doc_id",
        """
        concat(
          array_join(transform(sequence(1, 37),
            i -> substring(md5(concat(
                   CASE WHEN id % 5 IN (1, 2)
                        THEN cast(floor(id / 5) * 5 as string)
                        ELSE cast(id as string) END, '-w-', i)), 1, 6)), ' '),
          ' ',
          array_join(transform(sequence(38, 40),
            i -> substring(md5(concat(cast(id as string), '-t-', i)), 1, 6)),
            ' ')
        ) AS text
        """,
        """
        CASE WHEN id % 20 < 12 THEN 'web'
             WHEN id % 20 < 17 THEN 'books'
             WHEN id % 20 < 19 THEN 'code'
             ELSE 'wiki' END AS source
        """,
    ).selectExpr("doc_id", "text", "source", "length(text) AS n_chars")


def child(path):
    from pyspark.sql import functions as F

    from picogeojson_spark.operators.dedup import (
        contamination_flags,
        duplicate_clusters,
        hash_split,
        minhash_lsh_pairs,
    )
    from picogeojson_spark.operators.packing import pack_token_shards
    from picogeojson_spark.operators.sampling import temperature_sample
    from picogeojson_spark.operators.textstats import gopher_quality_flags
    from picogeojson_spark.session import get_spark

    spark = get_spark(
        master="local[{}]".format(CORES),
        shuffle_partitions=CORES,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(path)
    n_docs = docs.count()

    # warm JVM/python workers on a slice (excluded from timing)
    minhash_lsh_pairs(docs.limit(2000).select("doc_id", "text")).count()

    def run_pipeline():
        t0 = time.time()
        # 1. quality gates
        kept_ids = gopher_quality_flags(docs).filter(
            F.col("keep")).select("doc_id")
        kept = docs.join(kept_ids, on="doc_id")
        # 2. near-dup removal (LSH candidates -> verify -> components)
        pairs = minhash_lsh_pairs(kept.select("doc_id", "text"), n=3,
                                  num_hashes=16, bands=4, threshold=0.5)
        drop = duplicate_clusters(pairs).filter(
            F.col("doc_id") != F.col("rep_id")).select("doc_id")
        survivors = kept.join(drop, on="doc_id", how="left_anti")
        # 3. leakage-safe split; the test slice doubles as the benchmark
        split = hash_split(survivors,
                           {"train": 0.8, "val": 0.1, "test": 0.1})
        train = split.filter(F.col("split") == "train").drop("split")
        bench = split.filter(F.col("split") == "test").drop("split")
        # 4. n-gram decontamination of train vs the held-out slice
        dirty = contamination_flags(train, bench, n=8).filter(
            F.col("contaminated")).select("doc_id")
        clean = train.join(dirty, on="doc_id", how="left_anti")
        # 5. temperature source balancing (alpha=0.5 head flattening)
        balanced = temperature_sample(clean, source_col="source")
        # 6. token-budget shard packing + terminal rollup
        packed = pack_token_shards(balanced, budget=200_000)
        out = packed.groupBy().agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("shard_id").alias("n_shards"),
            F.sum("weight").cast("long").alias("chars_sum")).collect()[0]
        return time.time() - t0, out["n_docs"], out["n_shards"]

    best = min(run_pipeline(), run_pipeline())
    spark.stop()
    print(json.dumps({
        "n_docs": n_docs,
        "pipeline_secs": round(best[0], 3),
        "packed_docs": best[1],
        "shards": best[2],
        "docs_per_sec": round(n_docs / best[0], 1),
    }))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    ratio = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from picogeojson_spark.session import get_spark

    spark = get_spark(master="local[{}]".format(CORES),
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")
    paths = []
    for n in (small, small * ratio):
        p = "/tmp/composition_scale_{}.parquet".format(n)
        make_docs(spark, n).repartition(CORES).write.mode(
            "overwrite").parquet(p)
        paths.append((n, p))
    spark.stop()

    results = []
    for n, p in paths:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", p],
            capture_output=True, text=True, cwd=REPO,
            env={**os.environ, "PYTHONPATH": REPO},
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(out.stdout[-2000:], out.stderr[-2000:])
            sys.exit(1)
        results.append(json.loads(lines[-1]))
        print(lines[-1], flush=True)

    a, b = results
    print("full-composition per-doc scaling (docs/sec big / small): "
          "{:.2f}".format(b["docs_per_sec"] / a["docs_per_sec"]))


if __name__ == "__main__":
    main()
