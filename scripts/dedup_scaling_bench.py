"""Input-size scaling evidence for the dedup/curation family.

The pages spine has a 200k->2M throughput curve (BENCH/BASELINE.md); this
script gives the curation path the same: run ``minhash_lsh_pairs`` (the
candidates->verify LSH core) and the full ``corpus_curate`` composition
(Gopher gates -> LSH pairs -> transitive clusters -> keep-one -> hash
split -> per-split stats) over planted-duplicate corpora at two input
sizes, fixed parallelism, and report docs/sec at both. The property under
test is 100 TB-relevant: per-doc cost must stay flat-or-falling as the
input grows (fixed costs amortize; no super-linear stage).

Corpus: deterministic groups of 5 docs — one base, two near-duplicates
(first 37 of 40 words shared -> 3-gram Jaccard ~0.8, well over the 0.5
threshold), two unique. All text is md5-derived JVM-side; no RNG, no
external data.

Each measurement runs in its own subprocess (fresh JVM); best of two
passes per size. Generation and parquet write are excluded from timing.

Usage: python scripts/dedup_scaling_bench.py [small_n] [ratio]
       (defaults 50000 4 -> sizes 50k and 200k)
       python scripts/dedup_scaling_bench.py --child <parquet_path>
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
    """Planted-dup corpus: (doc_id, text, n_chars), deterministic."""
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
    ).selectExpr("doc_id", "text", "length(text) AS n_chars")


def child(path):
    from pyspark.sql import functions as F

    from picogeojson_spark.operators.dedup import (
        duplicate_clusters,
        hash_split,
        minhash_lsh_pairs,
    )
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

    # warm JVM/python workers on a slice (excluded)
    minhash_lsh_pairs(docs.limit(2000).select("doc_id", "text")).count()

    def run_lsh():
        t0 = time.time()
        n_pairs = minhash_lsh_pairs(
            docs.select("doc_id", "text"), n=3, num_hashes=16, bands=4,
            threshold=0.5).count()
        return time.time() - t0, n_pairs

    def run_curate():
        t0 = time.time()
        kept_ids = gopher_quality_flags(docs).filter(
            F.col("keep")).select("doc_id")
        kept = docs.join(kept_ids, on="doc_id")
        pairs = minhash_lsh_pairs(kept.select("doc_id", "text"), n=3,
                                  num_hashes=16, bands=4, threshold=0.5)
        drop = duplicate_clusters(pairs).filter(
            F.col("doc_id") != F.col("rep_id")).select("doc_id")
        survivors = kept.join(drop, on="doc_id", how="left_anti")
        split = hash_split(survivors, {"train": 0.8, "val": 0.1, "test": 0.1})
        out = split.groupBy("split").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_sum")).collect()
        return time.time() - t0, sum(r["n_docs"] for r in out)

    lsh = min(run_lsh(), run_lsh())
    cur = min(run_curate(), run_curate())
    spark.stop()
    print(json.dumps({
        "n_docs": n_docs,
        "lsh_secs": round(lsh[0], 3),
        "lsh_pairs": lsh[1],
        "lsh_docs_per_sec": round(n_docs / lsh[0], 1),
        "curate_secs": round(cur[0], 3),
        "curate_survivors": cur[1],
        "curate_docs_per_sec": round(n_docs / cur[0], 1),
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
        p = "/tmp/dedup_scale_{}.parquet".format(n)
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
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
        print(line, flush=True)

    a, b = results
    print("LSH per-doc scaling (docs/sec big / small): {:.2f}".format(
        b["lsh_docs_per_sec"] / a["lsh_docs_per_sec"]))
    print("curate per-doc scaling (docs/sec big / small): {:.2f}".format(
        b["curate_docs_per_sec"] / a["curate_docs_per_sec"]))


if __name__ == "__main__":
    main()
