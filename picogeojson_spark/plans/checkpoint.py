"""Resumable partitioned execution with per-partition lineage + metrics.

North-rule contract: "resumable from per-partition checkpoints with lineage +
rows/sec metrics emitted per task".

Design (SURVEY §2.11): the input is hashed into ``buckets`` stable buckets
(``pmod(xxhash64(key), buckets)``), processed in ``waves`` of buckets. Each
wave writes its output under ``out/data/bucket=N/`` and then a marker file
``out/_done/bucket_N``; a restart lists the markers and anti-joins completed
buckets, so at most one wave of work is re-done. Every task reports
``(wave, partition_id, rows, secs)`` through an accumulator; the driver
writes ``out/_lineage/wave_N.json`` with per-task rows/sec plus the logical
plan fingerprint of the input (lineage).

Spark's own ``df.checkpoint()`` is not resumable across applications; this
is, because the markers + partitioned parquet live on durable storage.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.accumulators import AccumulatorParam
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class _ListAccum(AccumulatorParam):
    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


class ResumableJob:
    def __init__(self, spark, out_dir: str, buckets: int = 64, waves: int = 8):
        self.spark = spark
        self.out_dir = out_dir
        self.buckets = buckets
        self.waves = waves
        os.makedirs(os.path.join(out_dir, "_done"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)

    # ---- checkpoint state ------------------------------------------------
    def done_buckets(self):
        d = os.path.join(self.out_dir, "_done")
        out = set()
        for name in os.listdir(d):
            if name.startswith("bucket_"):
                out.add(int(name.split("_", 1)[1]))
        return out

    def _mark_done(self, bucket: int):
        path = os.path.join(self.out_dir, "_done", "bucket_{}".format(bucket))
        with open(path, "w") as f:
            f.write(str(time.time()))

    # ---- execution -------------------------------------------------------
    def run(self, df: DataFrame, key_col: str) -> dict:
        """Process ``df`` to partitioned parquet, resumably.

        Returns a summary dict {buckets_done_before, buckets_run, rows, secs,
        rows_per_sec}.
        """
        import pandas as pd

        sc = self.spark.sparkContext
        bucketed = df.withColumn(
            "bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(self.buckets))
        )
        done_before = self.done_buckets()
        all_buckets = [b for b in range(self.buckets) if b not in done_before]
        # idempotent resume regardless of the output committer: a wave that
        # died mid-write can have left partial files in bucket dirs that
        # never got their marker (possible with committer v2 / direct
        # committers); appending onto those would duplicate rows, so any
        # unmarked bucket directory is stale output and is removed first
        import shutil

        data_dir = os.path.join(self.out_dir, "data")
        for b in all_buckets:
            stale = os.path.join(data_dir, "bucket={}".format(b))
            if os.path.isdir(stale):
                shutil.rmtree(stale)
        per_wave = max(1, (len(all_buckets) + self.waves - 1) // self.waves)

        total_rows = 0
        t_start = time.time()
        lineage_base = {
            "input_plan": df._jdf.queryExecution().logical().toString()[:2000],
            "key_col": key_col,
            "buckets": self.buckets,
        }

        for w in range(0, len(all_buckets), per_wave):
            wave_buckets = all_buckets[w: w + per_wave]
            acc = sc.accumulator([], _ListAccum())
            wave_df = bucketed.filter(F.col("bucket").isin(wave_buckets))

            def metered(batches):
                from pyspark import TaskContext

                pid = TaskContext.get().partitionId()
                t0 = time.time()
                n = 0
                for pdf in batches:
                    n += len(pdf)
                    yield pdf
                acc.add([(pid, n, time.time() - t0)])

            out_schema = ", ".join(
                "{} {}".format(f.name, f.dataType.simpleString())
                for f in wave_df.schema.fields
            )
            metered_df = wave_df.mapInPandas(metered, schema=out_schema)
            (
                metered_df.write.mode("append")
                .partitionBy("bucket")
                .parquet(os.path.join(self.out_dir, "data"))
            )
            tasks = [
                {"partition_id": p, "rows": n, "secs": round(s, 4),
                 "rows_per_sec": round(n / s, 1) if s > 0 else None}
                for p, n, s in acc.value
            ]
            wave_rows = sum(t["rows"] for t in tasks)
            total_rows += wave_rows
            lineage = dict(lineage_base)
            lineage.update(
                {"wave_buckets": wave_buckets, "tasks": tasks, "rows": wave_rows}
            )
            wave_id = wave_buckets[0]
            with open(
                os.path.join(self.out_dir, "_lineage", "wave_{}.json".format(wave_id)),
                "w",
            ) as f:
                json.dump(lineage, f)
            for b in wave_buckets:
                self._mark_done(b)

        secs = time.time() - t_start
        return {
            "buckets_done_before": len(done_before),
            "buckets_run": len(all_buckets),
            "rows": total_rows,
            "secs": round(secs, 3),
            "rows_per_sec": round(total_rows / secs, 1) if secs > 0 else None,
        }

    def read_output(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.out_dir, "data"))
