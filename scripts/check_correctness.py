"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
Env:   GATE_MASTER (default local[8]), GATE_SHUFFLE (default engine pick) —
       run with odd values (local[7], 13) to prove results don't depend on
       parallelism/partitioning.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return v


def main():
    import duckdb

    import __spark_entry__ as entry
    from picogeojson_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    master = os.environ.get("GATE_MASTER", "local[8]")
    extra = {"spark.ui.enabled": "false"}
    spark = get_spark(
        master=master,
        shuffle_partitions=(int(os.environ["GATE_SHUFFLE"])
                            if "GATE_SHUFFLE" in os.environ else None),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            "CREATE VIEW {} AS SELECT * FROM '{}/{}.parquet'".format(t, sf_dir, t)
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_rows = df.collect()
            spark_cols = df.columns
        except Exception as e:  # noqa: BLE001
            print("FAIL {:24s} spark error: {}".format(name, e))
            failures.append(name)
            continue
        if name not in oracles:
            print("OK?  {:24s} rows={} (no oracle: rows-only)".format(name, len(spark_rows)))
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = [c.lower() for c in rel.columns]
            duck_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print("FAIL {:24s} duckdb error: {}".format(name, e))
            failures.append(name)
            continue

        sc = sorted(c.lower() for c in spark_cols)
        dc = sorted(duck_cols)
        if sc != dc:
            print("FAIL {:24s} schema: spark={} duck={}".format(name, sc, dc))
            failures.append(name)
            continue
        if len(spark_rows) != len(duck_rows):
            print(
                "FAIL {:24s} rowcount: spark={} duck={}".format(
                    name, len(spark_rows), len(duck_rows)
                )
            )
            failures.append(name)
            continue
        # order-insensitive value compare with columns sorted by name
        s_idx = [spark_cols.index(c) for c in sorted(spark_cols, key=str.lower)]
        d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
        s_set = sorted(
            tuple(canon(r[i]) for i in s_idx) for r in spark_rows
        )
        d_set = sorted(
            tuple(canon(r[i]) for i in d_idx) for r in duck_rows
        )
        if s_set != d_set:
            ndiff = sum(1 for a, b in zip(s_set, d_set) if a != b)
            print("FAIL {:24s} values: {} differing rows".format(name, ndiff))
            for a, b in list(zip(s_set, d_set))[:200]:
                if a != b:
                    print("   spark:", a)
                    print("   duck :", b)
                    break
            failures.append(name)
            continue
        print(
            "PASS {:24s} rows={:7d}  {:5.1f}s".format(
                name, len(spark_rows), time.time() - t0
            )
        )

    spark.stop()
    if failures:
        print("\nFAILED:", failures)
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()
