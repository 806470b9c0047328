"""Hilbert vs Z-order (Morton) layout: REAL parquet footer-stats pruning.

VERDICT round-4 stretch #9: the honest window-bbox-semiperimeter metric
lives in tests/test_hilbert.py; this surfaces the end metric a layout
choice actually buys — for the SAME point set written (a) ingest-order,
(b) z-ordered, (c) hilbert-ordered, how many parquet row groups does a
bbox scan touch, judged purely from footer min/max stats (the check a
pruning reader performs)?  Results -> BENCH/BASELINE.md "Layout pruning:
Hilbert vs Z-order".

Points are deterministic (md5-hash lattice, no RNG); bboxes sweep sizes
from ~0.2% to ~25% of the domain area at fixed offsets.

Usage: python scripts/layout_pruning_bench.py [n_points]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyarrow.parquet as pq  # noqa: E402


def row_groups_touching(path, lon_rng, lat_rng):
    """(touched, total) row groups whose footer lon/lat min/max intersect
    the bbox — exactly the footer-stats test a pruning scan performs."""
    touched = total = 0
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            total += 1
            slon = rg.column(names["lon"]).statistics
            slat = rg.column(names["lat"]).statistics
            if (slon.min <= lon_rng[1] and slon.max >= lon_rng[0]
                    and slat.min <= lat_rng[1] and slat.max >= lat_rng[0]):
                touched += 1
    return touched, total


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from picogeojson_spark.operators.layout import (
        write_hilbert_ordered,
        write_zordered,
    )
    from picogeojson_spark.session import get_spark

    spark = get_spark(
        master="local[{}]".format(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic scatter over [-180,180) x [-90,90): md5-derived, no RNG
    pts = spark.range(n).selectExpr(
        "id",
        "(conv(substring(md5(concat('lon-', id)), 1, 7), 16, 10) % 3600000)"
        " / 10000.0 - 180.0 AS lon",
        "(conv(substring(md5(concat('lat-', id)), 1, 7), 16, 10) % 1800000)"
        " / 10000.0 - 90.0 AS lat",
    )

    base = "/tmp/layout_prune_ingest.parquet"
    zp = "/tmp/layout_prune_z.parquet"
    hp = "/tmp/layout_prune_h.parquet"
    files = max(8, n // 125_000)
    pts.repartition(files).write.mode("overwrite").parquet(base)
    src = spark.read.parquet(base)
    write_zordered(src, zp, "lon", "lat", bits=16, num_files=files)
    write_hilbert_ordered(src, hp, "lon", "lat", bits=16, num_files=files)

    # row-count identity across the three layouts
    counts = [spark.read.parquet(p).count() for p in (base, zp, hp)]
    assert counts[0] == counts[1] == counts[2] == n, counts

    print("| bbox (% of domain area) | ingest touched | z-order | hilbert |"
          " total RGs |")
    print("|---|---|---|---|---|")
    rows = []
    for frac, lon0, lat0 in ((0.002, 12.0, 23.0), (0.01, -77.0, -10.0),
                             (0.05, 100.0, 40.0), (0.25, -140.0, -60.0)):
        w = 360.0 * (frac ** 0.5)
        h = 180.0 * (frac ** 0.5)
        bbox = ((lon0, lon0 + w), (lat0, lat0 + h))
        t_i, tot = row_groups_touching(base, *bbox)
        t_z, _ = row_groups_touching(zp, *bbox)
        t_h, _ = row_groups_touching(hp, *bbox)
        rows.append({"frac": frac, "ingest": t_i, "zorder": t_z,
                     "hilbert": t_h, "total": tot})
        print("| {:.1%} | {} | {} | {} | {} |".format(
            frac, t_i, t_z, t_h, tot))
    print(json.dumps({"n_points": n, "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
