"""SparkSession helpers + self-shipping packaging.

``get_spark`` builds a session with the engine's recommended conf; on a real
cluster the package ships via ``spark-submit --py-files picogeojson_spark.zip``
(see ``build_pyfiles_zip``); ``ensure_shipped`` is the programmatic
equivalent (``sc.addPyFile``) for sessions created without it — it closes
the "works in the repo checkout, fails on executors" gap.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_PKG_ROOT = os.path.dirname(os.path.abspath(__file__))


def build_pyfiles_zip(out_path: str = None) -> str:
    """Zip the package for ``spark-submit --py-files``. Returns the path."""
    if out_path is None:
        out_path = os.path.join(tempfile.gettempdir(), "picogeojson_spark.zip")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(_PKG_ROOT):
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.join(
                    "picogeojson_spark", os.path.relpath(full, _PKG_ROOT)
                )
                zf.write(full, rel)
    return out_path


def ensure_shipped(spark) -> None:
    """Make the package importable on executors regardless of deploy mode."""
    spark.sparkContext.addPyFile(build_pyfiles_zip())


def get_spark(
    app_name: str = "picogeojson-spark",
    master: str = None,
    shuffle_partitions: int = None,
    extra_conf: dict = None,
):
    """Opinionated session builder.

    Defaults: AQE on (runtime re-plan + skew-join), Arrow enabled for pandas
    UDF transport, shuffle partitions sized to the parallelism. ``master``
    defaults to the environment (spark-submit / existing session); pass
    ``local[N]`` for standalone runs.
    """
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 32)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        # AQE's partition coalescing optimizes shuffle IO, not CPU: with the
        # default 1 MiB floor it squeezed CPU-heavy Arrow-UDF stages (exact
        # cosine scoring over candidate pairs) onto ~5 tasks because the
        # DATA is only a few MB while the COMPUTE is seconds per MB. A 64 KiB
        # floor keeps parallelismFirst honest for small-but-hot stages; at
        # production scale post-shuffle partitions are far above either
        # floor, so this changes nothing there.
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    ensure_shipped(spark)
    return spark
