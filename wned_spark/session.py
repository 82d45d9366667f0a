"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what a cluster submit would set per-job:
AQE on (skew-join + partition coalescing — the north-rule skew answer),
Arrow enabled for pandas-UDF scoring, UTC session timezone so results
compare bit-for-bit against the DuckDB oracle.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def package_zip() -> str:
    """Zip the wned_spark package for shipping to executors — the same
    artifact a ``spark-submit --py-files`` deployment would pass."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "wned_spark_pyfiles.zip")
    with zipfile.ZipFile(out, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.join("wned_spark", os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    return out


def ship_package(spark: SparkSession) -> None:
    """Make wned_spark importable on Python workers regardless of the
    driver's cwd (UDFs unpickle module references executor-side)."""
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added in this context


def get_spark(
    app_name: str = "wned_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    At cluster scale the same confs apply; only ``master`` and memory
    sizing change. ``spark.sql.shuffle.partitions`` defaults to the
    core count locally — on a real cluster set it to ~2-3x total cores
    (AQE coalescing trims the excess at runtime).
    """
    cpus = DEFAULT_CPUS
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # AQE sizes reducer counts by DATA, not core count (default
        # 1 MB floor): small shuffles coalesce to a few chunky tasks —
        # measured faster than forcing core-count partitions, because
        # local-mode scheduling overhead scales with task count while
        # sub-50ms tasks gain nothing from extra threads. Large
        # shuffles still fan out wide.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode = driver-only: the heap serves all executor threads,
        # so size it to the machine (32 concurrent tasks on 8g thrash GC)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark
