"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Zip this package for worker-side import (the local-mode analog of
    ``spark-submit --py-files aspublic_spark.zip``). Python workers do not
    inherit the driver's sys.path, so UDF closures referencing the package
    fail to unpickle without it."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "aspublic_spark_pkg.zip")
    with zipfile.ZipFile(out, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join("aspublic_spark", os.path.relpath(full, pkg_dir))
                    z.write(full, rel)
    return out


def ensure_package(spark: SparkSession) -> None:
    """Make the package importable on Python workers of an externally
    created SparkSession (e.g. the correctness driver's)."""
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added


def get_spark(
    app_name: str = "aspublic_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a local SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. Shuffle
    partitions default to the core count (the 200 default is wrong at
    both ends for local mode). AQE is on so skewed stages re-plan at
    runtime; on a real cluster the same config scales joins/aggs.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)
    # Deep Catalyst trees (long sessions, streaming micro-batch planning)
    # can blow the default JVM thread stack. In client/local mode driver
    # JVM options must be set BEFORE the gateway launches — conf-set
    # spark.driver.extraJavaOptions is too late — so widen the stack via
    # the submit args when this process has not started a JVM yet.
    from pyspark import SparkContext

    if SparkContext._gateway is None and "-Xss" not in os.environ.get(
        "PYSPARK_SUBMIT_ARGS", ""
    ):
        prev = os.environ.get("PYSPARK_SUBMIT_ARGS", "pyspark-shell")
        os.environ["PYSPARK_SUBMIT_ARGS"] = (
            '--driver-java-options "-Xss16m" ' + prev
        )
    # local-mode shuffle/spill dirs: prefer RAM-backed storage — the
    # sandbox's /tmp disk sustains ~350MB/s, which caps parallel write
    # scaling (a real cluster gets per-executor local SSDs instead)
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR") or (
        "/dev/shm/spark_local" if os.path.isdir("/dev/shm") else None
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # cluster path: executors get the widened stack via conf (the
        # local-mode driver gets it from PYSPARK_SUBMIT_ARGS above)
        .config("spark.executor.extraJavaOptions", "-Xss16m")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addPyFile(package_zip())
    return spark
