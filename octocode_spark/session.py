"""SparkSession factory tuned for the maintenance engine.

Local mode here, but every knob is chosen for multi-executor scale:
AQE (runtime coalesce + skew-join splitting), shuffle partitions sized to
cores, Arrow transfer for the vectorized UDF path, UTC session timezone so
results are oracle-comparable (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "octocode-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) then 32.
    """
    cores = int(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = int(shuffle_partitions or max(cores, 8))
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # curve-key UDFs move 3 long columns per row: big Arrow batches
        # amortize the Python round-trip
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # files.maxPartitionBytes kept at default 128MB: at 100TB that yields
        # ~800k input splits — fine for a 1000-executor cluster; locally the
        # AQE coalesce folds tiny splits back together.
        #
        # LakeTable plans scans as EXPLICIT file lists (manifests), so
        # spark.read.parquet(*1152 paths) only needs a stat per path — on a
        # local filesystem that is microseconds, but above the default
        # threshold (32 paths) Spark launches a parallel LISTING JOB whose
        # scheduling overhead is a fixed ~2.3s serial prologue on every
        # maintenance rewrite (measured; driver-side listing of the same
        # 1152 tmpfs paths is 0.27s). Local sessions therefore list on the
        # driver up to 1M paths. A remote-object-store cluster deployment
        # should lower this back (S3 round-trips per stat) — its
        # spark-submit conf wins over this factory, which only builds
        # local[*] sessions.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1000000")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
