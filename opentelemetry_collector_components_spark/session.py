"""SparkSession factory with scale-oriented defaults.

Single place where execution knobs live so tests, bench, and the driver
contract all agree.  Tuned for correctness-vs-DuckDB comparison (UTC
timestamps) and for the 100 TB design point (AQE, skew-join handling,
Arrow batching).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "otelcol-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults are chosen for local[N] testing but every setting is the one
    we would ship on a 1000-executor cluster:

    - AQE on (runtime coalesce of small shuffle partitions, skew-join split)
    - Arrow on for all pandas UDF exchange (the reference's hot path is
      byte-batch decoding; ours is Arrow batch transfer)
    - session timezone pinned to UTC so windowed aggregates compare exactly
      against the DuckDB oracle
    """
    # SPARK_GRAFT_CPUS only shapes the DEFAULT master.  An explicit master
    # (local-cluster[...] from the scaling bench, spark:// on a real
    # cluster) is always honored — rewriting it to local[N] would
    # silently fabricate benchmark results from thread mode.
    master = master or os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # parquet scans: 128MB split target — at 100TB this yields ~800k
        # input tasks, the right granularity for 1000 executors.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or _default_shuffle(master)))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _default_shuffle(master: str) -> int:
    """local[N] -> N shuffle partitions; cluster -> 2x default parallelism
    is usually right, but we leave 256 as a sane floor for tests run
    through spark-submit."""
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 8
        try:
            return max(4, int(inner))
        except ValueError:
            return 32
    return 256
