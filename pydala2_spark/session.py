"""SparkSession factory with scale-oriented defaults.

The reference (pydala2) tunes its engines at dataset-init time:
DuckDB ``SET THREADS=2*cpu`` + ``PRAGMA enable_object_cache``
(/root/reference/pydala/dataset.py:385-387) and Arrow scanner batch
size 131072 with readahead (/root/reference/pydala/constants.py:15-45).
Here the equivalent knobs are Spark SQL confs, chosen so the same code
runs on ``local[N]`` for tests and on a multi-executor cluster:

- AQE on (runtime coalescing, skew-join splitting) — replaces any
  hand-tuned partition count at 100 TB.
- shuffle.partitions sized to cores locally; AQE re-coalesces, and on
  a real cluster this should be ~2-3x total cores (set via submit conf).
- Arrow-accelerated Python interchange for toPandas/createDataFrame
  and Pandas UDFs.
- Parquet pushdown/pruning left at defaults (on) — these are the
  Spark-native replacement for pydala2's metadata-sidecar pruning.
- nanosAsLong: the test corpus stores TIMESTAMP(NANOS) which Spark's
  vectorized reader rejects; we read ns as long and convert in the
  loader (see sources.read_events).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))


def get_spark(
    app_name: str = "pydala2_spark",
    master: str | None = None,
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Any conf here is advisory for an existing session: Spark returns
    the active session if one exists, so tests share one JVM.
    """
    n = int(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(max(n, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # INT96 (default) carries no parquet min/max stats — µs int64
        # keeps row-group pruning and footer stats alive for timestamps
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # local-mode default is a 1g heap regardless of machine size —
        # one driver JVM hosts all N executor threads here, so size it
        # like N executors (found the hard way: a 10x-scale corpus
        # OOMed inside localCheckpoint under the 1g default). On a real
        # cluster this conf is superseded by spark-submit settings.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{n}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # runtime confs apply even when an existing session is reused
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.sparkContext.setLogLevel("ERROR")
    return spark
