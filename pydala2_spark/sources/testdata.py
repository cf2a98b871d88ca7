"""Loaders for the driver's synthetic star schema (/root/testdata/sf*).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each (TESTDATA.md).

``events.parquet`` has shipped with two physical ``ts`` encodings
across driver rounds, both normalized here to a session-UTC TIMESTAMP
so every downstream query sees one type:

- TIMESTAMP(NANOS): rejected by Spark's vectorized reader; with
  ``spark.sql.legacy.parquet.nanosAsLong`` (set in session.py) it
  arrives as int64 nanoseconds and is truncated to microseconds —
  the same truncation DuckDB applies casting ns → its us TIMESTAMP.
- TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
  TIMESTAMP_NTZ; cast to TIMESTAMP (session tz is pinned UTC, so the
  wall-clock value is preserved and DuckDB's naive TIMESTAMP agrees).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Session-scoped open-table cache: re-opening the same source parquet
# re-lists the directory and re-reads a footer for schema inference —
# ~80-105 ms per open measured at sf0.1, and a full bench run performs
# ~900 opens (278 queries x ~1.5 tables x ~2.2 passes). The cached
# object is the UNRESOLVED scan DataFrame: no rows or results are
# cached — every action still reads the parquet files — only the file
# listing + inferred schema (catalog metadata) are reused, which is
# exactly what a table catalog exists to hold. Keyed by applicationId
# so a new session never sees another session's plans, and safe for
# the corpus tables because nothing in the engine mutates sf_dir
# (side-effecting queries write to app-scoped /tmp datasets and read
# those back with fresh spark.read calls).
_OPEN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    df = _OPEN_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "events":
            df = _fix_event_ts(df)
        if len(_OPEN_CACHE) > 256:  # bound growth across many sessions
            _OPEN_CACHE.clear()
        _OPEN_CACHE[key] = df
    return df


def _fix_event_ts(df: DataFrame) -> DataFrame:
    ts_type = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields).get("ts")
    if ts_type == "bigint":  # nanosAsLong path
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":  # micros, isAdjustedToUTC=false
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
