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


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _fix_event_ts(df)
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
