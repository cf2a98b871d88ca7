"""Loaders for the driver's synthetic star schema (/root/testdata/sf*).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each (TESTDATA.md).

``events.parquet`` stores TIMESTAMP(NANOS), which Spark's Parquet
reader rejects outright; with ``spark.sql.legacy.parquet.nanosAsLong``
(set in session.py) the column arrives as int64 nanoseconds and is
converted here to a microsecond timestamp — the same truncation DuckDB
applies when it casts ns → its us-precision TIMESTAMP, so oracle
comparisons agree.
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
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
