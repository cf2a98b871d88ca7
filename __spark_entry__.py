"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — the engine's operator inventory,
implemented in :mod:`pydala2_spark.queries` (Spark) with matching
DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _prepare(spark: SparkSession) -> None:
    # events.parquet stores TIMESTAMP(NANOS); Spark needs this conf to
    # read it (as int64 ns — converted in the loader).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Arrow batch transfer for the few driver-side handoffs (kcore
    # finish, union-find finish): runtime conf, safe to set post-boot
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Spark's default timestamp parquet encoding is INT96, which
    # carries NO footer min/max stats — in-query writes would land
    # files invisible to stats-driven planners (M2) and row-group
    # pruning. µs int64 keeps footer stats alive; runtime conf, safe
    # to set post-boot (r13 driver red m2_compact_timeperiod_roundtrip).
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _prepare(spark)
    from pydala2_spark.queries import queries as _queries

    return _queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pydala2_spark.queries import queries as _queries

    out = {}
    for name, fn in _queries().items():

        def wrapped(spark: SparkSession, sf_dir: str, _fn=fn) -> DataFrame:
            _prepare(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column aliases)."""
    from pydala2_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
