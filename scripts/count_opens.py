"""Counted validation of the r14 schema-cache arithmetic (verdict #8).

Wraps ``read_table`` with a counter (per-table opens, cache hits vs
footer-inference misses), runs the FULL bench via bench.main(), then
prints the tally plus a measured ms/open (schema inference timed
directly, with-schema vs infer, 20 reps each). The counter is a dict
increment — it does not perturb the bench numbers.

Usage: SPARK_GRAFT_CPUS=32 python scripts/count_opens.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pydala2_spark.sources.testdata as td  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

CALLS = {"total": 0}
MISSES = {"total": 0}
_orig = td.read_table


def counted(spark, sf_dir, name):
    CALLS["total"] += 1
    CALLS[name] = CALLS.get(name, 0) + 1
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    if key not in td._SCHEMA_CACHE:
        MISSES["total"] += 1
        MISSES[name] = MISSES.get(name, 0) + 1
    return _orig(spark, sf_dir, name)


def _patch() -> None:
    td.read_table = counted
    for m in list(sys.modules.values()):
        if getattr(m, "read_table", None) is _orig:
            m.read_table = counted


def main() -> None:
    _patch()
    import bench

    bench.main()

    # per-open inference cost, measured directly in the same session
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    path = os.path.join(SF_DIR, "orders.parquet")
    schema = spark.read.parquet(path).schema
    t0 = time.perf_counter()
    for _ in range(20):
        spark.read.parquet(path)  # footer inference, no action
    infer_ms = (time.perf_counter() - t0) / 20 * 1000
    t0 = time.perf_counter()
    for _ in range(20):
        spark.read.schema(schema).parquet(path)  # no inference
    cached_ms = (time.perf_counter() - t0) / 20 * 1000
    hits = CALLS["total"] - MISSES["total"]
    print(
        f"OPENS_JSON:{{\"calls\": {CALLS['total']}, "
        f"\"misses\": {MISSES['total']}, \"hits\": {hits}, "
        f"\"infer_ms\": {infer_ms:.1f}, \"cached_ms\": {cached_ms:.1f}, "
        f"\"saved_sec_est\": {hits * (infer_ms - cached_ms) / 1000:.1f}}}",
        file=sys.stderr,
    )
    print("per-table calls:", dict(sorted(CALLS.items())), file=sys.stderr)


if __name__ == "__main__":
    main()
