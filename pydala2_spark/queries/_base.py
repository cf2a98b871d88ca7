"""Headline query registry — Spark implementations + DuckDB oracle SQL.

Every entry is a (spark_fn, oracle_sql) pair over the driver's synthetic
star schema (TESTDATA.md). These exercise the engine's operator
inventory (SURVEY.md §2): scans with pushdown, multi-way joins,
aggregation, windows, set-ish ops, plus the LLM-data-pipeline
extensions (dedup / text analysis / similarity search).

Determinism rules (the driver hash-compares Spark vs DuckDB values):
- every computed column is aliased identically in both dialects;
- double aggregates are ``round(x, 2..4)`` in BOTH engines so
  last-ulp summation-order differences can't flip the hash;
- no raw timestamp columns in outputs — formatted strings / epoch
  seconds / dates only (Spark's session-TZ timestamps vs DuckDB's
  naive µs would otherwise disagree in representation);
- integer aggregates are ``CAST(... AS BIGINT)`` in the oracle SQL:
  DuckDB widens ``sum()`` over integers and ``//`` to HUGEINT
  (int128) while Spark emits BIGINT, and the driver's hash compare
  is type-sensitive even when every value is identical (the two red
  rows of round 3);
- top-k queries carry a unique tiebreaker in the ORDER BY.

Scale notes are inline per query: what partitions, what broadcasts,
where the shuffle is at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pydala2_spark.sources.testdata import read_table

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], str | None]

REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec[0] for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec[1] for name, spec in REGISTRY.items() if spec[1] is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _app_scoped_tmp(spark: SparkSession, sf_dir: str, prefix: str) -> str:
    """Scratch dataset path for side-effecting queries, salted with
    the Spark applicationId so concurrent harness runs against the
    same corpus can't overwrite each other's round-trip mid-read.
    Leftovers from FINISHED runs are pruned on entry (mtime older than
    2 h — far beyond any single harness run, so a live concurrent
    app's directory is never touched), which keeps repeated bench/CI
    invocations from growing /tmp without bound."""
    import hashlib
    import os
    import shutil
    import time

    root = f"/tmp/{prefix}"
    os.makedirs(root, exist_ok=True)
    token = hashlib.md5(
        (sf_dir + ":" + spark.sparkContext.applicationId).encode()
    ).hexdigest()[:10]
    own = os.path.join(root, token)
    # Refresh OUR directory's mtime before pruning siblings: a
    # harness/bench run that outlives the prune horizon would otherwise
    # have its round-trip dataset removed mid-read by a concurrent
    # invocation's prune pass. Liveness is therefore signaled by use,
    # not by creation time.
    if os.path.isdir(own):
        try:
            os.utime(own)
        except OSError:
            pass
    cutoff = time.time() - 2 * 3600
    for d in os.listdir(root):
        p = os.path.join(root, d)
        if p == own:
            continue  # never prune the live app's own scratch
        try:
            if os.path.getmtime(p) < cutoff:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass  # concurrently removed — fine
    return own


# ---------------------------------------------------------------------
# Determinism helpers.
#
# A double-precision SUM over a shuffled dataset is order-dependent at
# the last ulp; when round() lands on a half-ulp boundary the result
# differs between engines (and between Spark runs at different
# parallelism). Accumulating in exact decimal removes the order
# dependence entirely: round the exact decimal, then cast back to
# double so both engines emit the identical float. Money columns carry
# ≤2 fractional digits, so the double→decimal(38,6) cast is itself
# exact (no tie-rounding hazard on the way in).
# ---------------------------------------------------------------------

_DEC = "decimal(38,6)"


def _dsum(expr, scale: int = 2):
    """Order-independent rounded sum: exact decimal accumulation."""
    expr = F.col(expr) if isinstance(expr, str) else expr
    return F.round(F.sum(expr.cast(_DEC)), scale).cast("double")


def _davg(expr, scale: int = 4):
    """Order-independent rounded mean: exact decimal sum, one double
    division by the non-null count (avg() semantics)."""
    expr = F.col(expr) if isinstance(expr, str) else expr
    return F.round(F.sum(expr.cast(_DEC)).cast("double") / F.count(expr), scale)


def _osum(expr: str, scale: int = 2) -> str:
    """DuckDB mirror of _dsum."""
    return f"CAST(round(sum(CAST({expr} AS DECIMAL(38,6))), {scale}) AS DOUBLE)"


def _oavg(expr: str, scale: int = 4) -> str:
    """DuckDB mirror of _davg."""
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
        f" / count({expr}), {scale})"
    )


def _srp_bucket_sql(num_planes: int, dim: int = 64) -> str:
    """DuckDB expression for similarity.srp_bucket: the hyperplanes are
    md5-derived ±1 weights, inlined as list literals — sign(dot) > 0
    reproduced exactly."""
    from pydala2_spark.operators.similarity import _proj_weight

    planes = []
    for p in range(num_planes):
        w = ", ".join(f"{_proj_weight(p, d)}.0" for d in range(dim))
        planes.append(
            f"(CASE WHEN list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ([{w}])[i])) > 0 "
            f"THEN {2 ** p} ELSE 0 END)"
        )
    return "\n             + ".join(planes)


