"""Skew-mitigation primitives for heavy-key aggregations and joins.

AQE (enabled in session.py) already splits skewed SHUFFLE partitions at
runtime; these helpers cover the two places AQE cannot help:

- ``distinct_count_two_phase``: COUNT(DISTINCT x) per key shuffles every
  (key, x) pair to one reducer per key. The two-phase form dedups on
  (key, x) first — map-side partial aggregation collapses duplicates
  before the shuffle, and the second phase counts tiny groups. This is
  what Catalyst does internally for single distincts; the explicit form
  composes with multiple distinct columns (where Catalyst falls back to
  expand+single-shuffle) and makes the plan auditable.
- ``salted_join``: a hot key floods one join task. Salting splits each
  left key into ``salt`` shards and replicates the matching right rows
  across shards — turning one 10 GB task into ``salt`` even ones. Use
  when the right side is too big to broadcast but per-key replication
  is affordable; prefer AQE skew-join when it triggers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_count_two_phase(
    df: DataFrame, keys: list[str], value_col: str, alias: str = "n_distinct"
) -> DataFrame:
    """Exact per-key distinct count via dedup-then-count (two shuffles,
    both skew-tolerant thanks to map-side partials)."""
    return (
        df.select(*keys, value_col)
        .dropDuplicates([*keys, value_col])
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(alias))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the left side salted into ``salt``
    shards and the right side replicated across them.

    The left's salt is derived from a high-cardinality hash of the whole
    row (deterministic, no rand()), so one hot key spreads over
    ``salt`` tasks; the right side explodes ×salt — size it accordingly.
    """
    l = left.withColumn("__salt", F.pmod(F.hash(*left.columns), F.lit(salt)))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")
