"""DataFrame verbs — the reference's re-exported Polars helpers
(`/root/reference/pydala/helpers/polars.py:2-15`), Spark-first.

F5 ``unnest_all`` / ``explode_all``, F6 ``drop_null_columns``,
F7 ``cast_relaxed`` from SURVEY §2.8. Each compiles to built-in
Catalyst expressions; ``drop_null_columns`` is the only one that runs
a job (a single all-column aggregate — one pass even at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def unnest_all(df: DataFrame, separator: str = ".") -> DataFrame:
    """Recursively flatten every struct column into top-level columns
    named ``parent<separator>child`` (reference: fsspeckit
    ``unnest_all``, re-export `pydala/helpers/polars.py:11`)."""
    while True:
        struct_fields = [f for f in df.schema.fields if isinstance(f.dataType, T.StructType)]
        if not struct_fields:
            return df
        cols = []
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StructType):
                for sub in f.dataType.fields:
                    cols.append(
                        F.col(f"`{f.name}`.`{sub.name}`").alias(f"{f.name}{separator}{sub.name}")
                    )
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(*cols)


def explode_all(df: DataFrame, outer: bool = True) -> DataFrame:
    """Explode every array column (one at a time, left-to-right —
    matching the reference's sequential semantics; reference:
    ``explode_all``, `pydala/helpers/polars.py:6`)."""
    fn = F.explode_outer if outer else F.explode
    for f in df.schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            df = df.withColumn(f.name, fn(F.col(f.name)))
    return df


def drop_null_columns(df: DataFrame) -> DataFrame:
    """Drop columns whose every value is null (reference:
    ``drop_null_columns``, `pydala/helpers/polars.py:5`). One aggregate
    job over all columns (count pushes into the scan's column stats
    where possible)."""
    counts = df.agg(
        *[F.count(F.col(f"`{c}`")).alias(c) for c in df.columns]
    ).first()
    keep = [c for c in df.columns if (counts[c] or 0) > 0]
    return df.select(*[F.col(f"`{c}`") for c in keep])


def cast_relaxed(df: DataFrame, target: T.StructType) -> DataFrame:
    """Relaxed cast to a target schema (reference: ``cast_relaxed``,
    `pydala/helpers/polars.py:3`): missing columns become typed nulls,
    extra columns are KEPT (unlike the strict writer cast), matching
    columns are cast; uncastable combinations fall back to string."""
    existing = {f.name: f for f in df.schema.fields}
    target_names = {f.name for f in target.fields}
    cols = []
    for f in target.fields:
        if f.name in existing:
            try:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            except Exception:
                cols.append(F.col(f.name).cast("string").alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    cols += [F.col(f.name) for f in df.schema.fields if f.name not in target_names]
    return df.select(*cols)


def value_histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 20,
    group_col: str | None = None,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Fixed-width histogram of a numeric column, optionally per group:
    ``(group?, bin, bin_lo, bin_hi, n)`` with ``bins`` equal-width
    buckets over [lo, hi]. When bounds are omitted they come from the
    data via a broadcast one-row min/max frame — NO driver collect, the
    whole thing stays one lazy plan. Values at/beyond the edges clamp
    into the first/last bucket (so auto-bounds lose nothing).

    Bucket assignment is ``floor((v - lo) / w)`` in IEEE double —
    deterministic in any engine — and every aggregate combines
    map-side, so the shuffle carries |groups| x bins partial rows,
    never the corpus. Degenerate ranges (lo == hi, e.g. a constant
    column under auto-bounds) put everything in bucket 0.

    Reference analogue: none — the reference leaves analytics to its
    embedded DuckDB (`/root/reference/pydala/table.py:940-958`).
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if (lo is None) != (hi is None):
        raise ValueError("pass both lo and hi, or neither")
    v = F.col(value_col).cast("double")
    keys = [F.col(group_col)] if group_col else []
    if lo is None:
        bounds = df.agg(
            F.min(v).cast("double").alias("__lo"),
            F.max(v).cast("double").alias("__hi"),
        )
        base = df.crossJoin(F.broadcast(bounds))
        lo_c, hi_c = F.col("__lo"), F.col("__hi")
    else:
        if not hi > lo:
            raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
        base = df
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    w = (hi_c - lo_c) / F.lit(float(bins))
    raw = F.floor((v - lo_c) / w)
    bucket = F.least(
        F.lit(bins - 1), F.greatest(F.lit(0), F.coalesce(raw, F.lit(0)).cast("int"))
    )
    return (
        base.filter(v.isNotNull())
        .select(*keys, bucket.alias("bin"), lo_c.alias("__l"), w.alias("__w"))
        .groupBy(*keys, "bin")
        .agg(
            F.round(F.any_value(F.col("__l") + F.col("bin") * F.col("__w")), 4)
            .alias("bin_lo"),
            F.round(F.any_value(F.col("__l") + (F.col("bin") + 1) * F.col("__w")), 4)
            .alias("bin_hi"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    id_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Two-criteria Pareto frontier (skyline): rows for which no other
    row is at least as good on BOTH axes and strictly better on one —
    the classic "cheapest vs best" shortlist (price/quality,
    latency/recall, cost/coverage) that no single ORDER BY can
    produce.

    2-D skylines reduce to a sort + running extremum (Börzsönyi et
    al., ICDE 2001): order by (minimize asc, maximize desc, id), then
    a row survives iff its ``maximize`` strictly exceeds every
    PRECEDING row's — one window pass, no pairwise join. Duplicate
    coordinate pairs keep only the lowest id (they dominate each other
    weakly; one representative is the skyline convention here).

    100 TB shape: per group the window sorts that group's rows (one
    shuffle keyed by the group). The ungrouped form is a global sort —
    fine for dimension-sized inputs; for fact-scale skylines
    pre-filter with a coarse grid (each cell's local skyline is a
    superset pruning step) before this exact pass, or supply a
    ``group_col`` and merge per-group frontiers downstream.
    """
    from pyspark.sql import Window

    keys = [F.col(group_col)] if group_col else []
    w = Window.partitionBy(*keys).orderBy(
        F.col(minimize).asc(), F.col(maximize).desc(), F.col(id_col).asc()
    )
    prev_best = F.max(F.col(maximize)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("__pb", prev_best)
        .filter(F.col("__pb").isNull() | (F.col(maximize) > F.col("__pb")))
        .drop("__pb")
    )
