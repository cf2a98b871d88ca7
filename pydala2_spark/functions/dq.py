"""Data-quality audits: referential-integrity orphan counts and a
Benford first-digit conformance test — the checks a warehouse runs
against a freshly landed fact table before anything downstream trusts
it.

Reference analogue: none — the reference leaves analytics to its
embedded DuckDB (`/root/reference/pydala/table.py:940-958`); these sit
beside :func:`pydala2_spark.functions.schema_tools.profile_dataframe`
as the table-health surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,6)"


def fk_orphan_report(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit: for each ``(name, fact, fk, dim,
    pk)`` relation, count fact rows whose (non-null) foreign key has no
    match in the dimension. Output one row per relation:
    ``(relation, n_rows, n_orphans, orphan_pct)``.

    NULL foreign keys are not orphans (they are the profile's
    ``n_null`` problem, not a dangling reference).

    100 TB shape: each relation is one LEFT ANTI join on the key —
    Catalyst broadcasts the deduped dimension key set when small
    (always, for real dimensions), so the fact side streams without a
    shuffle; the count collapses map-side. Relations union as
    single-row frames — no driver collect.
    """
    if not relations:
        raise ValueError("relations must be non-empty")
    outs = []
    for name, fact, fk, dim, pk in relations:
        keys = dim.select(F.col(pk).alias("__pk")).distinct()
        nonnull = fact.filter(F.col(fk).isNotNull())
        orphans = nonnull.join(
            F.broadcast(keys), nonnull[fk] == F.col("__pk"), "left_anti"
        )
        o = orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
        n = fact.agg(F.count(F.lit(1)).alias("n_rows"))
        outs.append(
            n.crossJoin(F.broadcast(o)).select(
                F.lit(name).alias("relation"),
                "n_rows",
                "n_orphans",
                F.round(
                    F.col("n_orphans") * 100.0 / F.col("n_rows"), 4
                ).alias("orphan_pct"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def benford_report(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-significant-digit audit over a positive
    numeric column: observed count per digit 1-9 next to the Benford
    expectation ``n * log10(1 + 1/d)``, plus the chi-square statistic
    (repeated per row — one test, nine cells). Fabricated or
    unit-capped figures jump off this report; naturally spanning
    magnitudes (prices, populations, trade volumes) hug it.

    The digit extracts from the rounded string form (JVM regexp — no
    float log10 near a power-of-ten boundary); expectations use
    driver-computed log10 literals; the chi-square folds per-digit
    terms through a DECIMAL sum so cell order cannot move a bit.

    100 TB shape: one scan-stage digit projection + one 9-group
    map-side-combining count; everything after runs on 9 rows.
    """
    digit = F.regexp_extract(
        F.round(F.abs(F.col(value_col)), 2).cast("string"), "([1-9])", 1
    )
    counts = (
        df.filter(F.col(value_col).isNotNull() & (F.abs(F.col(value_col)) > 0))
        .select(digit.cast("int").alias("digit"))
        .filter(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    total = counts.agg(F.sum("n_obs").alias("__n"))
    p = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}
    p_expr = F.element_at(
        F.array(*[F.lit(p[d]) for d in range(1, 10)]), F.col("digit")
    )
    w = counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n_obs",
        F.round(F.col("__n") * p_expr, 2).alias("expected_n"),
        F.round(
            (F.col("n_obs") - F.col("__n") * p_expr)
            * (F.col("n_obs") - F.col("__n") * p_expr)
            / (F.col("__n") * p_expr),
            6,
        ).alias("__term"),
    )
    chi2 = w.agg(
        F.round(F.sum(F.col("__term").cast(_DEC)), 4).cast("double").alias("chi2")
    )
    return (
        w.crossJoin(F.broadcast(chi2))
        .select("digit", "n_obs", "expected_n", "chi2")
    )
