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


# -- declarative rulesets ----------------------------------------------

_RULE_KINDS = ("not_null", "unique", "range", "in_set", "regex", "expr")


def _rule_name(r: dict) -> str:
    if "name" in r:
        return str(r["name"])
    kind = r["rule"]
    if kind == "unique":
        return f"unique({', '.join(r['cols'])})"
    if kind == "expr":
        return f"expr({r['predicate']})"
    return f"{kind}({r['col']})"


def validate_rules(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Great-Expectations-style declarative data-quality run: evaluate
    a RULESET against the frame in ONE aggregation pass and return one
    row per rule — ``(rule, n_rows, n_violations, violation_pct)``.

    Rule shapes (dicts; optional ``"name"`` overrides the label):

    - ``{"rule": "not_null", "col": c}`` — NULL values violate.
    - ``{"rule": "unique", "cols": [c, ...]}`` — violations = rows with
      fully-non-null keys in excess of one per distinct key (rows with
      a NULL key component are not_null's problem, not duplicates).
    - ``{"rule": "range", "col": c, "min": lo, "max": hi}`` (either
      bound optional) — non-NULL values outside [lo, hi] violate.
    - ``{"rule": "in_set", "col": c, "values": [...]}`` — non-NULL
      values outside the set violate.
    - ``{"rule": "regex", "col": c, "pattern": p}`` — non-NULL values
      NOT matching (RE2-style, unanchored) violate.
    - ``{"rule": "expr", "predicate": sql}`` — rows where the SQL
      predicate is NOT TRUE violate (write dialect-portable SQL if the
      ruleset must mirror into an oracle).

    NULL convention: every per-value rule passes NULLs through —
    ``not_null`` is the one place nullness is judged, so a single bad
    row doesn't double-count across the ruleset.

    Reference analogue: none (the reference has no validation
    surface); sits beside fk_orphan_report/benford_report.

    100 TB shape: every row-level rule compiles to a conditional sum
    in ONE map-side-combined aggregate over a single scan — adding a
    rule adds a column, not a pass. ``unique`` rules add their
    count(DISTINCT struct) to the same aggregate (Catalyst plans the
    distinct expansion; still one scan of the input). The one-row
    aggregate then unpivots to |rules| rows driver-free.
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(rules):
        kind = r.get("rule")
        if kind not in _RULE_KINDS:
            raise ValueError(f"unknown rule kind: {kind!r}")
        if kind == "not_null":
            bad = F.col(r["col"]).isNull()
        elif kind == "unique":
            cols = r["cols"]
            nn = F.struct(*[F.col(c) for c in cols])
            all_nn = None
            for c in cols:
                p = F.col(c).isNotNull()
                all_nn = p if all_nn is None else (all_nn & p)
            aggs.append(
                (
                    F.sum(F.when(all_nn, 1).otherwise(0))
                    - F.count_distinct(
                        F.when(all_nn, nn)
                    )
                ).alias(f"__v{i}")
            )
            continue
        elif kind == "range":
            c = F.col(r["col"])
            conds = []
            if "min" in r:
                conds.append(c < F.lit(r["min"]))
            if "max" in r:
                conds.append(c > F.lit(r["max"]))
            if not conds:
                raise ValueError("range rule needs min and/or max")
            out = conds[0]
            for x in conds[1:]:
                out = out | x
            bad = c.isNotNull() & out
        elif kind == "in_set":
            c = F.col(r["col"])
            bad = c.isNotNull() & ~c.isin(list(r["values"]))
        elif kind == "regex":
            c = F.col(r["col"])
            bad = c.isNotNull() & ~c.rlike(r["pattern"])
        else:  # expr
            bad = ~F.coalesce(F.expr(r["predicate"]), F.lit(False))
        aggs.append(F.sum(F.when(bad, 1).otherwise(0)).alias(f"__v{i}"))
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(_rule_name(r)).alias("rule"),
                F.col(f"__v{i}").cast("long").alias("v"),
            )
            for i, r in enumerate(rules)
        ]
    )
    return (
        one.select(F.col("__n"), F.explode(entries).alias("e"))
        .select(
            F.col("e.rule").alias("rule"),
            F.col("__n").cast("long").alias("n_rows"),
            F.col("e.v").alias("n_violations"),
            F.round(F.col("e.v") * 100.0 / F.col("__n"), 4).alias(
                "violation_pct"
            ),
        )
    )


def rules_oracle_sql(table_sql: str, rules: list[dict]) -> str:
    """DuckDB SQL reproducing :func:`validate_rules` exactly (one
    conditional-sum aggregate + unpivot via UNION ALL). Regex rules
    map to ``regexp_matches`` (unanchored, like Spark ``rlike``);
    ``expr`` predicates are passed through verbatim, so use
    dialect-portable SQL there."""
    if not rules:
        raise ValueError("rules must be non-empty")

    def lit(v) -> str:
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(v)

    vs = []
    for i, r in enumerate(rules):
        kind = r["rule"]
        if kind == "not_null":
            e = f"sum(CASE WHEN {r['col']} IS NULL THEN 1 ELSE 0 END)"
        elif kind == "unique":
            cols = r["cols"]
            nn = " AND ".join(f"{c} IS NOT NULL" for c in cols)
            row = ", ".join(cols)
            e = (
                f"(sum(CASE WHEN {nn} THEN 1 ELSE 0 END) - "
                f"count(DISTINCT CASE WHEN {nn} THEN ROW({row}) END))"
            )
        elif kind == "range":
            c = r["col"]
            conds = []
            if "min" in r:
                conds.append(f"{c} < {lit(r['min'])}")
            if "max" in r:
                conds.append(f"{c} > {lit(r['max'])}")
            e = (
                f"sum(CASE WHEN {c} IS NOT NULL AND "
                f"({' OR '.join(conds)}) THEN 1 ELSE 0 END)"
            )
        elif kind == "in_set":
            c = r["col"]
            vals = ", ".join(lit(v) for v in r["values"])
            e = (
                f"sum(CASE WHEN {c} IS NOT NULL AND {c} NOT IN ({vals}) "
                f"THEN 1 ELSE 0 END)"
            )
        elif kind == "regex":
            c = r["col"]
            e = (
                f"sum(CASE WHEN {c} IS NOT NULL AND NOT "
                f"regexp_matches({c}, {lit(r['pattern'])}) "
                f"THEN 1 ELSE 0 END)"
            )
        else:
            e = (
                f"sum(CASE WHEN ({r['predicate']}) IS NOT TRUE "
                f"THEN 1 ELSE 0 END)"
            )
        vs.append(f"{e} AS v{i}")
    names = "\n    UNION ALL ".join(
        f"SELECT {lit(_rule_name(r))} AS rule, n_rows, "
        f"CAST(v{i} AS BIGINT) AS n_violations, "
        f"round(v{i} * 100.0 / n_rows, 4) AS violation_pct FROM a"
        for i, r in enumerate(rules)
    )
    return (
        f"WITH a AS (SELECT count(*) AS n_rows, {', '.join(vs)} "
        f"FROM ({table_sql}))\n    {names}"
    )


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l: int = 2,
) -> DataFrame:
    """Re-identification risk audit before a dataset is shared:
    k-anonymity over the quasi-identifier columns (Sweeney 2002), plus
    l-diversity over a sensitive column (Machanavajjhala et al. 2007)
    when given. An equivalence CLASS is one distinct combination of
    ``qi_cols``; a row in a class smaller than ``k`` is re-identifiable
    by linking those attributes, and a class whose sensitive values
    collapse below ``l`` distinct leaks the attribute even at size k.

    One summary row: ``(n_rows, n_classes, min_class_size,
    n_classes_below_k, n_rows_below_k, below_k_pct[, n_classes_below_l,
    n_rows_below_l])``. NULL quasi-identifier values form their own
    classes (grouping semantics — identical in both engines).

    Reference analogue: none (no privacy surface); sits with the DQ
    audits as the release gate.

    100 TB shape: ONE groupBy over the quasi-identifier tuple
    (map-side combined; the class table is |distinct QI| rows, tiny
    next to the input) followed by a one-row reduction. Adding
    l-diversity rides the same aggregate as a countDistinct.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    aggs = [F.count(F.lit(1)).alias("__sz")]
    if sensitive_col is not None:
        if l < 2:
            raise ValueError(f"l must be >= 2, got {l}")
        aggs.append(F.countDistinct(F.col(sensitive_col)).alias("__nd"))
    classes = df.groupBy(*[F.col(c) for c in qi_cols]).agg(*aggs)
    outs = [
        F.sum("__sz").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("__sz").cast("long").alias("min_class_size"),
        F.sum(F.when(F.col("__sz") < k, 1).otherwise(0))
        .cast("long")
        .alias("n_classes_below_k"),
        F.sum(F.when(F.col("__sz") < k, F.col("__sz")).otherwise(0))
        .cast("long")
        .alias("n_rows_below_k"),
    ]
    if sensitive_col is not None:
        outs += [
            F.sum(F.when(F.col("__nd") < l, 1).otherwise(0))
            .cast("long")
            .alias("n_classes_below_l"),
            F.sum(F.when(F.col("__nd") < l, F.col("__sz")).otherwise(0))
            .cast("long")
            .alias("n_rows_below_l"),
        ]
    out = classes.agg(*outs).withColumn(
        "below_k_pct",
        F.round(F.col("n_rows_below_k") * 100.0 / F.col("n_rows"), 4),
    )
    cols = [
        "n_rows",
        "n_classes",
        "min_class_size",
        "n_classes_below_k",
        "n_rows_below_k",
        "below_k_pct",
    ]
    if sensitive_col is not None:
        cols += ["n_classes_below_l", "n_rows_below_l"]
    return out.select(*cols)
