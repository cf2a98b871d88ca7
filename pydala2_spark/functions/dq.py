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


_DEC8 = "decimal(38,8)"


def corr_matrix(df: DataFrame, cols: list[str], ndigits: int = 6) -> DataFrame:
    """Pairwise Pearson correlation matrix over ``cols``, unpivoted to
    one row per unordered pair: ``(col_x, col_y, corr)`` — the
    multicollinearity / feature-redundancy screen a modeling pipeline
    runs before training.

    ONE aggregation pass computes every sufficient statistic
    (n, Σx, Σx² per column, Σxy per pair — C(k,2)+2k+1 aggregate
    columns); adding a column adds aggregates, not scans. Each per-row
    product is a deterministic IEEE double, cast to DECIMAL(38,8)
    before summing so partition order cannot move a bit (the
    ev_value_trend discipline); correlations derive in double with a
    fixed expression shape a SQL oracle reproduces exactly.

    100 TB shape: one map-side-combined scan to a single row, then the
    unpivot explodes a literal array — no shuffle beyond the one-row
    reduce.
    """
    if len(cols) < 2:
        raise ValueError(f"need >= 2 columns, got {cols!r}")
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(_DEC8)).alias(f"s_{c}"))
        aggs.append(F.sum((F.col(c) * F.col(c)).cast(_DEC8)).alias(f"q_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        aggs.append(F.sum((F.col(a) * F.col(b)).cast(_DEC8)).alias(f"p_{a}_{b}"))
    s = df.agg(*aggs)

    def _corr(a: str, b: str):
        n = F.col("n").cast("double")
        sa = F.col(f"s_{a}").cast("double")
        sb = F.col(f"s_{b}").cast("double")
        qa = F.col(f"q_{a}").cast("double")
        qb = F.col(f"q_{b}").cast("double")
        p = F.col(f"p_{a}_{b}").cast("double")
        den = F.sqrt(n * qa - sa * sa) * F.sqrt(n * qb - sb * sb)
        # zero-variance column -> NULL (ANSI mode would throw on /0)
        return F.round(F.when(den > 0, (n * p - sa * sb) / den), ndigits)

    rows = [
        F.struct(
            F.lit(a).alias("col_x"),
            F.lit(b).alias("col_y"),
            _corr(a, b).alias("corr"),
        )
        for a, b in pairs
    ]
    return s.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def corr_matrix_oracle_sql(
    table_sql: str, cols: list[str], ndigits: int = 6
) -> str:
    """DuckDB oracle for :func:`corr_matrix`: identical sufficient
    statistics (DECIMAL(38,8) sums of per-row double products) and the
    identical double-precision derivation, one UNION ALL arm per
    pair."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    aggs = ["count(*) AS n"]
    for c in cols:
        aggs.append(f"sum(CAST({c} AS DECIMAL(38,8))) AS s_{c}")
        aggs.append(f"sum(CAST({c} * {c} AS DECIMAL(38,8))) AS q_{c}")
    for a, b in pairs:
        aggs.append(f"sum(CAST({a} * {b} AS DECIMAL(38,8))) AS p_{a}_{b}")
    arms = []
    for a, b in pairs:
        den = (
            f"(sqrt(CAST(n AS DOUBLE) * CAST(q_{a} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
            f" * sqrt(CAST(n AS DOUBLE) * CAST(q_{b} AS DOUBLE)"
            f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
        )
        expr = (
            f"round(CASE WHEN {den} > 0 THEN"
            f" (CAST(n AS DOUBLE) * CAST(p_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
            f" / {den} END, {ndigits})"
        )
        arms.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, {expr} AS corr FROM s"
        )
    return (
        f"WITH s AS (SELECT {', '.join(aggs)} FROM ({table_sql}))\n"
        + "\nUNION ALL\n".join(arms)
    )


def categorical_mutual_info(
    df: DataFrame, x: str, y: str, ndigits: int = 4
) -> DataFrame:
    """Mutual information (nats) between two categorical columns, with
    both marginal entropies and the min-entropy-normalized MI — the
    feature-dependence / redundancy audit (is ``source`` just a proxy
    for ``lang``?) and the leakage screen (is a feature secretly the
    label?).

    One row out: ``(n_rows, h_x, h_y, mi, mi_norm)``.

    Determinism: joint and marginal counts are integer-exact, so every
    per-cell term is a deterministic double; terms round to 12
    decimals and accumulate as DECIMAL(38,12) (the pagerank
    discipline) so summation order cannot move a bit.

    100 TB shape: one map-side-combined groupBy to the |X|x|Y| joint
    frame; marginals are re-aggregations OF that frame (the corpus is
    scanned once); totals join back as one-row broadcasts — no global
    window, no funnel.
    """
    joint = df.groupBy(
        F.col(x).alias("__x"), F.col(y).alias("__y")
    ).agg(F.count(F.lit(1)).alias("c")).localCheckpoint()
    tot = joint.agg(F.sum("c").cast("long").alias("n"))
    mx = joint.groupBy("__x").agg(F.sum("c").alias("cx"))
    my = joint.groupBy("__y").agg(F.sum("c").alias("cy"))
    dec = "decimal(38,12)"

    def _h(marg: DataFrame, ccol: str):
        t = marg.crossJoin(F.broadcast(tot))
        term = F.round(
            -(F.col(ccol).cast("double") / F.col("n").cast("double"))
            * F.log(F.col(ccol).cast("double") / F.col("n").cast("double")),
            12,
        ).cast(dec)
        return t.agg(F.sum(term).cast("double").alias("h"))

    mi_term = F.round(
        (F.col("c").cast("double") / F.col("n").cast("double"))
        * F.log(
            (F.col("c").cast("double") * F.col("n").cast("double"))
            / (F.col("cx").cast("double") * F.col("cy").cast("double"))
        ),
        12,
    ).cast(dec)
    mi = (
        joint.join(mx, "__x")
        .join(my, "__y")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(mi_term).cast("double").alias("mi"))
    )
    hx = _h(mx, "cx")
    hy = _h(my, "cy")
    return (
        tot.crossJoin(F.broadcast(hx.select(F.col("h").alias("__hx"))))
        .crossJoin(F.broadcast(hy.select(F.col("h").alias("__hy"))))
        .crossJoin(F.broadcast(mi))
        .select(
            F.col("n").alias("n_rows"),
            F.round("__hx", ndigits).alias("h_x"),
            F.round("__hy", ndigits).alias("h_y"),
            F.round("mi", ndigits).alias("mi"),
            F.round(
                F.col("mi") / F.least("__hx", "__hy"), ndigits
            ).alias("mi_norm"),
        )
    )


def mutual_info_oracle_sql(
    table_sql: str, x: str, y: str, ndigits: int = 4
) -> str:
    """DuckDB oracle for :func:`categorical_mutual_info` — identical
    rounded-term DECIMAL(38,12) accumulation."""
    return f"""
    WITH joint AS (
      SELECT {x} AS xv, {y} AS yv, count(*) AS c
      FROM ({table_sql}) GROUP BY 1, 2
    ), tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM joint),
    mx AS (SELECT xv, sum(c) AS cx FROM joint GROUP BY 1),
    my AS (SELECT yv, sum(c) AS cy FROM joint GROUP BY 1),
    hx AS (
      SELECT CAST(sum(CAST(round(
        -(CAST(cx AS DOUBLE) / CAST(n AS DOUBLE))
          * ln(CAST(cx AS DOUBLE) / CAST(n AS DOUBLE)), 12)
        AS DECIMAL(38,12))) AS DOUBLE) AS h FROM mx, tot
    ), hy AS (
      SELECT CAST(sum(CAST(round(
        -(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE))
          * ln(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE)), 12)
        AS DECIMAL(38,12))) AS DOUBLE) AS h FROM my, tot
    ), mi AS (
      SELECT CAST(sum(CAST(round(
        (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
          * ln((CAST(c AS DOUBLE) * CAST(n AS DOUBLE))
               / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))), 12)
        AS DECIMAL(38,12))) AS DOUBLE) AS mi
      FROM joint JOIN mx USING (xv) JOIN my USING (yv), tot
    )
    SELECT tot.n AS n_rows,
           round(hx.h, {ndigits}) AS h_x,
           round(hy.h, {ndigits}) AS h_y,
           round(mi.mi, {ndigits}) AS mi,
           round(mi.mi / least(hx.h, hy.h), {ndigits}) AS mi_norm
    FROM tot, hx, hy, mi
    """
