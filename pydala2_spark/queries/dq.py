"""Data-quality queries: profiling, drift, outliers, keys, completeness.

Registered into the shared REGISTRY; ordering and the driver window
live in pydala2_spark/queries/__init__.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pydala2_spark.queries._base import (
    _app_scoped_tmp,
    _t,
    query,
)
from pydala2_spark.sources.testdata import read_table



_FK_RELATIONS = [
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
]



def _fk_oracle() -> str:
    branches = []
    for name, fact, fk, dim, pk in _FK_RELATIONS:
        branches.append(f"""
    SELECT '{name}' AS relation,
           (SELECT count(*) FROM {fact}) AS n_rows,
           (SELECT count(*) FROM {fact} f
            LEFT JOIN (SELECT DISTINCT {pk} FROM {dim}) d ON f.{fk} = d.{pk}
            WHERE f.{fk} IS NOT NULL AND d.{pk} IS NULL) AS n_orphans,
           round(CAST((SELECT count(*) FROM {fact} f
                       LEFT JOIN (SELECT DISTINCT {pk} FROM {dim}) d
                         ON f.{fk} = d.{pk}
                       WHERE f.{fk} IS NOT NULL AND d.{pk} IS NULL) AS DOUBLE)
                 * 100.0 / (SELECT count(*) FROM {fact}), 4) AS orphan_pct""")
    return "\nUNION ALL".join(branches)



@query(
    "dq_k_anonymity",
    """
    WITH cls AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
             count(*) AS sz,
             count(DISTINCT c_custkey % 7) AS nd
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(sz) AS BIGINT) AS min_class_size,
           CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_classes_below_k,
           CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
             AS n_rows_below_k,
           round(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) * 100.0
                 / sum(sz), 4) AS below_k_pct,
           CAST(sum(CASE WHEN nd < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_classes_below_l,
           CAST(sum(CASE WHEN nd < 2 THEN sz ELSE 0 END) AS BIGINT)
             AS n_rows_below_l
    FROM cls
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk audit (k-anonymity, Sweeney 2002 +
    l-diversity, Machanavajjhala 2007) over customer quasi-identifiers
    — nation, market segment, account-balance band — with a synthetic
    sensitive attribute (custkey mod 7 stands in for the sensitive
    column the schema lacks). The release gate a training-data
    pipeline runs before sharing user-derived tables: how many rows
    sit in linkable classes below k=5, and how many classes collapse
    to fewer than 2 sensitive values. One groupBy over the QI tuple +
    a one-row reduction; integer counts, oracle exact.
    See functions/dq.k_anonymity_report."""
    from pydala2_spark.functions.dq import k_anonymity_report

    cust = _t(spark, sf_dir, "customer").withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 1000.0).cast("long")
    ).withColumn("sens", F.col("c_custkey") % 7)
    return k_anonymity_report(
        cust,
        ["c_nationkey", "c_mktsegment", "bal_band"],
        k=5,
        sensitive_col="sens",
        l=2,
    )



_DQ_RULES = [
    {"rule": "not_null", "col": "o_custkey"},
    {"rule": "unique", "cols": ["o_orderkey"]},
    {"rule": "range", "col": "o_totalprice", "min": 0, "max": 300000},
    {"rule": "in_set", "col": "o_orderstatus", "values": ["O", "F"]},
    {"rule": "regex", "col": "o_orderpriority", "pattern": "^[1-3]-"},
    {
        "rule": "expr",
        "name": "clerk_matches_priority_band",
        "predicate": "o_totalprice < 400000 OR o_orderpriority LIKE '1-%'",
    },
]



def _dq_rules_oracle() -> str:
    from pydala2_spark.functions.dq import rules_oracle_sql

    return rules_oracle_sql("SELECT * FROM orders", _DQ_RULES)



@query("dq_rule_report", _dq_rules_oracle())
def dq_rule_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality RULESET over a freshly landed fact
    table (Great-Expectations-style): six rule kinds — not_null,
    multi-column unique, numeric range, categorical set, regex, and a
    free SQL predicate — compiled into ONE map-side-combined aggregate
    pass (adding a rule adds a column, not a scan), then unpivoted to
    one report row per rule. Thresholds here are deliberately tight so
    several rules report real violation counts, not a wall of zeros.
    NULL convention: per-value rules pass NULLs through; not_null is
    the single place nullness is judged. See
    functions/dq.validate_rules for 100 TB notes."""
    from pydala2_spark.functions.dq import validate_rules

    return validate_rules(_t(spark, sf_dir, "orders"), _DQ_RULES)



@query("dq_fk_orphans", _fk_oracle())
def dq_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Referential-integrity audit across the star schema: one LEFT
    # ANTI join per relation against the broadcast deduped dimension
    # key set — the fact side never shuffles. See
    # functions/dq.fk_orphan_report for the 100 TB notes.
    from pydala2_spark.functions.dq import fk_orphan_report

    rels = [
        (name, _t(spark, sf_dir, fact), fk, _t(spark, sf_dir, dim), pk)
        for name, fact, fk, dim, pk in _FK_RELATIONS
    ]
    return fk_orphan_report(rels)



def _benford_oracle() -> str:
    import math

    cases = " ".join(
        f"WHEN {d} THEN CAST({math.log10(1.0 + 1.0 / d)!r} AS DOUBLE)"
        for d in range(1, 10)
    )
    p = f"(CASE digit {cases} END)"
    return f"""
    WITH c AS (
      SELECT CAST(NULLIF(regexp_extract(
               CAST(round(abs(o_totalprice), 2) AS VARCHAR), '([1-9])', 1),
             '') AS INTEGER) AS digit
      FROM orders
      WHERE o_totalprice IS NOT NULL AND abs(o_totalprice) > 0
    ), counts AS (
      SELECT digit, count(*) AS n_obs FROM c
      WHERE digit IS NOT NULL GROUP BY digit
    ), t AS (
      SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM counts
    ), w AS (
      SELECT digit, n_obs,
             round(n * {p}, 2) AS expected_n,
             round((n_obs - n * {p}) * (n_obs - n * {p}) / (n * {p}), 6)
               AS term
      FROM counts CROSS JOIN t
    ), x AS (
      SELECT CAST(round(sum(CAST(term AS DECIMAL(38,6))), 4) AS DOUBLE)
               AS chi2
      FROM w
    )
    SELECT digit, n_obs, expected_n, chi2 FROM w CROSS JOIN x
    """



@query("dq_benford", _benford_oracle())
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Benford first-significant-digit conformance of order totals:
    # string-regexp digit extraction (no float log10 boundary hazard),
    # driver-literal expectations, decimal-folded chi-square. See
    # functions/dq.benford_report for the 100 TB notes.
    from pydala2_spark.functions.dq import benford_report

    return benford_report(_t(spark, sf_dir, "orders"), "o_totalprice")



def _drift_oracle() -> str:
    def branch(col: str, kind: str, where: str) -> str:
        if kind == "num":
            mn = f"round(CAST(min({col}) AS DOUBLE), 4)"
            mx = f"round(CAST(max({col}) AS DOUBLE), 4)"
            sn = sx = "CAST(NULL AS VARCHAR)"
        elif kind == "ts":
            mn = (
                f"round(CAST(epoch_us(CAST(min({col}) AS TIMESTAMP)) AS DOUBLE)"
                " / 1000000, 6)"
            )
            mx = (
                f"round(CAST(epoch_us(CAST(max({col}) AS TIMESTAMP)) AS DOUBLE)"
                " / 1000000, 6)"
            )
            sn = sx = "CAST(NULL AS VARCHAR)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
            sn, sx = f"min({col})", f"max({col})"
        return f"""
      SELECT '{col}' AS column_name,
             count(*) AS n_rows,
             count(DISTINCT {col}) AS n_distinct,
             {mn} AS min_num, {mx} AS max_num,
             {sn} AS min_str, {sx} AS max_str
      FROM orders {where}"""

    cols = [
        ("o_custkey", "num"),
        ("o_totalprice", "num"),
        ("o_orderstatus", "str"),
        ("o_orderdate", "ts"),
    ]
    p1 = "\n      UNION ALL".join(
        branch(c, k, "WHERE o_orderkey % 3 <> 0") for c, k in cols
    )
    p2 = "\n      UNION ALL".join(branch(c, k, "") for c, k in cols)
    return f"""
    WITH p1 AS ({p1}), p2 AS ({p2})
    SELECT p1.column_name,
           p1.n_rows AS n_v1, p2.n_rows AS n_v2,
           p1.n_distinct AS ndv_v1, p2.n_distinct AS ndv_v2,
           round(CAST(p2.n_distinct AS DOUBLE)
                 / CAST(p1.n_distinct AS DOUBLE), 4) AS ndv_ratio,
           p1.min_num AS min_num_v1, p1.max_num AS max_num_v1,
           p2.min_num AS min_num_v2, p2.max_num AS max_num_v2,
           coalesce(p2.min_num < p1.min_num, FALSE)
             OR coalesce(p2.max_num > p1.max_num, FALSE)
             OR coalesce(p2.min_str < p1.min_str, FALSE)
             OR coalesce(p2.max_str > p1.max_str, FALSE) AS range_widened
    FROM p1 JOIN p2 USING (column_name)
    """



@query("dq_profile_drift", _drift_oracle())
def dq_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema/profile DRIFT between two snapshot VERSIONS of a managed
    dataset — the data-quality gate a pipeline runs after every
    ingest: per column, row/distinct counts and typed min/max for v1
    vs v2 (computed over time-travel reads of the same
    SnapshotDataset), the NDV growth ratio, and a range_widened flag
    (new values outside the previous envelope — the classic silent
    schema-drift symptom). Reuses profile_dataframe, so the metrics
    are the same two map-side-combined passes per version.

    100 TB shape: profiling scans each version once with no joins or
    windows on data; the drift join is |columns| rows. Versions are
    manifest-following reads — no listing races.
    See functions/schema_tools.profile_dataframe, plans/snapshots."""
    import shutil

    from pydala2_spark.functions.schema_tools import profile_dataframe
    from pydala2_spark.plans.snapshots import SnapshotDataset

    cols = ["o_custkey", "o_totalprice", "o_orderstatus", "o_orderdate"]
    root = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_drift")
    path = f"{root}/snap"
    shutil.rmtree(path, ignore_errors=True)
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", *cols)
    ds = SnapshotDataset(spark, path)
    ds.commit(orders.filter(F.col("o_orderkey") % 3 != 0).repartition(4))
    ds.commit(orders.filter(F.col("o_orderkey") % 3 == 0).repartition(2))
    p1 = profile_dataframe(ds.read(1), cols)
    p2 = profile_dataframe(ds.read(2), cols)
    r1 = p1.select(
        "column_name",
        F.col("n_rows").alias("n_v1"),
        F.col("n_distinct").alias("ndv_v1"),
        F.col("min_num").alias("min_num_v1"),
        F.col("max_num").alias("max_num_v1"),
        F.col("min_str").alias("min_str_v1"),
        F.col("max_str").alias("max_str_v1"),
    )
    r2 = p2.select(
        "column_name",
        F.col("n_rows").alias("n_v2"),
        F.col("n_distinct").alias("ndv_v2"),
        F.col("min_num").alias("min_num_v2"),
        F.col("max_num").alias("max_num_v2"),
        F.col("min_str").alias("min_str_v2"),
        F.col("max_str").alias("max_str_v2"),
    )
    widened = (
        F.coalesce(F.col("min_num_v2") < F.col("min_num_v1"), F.lit(False))
        | F.coalesce(F.col("max_num_v2") > F.col("max_num_v1"), F.lit(False))
        | F.coalesce(F.col("min_str_v2") < F.col("min_str_v1"), F.lit(False))
        | F.coalesce(F.col("max_str_v2") > F.col("max_str_v1"), F.lit(False))
    )
    return r1.join(r2, "column_name").select(
        "column_name",
        "n_v1",
        "n_v2",
        "ndv_v1",
        "ndv_v2",
        F.round(
            F.col("ndv_v2").cast("double") / F.col("ndv_v1").cast("double"), 4
        ).alias("ndv_ratio"),
        "min_num_v1",
        "max_num_v1",
        "min_num_v2",
        "max_num_v2",
        widened.alias("range_widened"),
    )



@query(
    "dq_key_skew",
    """
    WITH f AS (
      SELECT user_id, count(*) AS c FROM events
      WHERE user_id IS NOT NULL GROUP BY user_id
    ), r AS (
      SELECT c, row_number() OVER (ORDER BY c, user_id) AS i,
             count(*) OVER () AS n,
             CAST(sum(c) OVER () AS BIGINT) AS total
      FROM f
    ), g AS (
      SELECT max(n) AS n_keys, max(total) AS n_rows,
             CAST(sum((2 * i - n - 1) * c) AS BIGINT) AS gini_num
      FROM r
    ), tk AS (
      SELECT CAST(sum(c) AS BIGINT) AS top10_rows
      FROM (SELECT c FROM f ORDER BY c DESC, user_id LIMIT 10)
    ), mx AS (
      SELECT CAST(max(c) AS BIGINT) AS max_key_rows FROM f
    )
    SELECT g.n_keys, g.n_rows, mx.max_key_rows,
           round(CAST(mx.max_key_rows AS DOUBLE)
                 / CAST(g.n_rows AS DOUBLE), 6) AS max_share,
           tk.top10_rows,
           round(CAST(tk.top10_rows AS DOUBLE)
                 / CAST(g.n_rows AS DOUBLE), 6) AS top10_share,
           round(CAST(g.gini_num AS DOUBLE)
                 / (CAST(g.n_keys AS DOUBLE) * CAST(g.n_rows AS DOUBLE)), 6)
             AS gini
    FROM g, tk, mx
    """,
)
def dq_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key SKEW diagnostics for events.user_id — the
    numbers that decide salting and AQE skew-join thresholds BEFORE a
    job falls over: key count, the heaviest key's share, the top-10
    share, and the Gini coefficient of the frequency distribution
    (0 = uniform, →1 = one hot key). The Gini numerator
    sum((2i - n - 1) * c) is integer-exact over the rank-ordered
    frequencies, so the oracle matches to the last digit; the only
    doubles are three final divisions.

    100 TB shape: events reduce to one row per KEY first (map-side
    combined); the global rank is a DISTRIBUTED two-pass row_number
    (functions/skew.distributed_prefix — range-partition + local
    ranks + broadcast offsets), so the key frame never funnels
    through one task; the top-10 is TakeOrderedAndProject.
    Complements agg_cms_join_size: that sizes the join, this says
    whether its hottest key needs salting (functions/skew.py)."""
    from pydala2_spark.functions.skew import distributed_prefix

    f = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = f.agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("total")
    )
    r = distributed_prefix(
        f, [F.asc("c"), F.asc("user_id")], rank_col="i"
    ).crossJoin(F.broadcast(tot))
    g = r.agg(
        F.max("n").alias("n_keys"),
        F.max("total").cast("long").alias("n_rows"),
        F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("c"))
        .cast("long")
        .alias("gini_num"),
    )
    tk = (
        f.orderBy(F.desc("c"), "user_id")
        .limit(10)
        .agg(F.sum("c").cast("long").alias("top10_rows"))
    )
    mx = f.agg(F.max("c").cast("long").alias("max_key_rows"))
    return (
        g.crossJoin(F.broadcast(tk))
        .crossJoin(F.broadcast(mx))
        .select(
            "n_keys",
            "n_rows",
            "max_key_rows",
            F.round(
                F.col("max_key_rows").cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("max_share"),
            "top10_rows",
            F.round(
                F.col("top10_rows").cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("top10_share"),
            F.round(
                F.col("gini_num").cast("double")
                / (
                    F.col("n_keys").cast("double")
                    * F.col("n_rows").cast("double")
                ),
                6,
            ).alias("gini"),
        )
    )



def _mutual_info_oracle() -> str:
    from pydala2_spark.functions.dq import mutual_info_oracle_sql

    return mutual_info_oracle_sql(
        "SELECT lang, source FROM documents", "lang", "source"
    )



@query("dq_mutual_info", _mutual_info_oracle())
def dq_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between the corpus' lang and source labels
    (plus both marginal entropies and min-normalized MI) — the
    dependence / leakage audit: is `source` secretly a language
    proxy? One groupBy to the |langs|x|sources| joint frame, marginals
    re-aggregate THAT frame (corpus scanned once), totals join back as
    one-row broadcasts; per-cell ln terms round-12 then accumulate as
    DECIMAL(38,12) (pagerank discipline) so both engines sum exactly.
    See functions/dq.categorical_mutual_info."""
    from pydala2_spark.functions.dq import categorical_mutual_info

    return categorical_mutual_info(
        _t(spark, sf_dir, "documents"), "lang", "source"
    )



def _ks_oracle() -> str:
    from pydala2_spark.functions.dq import ks_oracle_sql

    return ks_oracle_sql(
        "SELECT event_type, value FROM events",
        "value",
        "event_type",
        "view",
        "purchase",
    )



@query("dq_ks_test", _ks_oracle())
def dq_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test (view vs purchase values) —
    the DISTRIBUTIONAL drift gate next to dq_profile_drift's
    schema/envelope gate: catches a shape change inside an unchanged
    envelope. D is integer-exact end to end (both per-value counts
    pack into one decimal, ONE distributed_prefix recovers both
    ECDFs — no global-window funnel — and max|cum1*n2 - cum2*n1| is
    an integer max); the Numerical-Recipes p-series accumulates
    round-12 decimal terms. See functions/dq.ks_two_sample."""
    from pydala2_spark.functions.dq import ks_two_sample

    return ks_two_sample(
        _t(spark, sf_dir, "events"), "value", "event_type", "view", "purchase"
    )



_CK_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]



def _candidate_keys_oracle() -> str:
    from pydala2_spark.functions.dq import candidate_keys_oracle_sql

    return candidate_keys_oracle_sql("SELECT * FROM orders", _CK_COLS)



@query("dq_candidate_keys", _candidate_keys_oracle())
def dq_candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness profile over orders' columns (exact NDV, nulls,
    unique ratio, candidate-key verdict) — the join-key discovery /
    key-collision audit a pipeline runs after every ingest. ONE scan:
    multi-column exact COUNT(DISTINCT) via Catalyst's Expand
    (documented |cols|+1 row amplification), null counts in the same
    aggregate, unpivot on the single reduced row.
    See functions/dq.candidate_keys."""
    from pydala2_spark.functions.dq import candidate_keys

    return candidate_keys(_t(spark, sf_dir, "orders"), _CK_COLS)



def _psi_oracle() -> str:
    from pydala2_spark.functions.dq import psi_oracle_sql

    return psi_oracle_sql(
        "SELECT n_chars, doc_id FROM documents",
        "n_chars",
        "doc_id % 2 = 0",
        bin_width=64,
        max_bin=8,
    )



@query("dq_psi", _psi_oracle())
def dq_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of document length between corpus
    halves — the binned drift magnitude risk teams threshold on
    (< 0.1 stable, > 0.25 broken), next to dq_ks_test's equality
    verdict and dq_profile_drift's schema envelope. Fixed-width
    integer bins (no quantile-edge ambiguity), Laplace smoothing,
    round-12 decimal ln-term ladder; one map-side-combined groupBy to
    a <= 9-bin frame. See functions/dq.psi_report."""
    from pydala2_spark.functions.dq import psi_report

    return psi_report(
        _t(spark, sf_dir, "documents"),
        "n_chars",
        F.col("doc_id") % 2 == 0,
        bin_width=64,
        max_bin=8,
    )



_ENTROPY_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey"]



def _entropy_oracle() -> str:
    from pydala2_spark.functions.dq import column_entropy_oracle_sql

    return column_entropy_oracle_sql("SELECT * FROM orders", _ENTROPY_COLS)



@query("dq_column_entropy", _entropy_oracle())
def dq_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy profile per column (nats, plus H/ln(ndv)
    normalization and exact NDV) — the information-density audit that
    flags near-constant columns and quantifies key spread, the
    gradient next to dq_candidate_keys' binary verdicts. NULLs count
    as a category so a 99%-NULL feed reads near-constant. One unpivot
    pass, round-12 decimal ln ladder.
    See functions/dq.column_entropy."""
    from pydala2_spark.functions.dq import column_entropy

    return column_entropy(_t(spark, sf_dir, "orders"), _ENTROPY_COLS)



_IQR_COLS = ["l_quantity", "l_extendedprice", "l_discount"]



def _iqr_oracle() -> str:
    from pydala2_spark.functions.dq import iqr_outliers_oracle_sql

    return iqr_outliers_oracle_sql("SELECT * FROM lineitem", _IQR_COLS)



@query("dq_iqr_outliers", _iqr_oracle())
def dq_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier screen over lineitem's numeric columns:
    EXACT Q1/Q3 via the distributed range-prefix (type-1 quantiles,
    the weighted_quantiles convention), 1.5*IQR fences, per-column
    outlier counts and rate — the robust spread audit next to
    profile_drift's mean/stddev envelope. See
    functions/dq.iqr_outliers."""
    from pydala2_spark.functions.dq import iqr_outliers

    return iqr_outliers(_t(spark, sf_dir, "lineitem"), _IQR_COLS)



def _seq_gaps_oracle() -> str:
    from pydala2_spark.functions.dq import sequence_gaps_oracle_sql

    return sequence_gaps_oracle_sql("SELECT * FROM orders", "o_orderkey")



@query("dq_sequence_gaps", _seq_gaps_oracle())
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completeness audit of the order-key sequence (TPC-H keys are
    deliberately sparse — 8 used per 32-block — so the audit has real
    gaps to find): missing-id count over [min, max], duplicate rows,
    and the largest contiguous gap — the did-we-drop-a-chunk /
    did-we-double-load question after every autoincrement-keyed
    ingest. Distinct-id reduce + range-prefix successor join; no
    global window. See functions/dq.sequence_gaps."""
    from pydala2_spark.functions.dq import sequence_gaps

    return sequence_gaps(_t(spark, sf_dir, "orders"), "o_orderkey")



_NULLCORR_SQL = """SELECT
      CASE WHEN event_type <> 'error' THEN props END AS props_n,
      CASE WHEN value >= 1.0 THEN value END AS value_n,
      CASE WHEN user_id % 97 <> 0 THEN user_id END AS user_n
    FROM events"""



def _null_corr_oracle() -> str:
    from pydala2_spark.functions.dq import null_correlation_oracle_sql

    return null_correlation_oracle_sql(
        _NULLCORR_SQL, ["props_n", "value_n", "user_n"]
    )



@query("dq_null_correlation", _null_corr_oracle())
def dq_null_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missingness-structure audit: pairwise NULL co-occurrence 2x2
    tables + phi per column pair — separates random nulls from
    fields-that-die-together (broken upstream join) and
    exactly-one-set (mis-merged union). The corpus has no physical
    NULLs, so the query derives a deterministic missingness pattern
    in-query (error rows lose props, sub-1 values null out, every
    97th user anonymized) — same construction in both engines; the
    operator is the general one. ONE aggregate pass for all pairs.
    See functions/dq.null_correlation."""
    from pydala2_spark.functions.dq import null_correlation

    ev = _t(spark, sf_dir, "events").select(
        F.when(F.col("event_type") != "error", F.col("props")).alias(
            "props_n"
        ),
        F.when(F.col("value") >= 1.0, F.col("value")).alias("value_n"),
        F.when(F.col("user_id") % 97 != 0, F.col("user_id")).alias("user_n"),
    )
    return null_correlation(ev, ["props_n", "value_n", "user_n"])


def _wasserstein_oracle() -> str:
    from pydala2_spark.functions.dq import wasserstein_oracle_sql

    return wasserstein_oracle_sql(
        "SELECT event_type, value FROM events",
        "value",
        "event_type = 'purchase'",
        "event_type = 'click'",
    )


@query("dq_wasserstein", _wasserstein_oracle())
def dq_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 distance between the purchase and click
    value distributions — drift measured in TRANSPORT UNITS (dollars
    of mass-movement), completing the drift triad: dq_ks_test's
    sup-gap (one worst point), dq_psi's binned divergence
    (bin-dependent), W1's integrated gap (shape-aware, unit-preserving,
    the metric embedding-mixture monitors alert on). Both cohorts'
    CDFs cumulate in ONE shared distributed range-prefix; the neighbor
    value arrives by rank-equi join, never a one-task lead() window.
    See functions/dq.wasserstein_1d."""
    from pydala2_spark.functions.dq import wasserstein_1d

    return wasserstein_1d(
        _t(spark, sf_dir, "events"),
        "value",
        F.col("event_type") == "purchase",
        F.col("event_type") == "click",
    )


def _freshness_oracle() -> str:
    from pydala2_spark.functions.dq import freshness_oracle_sql

    return freshness_oracle_sql("events", "event_type", "ts", window_days=7)


@query("dq_freshness", _freshness_oracle())
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type ingest freshness and arrival-rate audit: lag
    behind the corpus frontier plus trailing-7d vs prior-7d volume
    ratio — the "did a feed silently die" check that row counts and
    schema checks miss entirely (a dead feed keeps all its historical
    rows). Two passes: one-row corpus-max broadcast, one
    map-side-combined groupBy. See functions/dq.freshness_report."""
    from pydala2_spark.functions.dq import freshness_report

    return freshness_report(
        _t(spark, sf_dir, "events"), "event_type", "ts", window_days=7
    )
