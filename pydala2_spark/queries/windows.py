"""Window-function queries (ranking, frames, growth).

Registered into the shared REGISTRY; ordering and the driver window
live in pydala2_spark/queries/__init__.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pydala2_spark.queries._base import (
    _DEC,
    _dsum,
    _t,
    query,
)
from pydala2_spark.sources.testdata import read_table



@query(
    "w_value_deciles",
    """
    SELECT decile,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS decile
      FROM orders
    ) t
    GROUP BY decile
    """,
)
def w_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DISTRIBUTED ntile: the naive form is a global window over the
    # whole fact table — one task sorts everything. Instead the global
    # rank comes from the two-pass distributed prefix
    # (skew.distributed_prefix), and the decile is the SQL-standard
    # ntile bucket formula applied to (rank, n): the first n%k buckets
    # take floor(n/k)+1 rows, the rest floor(n/k) — integer-exact, so
    # the result equals the oracle's native ntile() row for row.
    from pydala2_spark.functions.skew import distributed_prefix

    orders = _t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    n_row = orders.agg(F.count(F.lit(1)).alias("__n"))
    r = distributed_prefix(
        orders,
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        rank_col="__r",
    ).crossJoin(F.broadcast(n_row))
    k = 10
    sz = F.floor(F.col("__n") / k).cast("long")
    big = F.col("__n") % k
    cut = big * (sz + 1)
    decile = (
        F.when(
            F.col("__r") <= cut,
            F.floor((F.col("__r") - 1) / (sz + 1)) + 1,
        )
        .otherwise(big + F.floor((F.col("__r") - 1 - cut) / sz) + 1)
        .cast("int")
    )
    return (
        r.select("o_totalprice", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )



# =====================================================================
# Windows (§2.5)
# =====================================================================


@query(
    "w_top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
)
def w_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Top-k per group: one hash shuffle on the partition key; Spark
    # applies the rank filter group-locally (WindowGroupLimit) so only
    # k rows per key survive the window — scales to any group count.
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("total"), "rn")
    )



@query(
    "w_running_revenue",
    f"""
    SELECT o_custkey, o_orderkey,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                      OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate ASC, o_orderkey ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                AS DOUBLE) AS running_total
    FROM orders
    """,
)
def w_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)).over(w), 2)
            .cast("double")
            .alias("running_total"),
        )
    )



@query(
    "w_monthly_growth",
    f"""
    WITH monthly AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             sum(CAST(o_totalprice AS DECIMAL(38,6))) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month,
           CAST(round(revenue, 2) AS DOUBLE) AS revenue,
           CAST(round(revenue - lag(revenue) OVER (ORDER BY month), 2) AS DOUBLE) AS delta
    FROM monthly
    """,
)
def w_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Aggregate first (heavy, distributed), window over ~80 month rows
    # after — the single-partition window is on post-agg data only.
    monthly = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)).alias("revenue"))
    )
    w = W.orderBy("month")
    return monthly.select(
        "month",
        F.round("revenue", 2).cast("double").alias("revenue"),
        F.round(F.col("revenue") - F.lag("revenue").over(w), 2).cast("double").alias("delta"),
    )



@query(
    "w_rank_distribution_frames",
    """
    WITH per_nation AS (
      SELECT s_nationkey, s_suppkey, s_acctbal
      FROM supplier
    )
    SELECT s_nationkey, s_suppkey,
           round(percent_rank() OVER w, 4) AS pr,
           round(cume_dist() OVER w, 4) AS cd,
           round(first_value(s_acctbal) OVER w, 2) AS best_bal,
           round(last_value(s_acctbal) OVER (
             PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS worst_bal,
           round(max(s_acctbal) OVER (
             PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS roll3
    FROM per_nation
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def w_rank_distribution_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.5 distribution functions + explicit frames: percent_rank /
    # cume_dist / first_value / last_value (full frame — the default
    # frame would stop at CURRENT ROW) / sliding 3-row max. One
    # shuffle on s_nationkey serves all five windows (same partition +
    # order spec → Catalyst plans a single Window node chain).
    supp = _t(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), "s_suppkey")
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    roll = w.rowsBetween(-2, W.currentRow)
    return supp.select(
        "s_nationkey",
        "s_suppkey",
        F.round(F.percent_rank().over(w), 4).alias("pr"),
        F.round(F.cume_dist().over(w), 4).alias("cd"),
        F.round(F.first("s_acctbal").over(w), 2).alias("best_bal"),
        F.round(F.last("s_acctbal").over(full), 2).alias("worst_bal"),
        F.round(F.max("s_acctbal").over(roll), 2).alias("roll3"),
    )



@query(
    "w_pareto_abc",
    """
    WITH rev AS (
      SELECT l_partkey AS partkey,
             CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY l_partkey
    ), c AS (
      SELECT partkey, revenue,
             CAST(sum(CAST(revenue AS DECIMAL(38,6))) OVER (
               ORDER BY revenue DESC, partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS cum,
             CAST((SELECT sum(CAST(revenue AS DECIMAL(38,6))) FROM rev)
                  AS DOUBLE) AS total
      FROM rev
    ), cls AS (
      SELECT partkey, revenue, total,
             CASE WHEN cum / total <= 0.8 THEN 'A'
                  WHEN cum / total <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM c
    )
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(round(sum(CAST(revenue AS DECIMAL(38,6))), 2) AS DOUBLE)
             AS class_revenue,
           round(CAST(sum(CAST(revenue AS DECIMAL(38,6))) AS DOUBLE)
                 / max(total), 6) AS revenue_share
    FROM cls GROUP BY abc_class
    """,
)
def w_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification of parts by revenue — the 80/15/5
    inventory-analytics split: rank parts by revenue, classify by
    CUMULATIVE revenue share (A holds the first 80%, B to 95%, C the
    tail), report each class's size and share. Per-part revenues
    round to 2 via exact decimal sums, the cumulative sum accumulates
    those ROUNDED values in decimal again, and the class cut compares
    one deterministic division — so the boundary part lands in the
    same class in both engines.

    100 TB shape: the per-part reduction is map-side combined; the
    cumulative share is a DISTRIBUTED two-pass prefix sum
    (range-partition on the order + partition-local prefixes +
    broadcast offsets — functions/skew.distributed_prefix), so no
    task ever holds the whole catalog; exact decimal addition makes
    the result independent of where the sampled range boundaries
    fall."""
    from pydala2_spark.functions.skew import distributed_prefix

    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "revenue"
        )
    ).withColumn("__rd", F.col("revenue").cast(_DEC))
    pre = distributed_prefix(
        rev,
        [F.desc("revenue"), F.asc("partkey")],
        sum_col="__rd",
        cum_col="__cumd",
    )
    # total = the LAST inclusive prefix (exact decimal) — aggregating
    # rev again would re-run the lineitem scan+groupBy; max(__cumd)
    # reads the prefix checkpoint instead (guide §1.2)
    total = pre.agg(F.max("__cumd").cast("double").alias("total"))
    c = (
        pre
        .withColumn("cum", F.col("__cumd").cast("double"))
        .crossJoin(F.broadcast(total))
    )
    cls = c.withColumn(
        "abc_class",
        F.when(F.col("cum") / F.col("total") <= 0.8, "A")
        .when(F.col("cum") / F.col("total") <= 0.95, "B")
        .otherwise("C"),
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        _dsum("revenue", 2).alias("class_revenue"),
        F.round(
            F.sum(F.col("revenue").cast(_DEC)).cast("double")
            / F.max("total"),
            6,
        ).alias("revenue_share"),
    )


@query(
    "w_cumulative_users",
    """
    WITH f AS (
      SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS d
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ), n AS (
      SELECT d, CAST(count(*) AS BIGINT) AS n_new FROM f GROUP BY d
    )
    SELECT d AS day, n_new,
           CAST(sum(n_new) OVER (ORDER BY d) AS BIGINT) AS cum_users
    FROM n
    """,
)
def w_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the audience-growth curve
    every dashboard leads with, computed WITHOUT a running distinct:
    first-seen day per user (one map-side-combined groupBy), per-day
    new-user counts, then a running sum over the DAY table. The
    cumulative window runs over O(calendar days) rows — bounded by
    time, not data — so the one-task window is safe at any corpus
    size (the ddsketch-extraction argument). Exact integers end to
    end."""
    ev = _t(spark, sf_dir, "events")
    f = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("d"))
    )
    n = f.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    return n.select(
        F.col("d").alias("day"),
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("cum_users"),
    )


@query(
    "w_yoy_growth",
    """
    WITH m AS (
      SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
               AS mkey,
             strftime(o_orderdate, '%Y-%m') AS month,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2)
                  AS DOUBLE) AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT cur.month, cur.revenue,
           prev.revenue AS prev_year_revenue,
           round(CASE WHEN prev.revenue > 0
                      THEN (cur.revenue - prev.revenue) / prev.revenue * 100.0
                 END, 4) AS yoy_pct
    FROM m cur LEFT JOIN m prev ON cur.mkey = prev.mkey + 100
    """,
)
def w_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth — the BI staple beside
    w_monthly_growth's month-over-month view, expressed as an
    EQUI-JOIN of the month table with itself shifted one year (mkey =
    prev + 100) instead of a lag-12 window: join keys shuffle-prune,
    no frame ordering, and a missing prior year is an explicit NULL
    rather than a silent frame underrun. Revenue accumulates in exact
    decimal; the month table is O(calendar months)."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("mkey"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(_dsum("o_totalprice", 2).alias("revenue"))
    prev = m.select(
        (F.col("mkey") + 100).alias("mkey"),
        F.col("revenue").alias("prev_year_revenue"),
    )
    return (
        m.join(prev, "mkey", "left")
        .select(
            "month",
            "revenue",
            "prev_year_revenue",
            F.round(
                F.when(
                    F.col("prev_year_revenue") > 0,
                    (F.col("revenue") - F.col("prev_year_revenue"))
                    / F.col("prev_year_revenue")
                    * 100.0,
                ),
                4,
            ).alias("yoy_pct"),
        )
    )
