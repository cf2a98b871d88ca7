"""Dataset-lifecycle queries: format round-trips, merge/update/delete, snapshots, IVM, pruning/bucketing layouts, maintenance round-trips.

Registered into the shared REGISTRY; ordering and the driver window
live in pydala2_spark/queries/__init__.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pydala2_spark.queries._base import (
    _app_scoped_tmp,
    _dsum,
    _t,
    query,
)
from pydala2_spark.sources.testdata import read_table



@query(
    "merge_upsert_semantics",
    """
    WITH source AS (
      SELECT o_orderkey, round(o_totalprice * 2, 2) AS price
      FROM orders WHERE o_orderkey % 10 = 0
    ), target AS (
      SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
    )
    SELECT o_orderkey, price FROM source
    UNION ALL
    SELECT t.o_orderkey, t.price FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
    """,
)
def merge_upsert_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the merge operator's relational core (null-safe keys, last-wins
    # dedup) verified against a SQL upsert expansion — the storage form
    # of the same op is exercised in tests/test_merge.py.
    from pydala2_spark.operators.merge import merge_frames

    orders = _t(spark, sf_dir, "orders")
    target = orders.select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    source = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", F.round(F.col("o_totalprice") * 2, 2).alias("price")
    )
    return merge_frames(target, source, keys=["o_orderkey"], strategy="upsert")



@query(
    "merge_scd2_history",
    """
    WITH base AS (
      SELECT CAST(c_custkey AS BIGINT) AS k, round(c_acctbal, 2) AS bal,
             c_mktsegment AS seg
      FROM customer
    ),
    h0 AS (
      SELECT k, bal, seg, CAST(0 AS BIGINT) AS valid_from,
             CAST(NULL AS BIGINT) AS valid_to
      FROM base
    ),
    s1 AS (SELECT k, round(bal + 100, 2) AS bal, seg FROM base WHERE k % 7 = 0),
    aff1 AS (
      SELECT s.k AS k, s.bal AS bal, s.seg AS seg,
             c.bal AS cur_bal, c.seg AS cur_seg, c.valid_from AS cur_vf,
             c.k IS NOT NULL AS has_cur
      FROM s1 s
      LEFT JOIN (SELECT * FROM h0 WHERE valid_to IS NULL) c ON s.k = c.k
      WHERE c.k IS NULL
         OR s.bal IS DISTINCT FROM c.bal OR s.seg IS DISTINCT FROM c.seg
    ),
    h1 AS (
      SELECT h.k, h.bal, h.seg, h.valid_from, h.valid_to FROM h0 h
      WHERE NOT EXISTS (
        SELECT 1 FROM aff1 a
        WHERE a.has_cur AND a.k = h.k AND a.cur_vf = h.valid_from)
      UNION ALL
      SELECT a.k, a.cur_bal, a.cur_seg, a.cur_vf, CAST(1 AS BIGINT)
      FROM aff1 a WHERE a.has_cur
      UNION ALL
      SELECT a.k, a.bal, a.seg, CAST(1 AS BIGINT), CAST(NULL AS BIGINT)
      FROM aff1 a
    ),
    s2 AS (SELECT k, round(bal * 2, 2) AS bal, seg FROM base WHERE k % 3 = 0),
    aff2 AS (
      SELECT s.k AS k, s.bal AS bal, s.seg AS seg,
             c.bal AS cur_bal, c.seg AS cur_seg, c.valid_from AS cur_vf,
             c.k IS NOT NULL AS has_cur
      FROM s2 s
      LEFT JOIN (SELECT * FROM h1 WHERE valid_to IS NULL) c ON s.k = c.k
      WHERE c.k IS NULL
         OR s.bal IS DISTINCT FROM c.bal OR s.seg IS DISTINCT FROM c.seg
    ),
    h2 AS (
      SELECT h.k, h.bal, h.seg, h.valid_from, h.valid_to FROM h1 h
      WHERE NOT EXISTS (
        SELECT 1 FROM aff2 a
        WHERE a.has_cur AND a.k = h.k AND a.cur_vf = h.valid_from)
      UNION ALL
      SELECT a.k, a.cur_bal, a.cur_seg, a.cur_vf, CAST(2 AS BIGINT)
      FROM aff2 a WHERE a.has_cur
      UNION ALL
      SELECT a.k, a.bal, a.seg, CAST(2 AS BIGINT), CAST(NULL AS BIGINT)
      FROM aff2 a
    )
    SELECT k, bal, seg, valid_from, valid_to FROM h2 ORDER BY k, valid_from
    """,
)
def merge_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SCD2 history-keeping merge (operators/merge.py scd2_frames): two
    # successive attribute batches over a customer dim; the oracle
    # unrolls the same close-and-reopen semantics as explicit CTEs.
    # Scale shape per batch: ONE key-shuffle join of the (small) batch
    # against current rows; the delta is batch-sized, and the storage
    # form (merge_scd2) rewrites only files holding changed keys.
    from pydala2_spark.operators.merge import scd2_frames

    base = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("k"),
        F.round("c_acctbal", 2).alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    h0 = base.select(
        "k",
        "bal",
        "seg",
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    s1 = base.filter(F.col("k") % 7 == 0).select(
        "k", F.round(F.col("bal") + 100, 2).alias("bal"), "seg"
    )
    # checkpoint between chained applies: h1 is referenced by three
    # branches of the second apply (current-rows probe, anti-join,
    # union) and would otherwise recompute its whole DAG per branch
    h1 = scd2_frames(h0, s1, keys=["k"], ts=1).localCheckpoint(eager=False)
    s2 = base.filter(F.col("k") % 3 == 0).select(
        "k", F.round(F.col("bal") * 2, 2).alias("bal"), "seg"
    )
    h2 = scd2_frames(h1, s2, keys=["k"], ts=2)
    return h2.orderBy("k", "valid_from")



@query(
    "hive_partitioned_scan",
    """
    WITH s AS (
      SELECT doc_id, source, n_chars, lang,
             CASE WHEN ('0x' || substr(md5('split:exp1' || CAST(doc_id AS VARCHAR)),
                        1, 8))::BIGINT % 1000000 < 100000 THEN 'test'
                  WHEN ('0x' || substr(md5('split:exp1' || CAST(doc_id AS VARCHAR)),
                        1, 8))::BIGINT % 1000000 < 150000 THEN 'val'
                  ELSE 'train' END AS split
      FROM documents
    )
    SELECT doc_id, source, n_chars, split, lang
    FROM s WHERE split = 'train' AND lang = 'en'
    """,
)
def hive_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned WRITE → partition-pruned READ round-trip, the
    layout every production corpus lands in: assign the deterministic
    train/val/test split, write ``partitionBy(split, lang)`` through
    the package Writer, read back through the package Dataset with a
    partition predicate. The oracle recomputes the expected rows
    directly from the source table (same md5 split coin), so the
    round-trip must preserve every value AND the partition columns
    must rehydrate from directory names.

    At 100 TB the predicate never touches data: both conjuncts are
    partition columns, so Catalyst prunes to the matching directories
    at planning time (`PartitionFilters` — plan-asserted in
    tests/test_verbs_plans.py) and the scan reads only ``train/en``
    files."""
    from pydala2_spark.operators.curate import train_test_split
    from pydala2_spark.sources.dataset import Dataset
    from pydala2_spark.sources.writer import Writer

    docs = _t(spark, sf_dir, "documents")
    split = train_test_split(
        docs, test_fraction=0.1, val_fraction=0.05, salt="exp1"
    ).select("doc_id", "source", "n_chars", "split", "lang")
    path = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_hive")
    Writer(spark, path).write(split, mode="overwrite", partition_by=["split", "lang"])
    ds = Dataset(path, spark=spark, partitioning=["split", "lang"])
    return ds.filter("split = 'train' AND lang = 'en'").select(
        "doc_id", "source", "n_chars", "split", "lang"
    )



@query(
    "catalog_sql_roundtrip",
    """
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           round(sum(CAST(o.o_totalprice AS DECIMAL(38,6))), 2)::DOUBLE
             AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY 1
    """,
)
def catalog_sql_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 in the oracle gate: declare orders+customer in a YAML
    catalog, then run the join THROUGH ``Catalog.sql`` — table
    references auto-register from the catalog entries, so the query
    text never names a path. The result must equal the plain SQL over
    the same parquet (the oracle).

    At 100 TB the catalog is the governance layer: entries carry
    partitioning/write_args/filesystem profiles, and sql() resolves
    every reference to the governed dataset — same Catalyst plan as a
    hand-registered view, zero extra I/O."""
    import os

    from pydala2_spark.plans.catalog import Catalog

    path = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_catalog")
    os.makedirs(path, exist_ok=True)
    cat = Catalog(os.path.join(path, "catalog.yaml"), spark=spark)
    cat.create_table("tpch.orders", os.path.join(sf_dir, "orders.parquet"))
    cat.create_table("tpch.customer", os.path.join(sf_dir, "customer.parquet"))
    return cat.sql(
        """
        SELECT c.c_mktsegment,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(38,6))), 2)
                    AS DOUBLE) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY c.c_mktsegment
        """
    )



@query(
    "orc_roundtrip_scan",
    """
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 150000
    """,
)
def orc_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-format round-trip: orders lands in an ORC dataset through
    the package Writer, reads back through ORCDataset with a pushed
    predicate, and must reproduce the parquet source bit-for-bit (the
    oracle reads the original parquet). Exercises S6 (generic format
    scan) end to end on a columnar non-parquet source.

    At 100 TB: ORC is a native Spark source, so the status+price
    predicates push into the ORC reader (searchArgument) exactly like
    parquet PushedFilters — scan cost tracks the selected rows, and
    the write is one shuffle-free pass."""
    from pydala2_spark.sources.dataset import ORCDataset

    path = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_orc")
    src = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("total"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
    )
    ds = ORCDataset(path, spark=spark)
    ds.write_to_dataset(src, mode="overwrite")
    return ds.filter("o_orderstatus = 'O' AND total > 150000").select(
        "o_orderkey", "o_orderstatus", "total", "orderdate"
    )



@query(
    "csv_roundtrip_scan",
    """
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal, c_mktsegment
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND round(c_acctbal, 2) > 1000
    """,
)
def csv_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-format round-trip (S4): customer lands in a CSV dataset
    through the package Writer (header row on), reads back through
    CSVDataset with an EXPLICIT schema, filters, and must reproduce
    the parquet source bit-for-bit (the oracle reads the original
    parquet). Money survives because it is rounded to 2 digits before
    serialization — a 2-decimal double's shortest repr parses back to
    the identical bit pattern.

    At 100 TB: the explicit ``schema=`` is the scale-honest path —
    schema inference costs a FULL extra pass over the text corpus
    (CSVDataset supports it for exploration; production hands the DDL
    string). Spark's CSV reader still prunes columns at parse time and
    applies the pushed filters mid-parse
    (spark.sql.csv.filterPushdown.enabled), so scan cost tracks the
    selected rows, not the serialized width.

    Reference: `pydala/dataset.py:2656-2713` (CsvDataset)."""
    from pydala2_spark.sources.dataset import CSVDataset

    path = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_csv")
    src = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.round("c_acctbal", 2).alias("acctbal"),
        "c_mktsegment",
    )
    ds = CSVDataset(
        path,
        spark=spark,
        schema="c_custkey bigint, c_name string, acctbal double, "
        "c_mktsegment string",
    )
    ds.write_to_dataset(src, mode="overwrite")
    return ds.filter("c_mktsegment = 'BUILDING' AND acctbal > 1000").select(
        "c_custkey", "c_name", "acctbal", "c_mktsegment"
    )



@query(
    "json_roundtrip_scan",
    """
    SELECT doc_id, lang, n_chars, source
    FROM documents
    WHERE lang = 'en' AND n_chars > 200
    """,
)
def json_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured round-trip (S5): documents lands in a
    line-delimited JSON dataset through the package Writer, reads back
    through JSONDataset with an EXPLICIT schema, filters, and must
    reproduce the parquet source exactly (the oracle reads the
    original parquet). Spark's JSON writer OMITS null fields per
    record; the explicit schema resurfaces them as typed NULLs, so
    null-lang documents survive the trip.

    At 100 TB: explicit ``schema=`` skips the inference pass (JSON
    inference samples EVERY record by default); the JSON reader prunes
    unprojected keys at parse time and applies pushed predicates
    mid-parse (spark.sql.json.filterPushdown.enabled) — per-file cost
    tracks selected rows. JSON is the wire format of scraped/API
    corpora, so this is the ingest edge of the document pipeline.

    Reference: `pydala/dataset.py:2716-2774` (JsonDataset)."""
    from pydala2_spark.sources.dataset import JSONDataset

    path = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_json")
    src = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "source"
    )
    ds = JSONDataset(
        path,
        spark=spark,
        schema="doc_id bigint, lang string, n_chars bigint, source string",
    )
    ds.write_to_dataset(src, mode="overwrite")
    return ds.filter("lang = 'en' AND n_chars > 200").select(
        "doc_id", "lang", "n_chars", "source"
    )



@query(
    "update_where_semantics",
    """
    SELECT doc_id, lang,
           CASE WHEN coalesce(n_chars > 400 AND lang = 'en', FALSE)
                THEN n_chars * 2 ELSE n_chars END AS n_chars,
           CASE WHEN coalesce(n_chars > 400 AND lang = 'en', FALSE)
                THEN 'boosted' ELSE source END AS source
    FROM documents
    """,
)
def update_where_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level predicate UPDATE, end to end: copy the corpus into a
    managed dataset, ``update_where`` the long English documents
    (doubling n_chars AND retagging source — two SET assignments, both
    against the pre-update row), and return everything on disk. The
    oracle applies the same CASE with explicit three-valued logic
    (NULL-predicate rows keep their bytes). Verifies the
    file-selective rewrite transforms exactly the matching rows and
    preserves every other row bit-for-bit.

    At 100 TB: one pushed-down discovery scan + a rewrite of only the
    files containing matches — cost scales with data under the
    predicate (same economics as delete_where)."""
    from pydala2_spark.operators.merge import update_where

    path = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_update")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "source"
    )
    docs.repartition(4).write.mode("overwrite").parquet(path)
    update_where(
        spark,
        path,
        "n_chars > 400 AND lang = 'en'",
        set={"n_chars": "n_chars * 2", "source": "'boosted'"},
    )
    return spark.read.parquet(path).select("doc_id", "lang", "n_chars", "source")



@query(
    "delete_where_semantics",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE NOT coalesce(n_chars > 400 AND lang = 'en', FALSE)
    """,
)
def delete_where_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level predicate DELETE, end to end: copy the corpus into a
    managed dataset, ``delete_where`` the long English documents, and
    return what SURVIVES on disk. The oracle is the complementary
    SELECT with explicit three-valued-logic handling (NULL-predicate
    rows survive). Verifies the file-selective rewrite preserves every
    non-matching row bit-for-bit — not just the counts.

    At 100 TB the matched-file discovery is one pushed-down scan
    (min/max prunes clean files), and only files containing matches
    rewrite — cost scales with data under the predicate, not the
    dataset."""
    from pydala2_spark.operators.merge import delete_where

    path = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_delete")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    docs.repartition(4).write.mode("overwrite").parquet(path)
    delete_where(spark, path, "n_chars > 400 AND lang = 'en'")
    return spark.read.parquet(path).select("doc_id", "lang", "n_chars")



@query(
    "snapshot_cdf",
    """
    SELECT 1 AS step, doc_id, lang, n_chars, 'insert' AS change_type
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT 3 AS step, doc_id, lang, n_chars, 'delete' AS change_type
    FROM documents WHERE lang = 'de'
    UNION ALL
    SELECT 3 AS step, doc_id, lang, n_chars + 7, 'update' AS change_type
    FROM documents WHERE lang <> 'de' AND n_chars < 300
    """,
)
def snapshot_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed over a full snapshot lifecycle, end to end:
    overwrite-commit v1 (90% of the corpus), append-commit v2 (the
    rest), compact to v3, overwrite-commit v4 with row edits (German
    docs dropped, short docs' n_chars bumped), then read the CDC feed
    of every step. The oracle states the expected feed directly from
    the source table: v1→v2 is exactly the appended rows as inserts,
    v2→v3 (compaction) is EMPTY — files rewrote but no row values
    changed — and v3→v4 is the deletes (pre image) + updates (post
    image).

    At 100 TB the manifest file-diff bounds every feed: the append
    feed reads only the appended files (plan-asserted in
    tests/test_snapshots.py), the compaction feed reads only rewritten
    files and joins them to themselves, and unchanged files never
    scan. See plans/snapshots.SnapshotDataset.changes."""
    import shutil

    from pydala2_spark.plans.snapshots import SnapshotDataset

    root = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_cdf")
    path = f"{root}/snap"
    shutil.rmtree(path, ignore_errors=True)  # version chain must be fresh
    base = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    ds = SnapshotDataset(spark, path)
    ds.commit(base.filter("doc_id % 10 != 0").repartition(4), mode="overwrite")
    ds.commit(base.filter("doc_id % 10 = 0"))
    assert ds.compact(small_file_max_bytes=1 << 40) is not None
    edited = base.filter("lang <> 'de'").withColumn(
        "n_chars",
        F.when(F.col("n_chars") < 300, F.col("n_chars") + 7).otherwise(
            F.col("n_chars")
        ),
    )
    ds.commit(edited.repartition(4), mode="overwrite")
    feeds = [
        ds.changes(v, v + 1, key_cols=["doc_id"]).withColumn("step", F.lit(v))
        for v in (1, 2, 3)
    ]
    out = feeds[0]
    for f in feeds[1:]:
        out = out.unionByName(f)
    return out.select(
        "step", "doc_id", "lang", "n_chars",
        F.col("_change_type").alias("change_type"),
    )



@query(
    "ivm_incremental_rollup",
    """
    SELECT lang, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN n_chars < 300 THEN n_chars + 7
                         ELSE n_chars END) AS BIGINT) AS sum_chars
    FROM documents WHERE lang <> 'de' GROUP BY lang
    """,
)
def ivm_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance, end to end: materialize a
    per-language count/sum rollup at snapshot v1, commit an edited v2
    (German docs dropped, short docs' n_chars bumped), then advance
    the rollup using ONLY the change feed (both update images) —
    never re-reading the base table. The oracle recomputes the v2
    rollup from scratch; the maintained state must land on it exactly
    (decimal-accumulated deltas, so summation order can't drift a
    bit).

    At 100 TB this is the always-fresh materialized aggregate:
    maintenance cost is one aggregation of |changes| + one join
    against |groups|, while the recompute it replaces is a full table
    scan. See operators/ivm."""
    import shutil

    from pydala2_spark.operators.ivm import apply_changes, rollup_state
    from pydala2_spark.plans.snapshots import SnapshotDataset

    root = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_ivm")
    path = f"{root}/snap"
    shutil.rmtree(path, ignore_errors=True)  # version chain must be fresh
    base = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    ds = SnapshotDataset(spark, path)
    ds.commit(base.repartition(4), mode="overwrite")
    edited = base.filter("lang <> 'de'").withColumn(
        "n_chars",
        F.when(F.col("n_chars") < 300, F.col("n_chars") + 7).otherwise(
            F.col("n_chars")
        ),
    )
    ds.commit(edited.repartition(4), mode="overwrite")
    state_v1 = rollup_state(ds.read(1), ["lang"], ["n_chars"])
    cdf = ds.changes(1, 2, key_cols=["doc_id"], update_images="both")
    state_v2 = apply_changes(state_v1, cdf, ["lang"], ["n_chars"])
    return state_v2.select(
        "lang", "n", F.col("sum_n_chars").cast("long").alias("sum_chars")
    )



@query(
    "ivm_join_rollup",
    """
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(CASE WHEN o.o_totalprice < 50000
                                    THEN o.o_totalprice + 10
                                    ELSE o.o_totalprice END
                          AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus <> 'P'
    GROUP BY 1
    """,
)
def ivm_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-JOIN view maintenance end to end: materialize revenue per
    customer segment over ``orders ⋈ customer`` at snapshot v1, commit
    an edited orders v2 ('P' orders dropped, cheap orders bumped),
    then advance the view from the fact change feed routed through the
    static dimension (``Δ(F ⋈ D) = ΔF ⋈ D``) — the 100 TB fact table
    is never re-read. The oracle recomputes the v2 join rollup from
    scratch; decimal-exact deltas land on it bit-for-bit. See
    operators/ivm.apply_fact_changes_through_join."""
    import shutil

    from pydala2_spark.operators.ivm import (
        apply_fact_changes_through_join,
        join_rollup_state,
    )
    from pydala2_spark.plans.snapshots import SnapshotDataset

    root = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_ivmj")
    path = f"{root}/snap"
    shutil.rmtree(path, ignore_errors=True)  # version chain must be fresh
    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    ds = SnapshotDataset(spark, path)
    ds.commit(base.repartition(4), mode="overwrite")
    edited = base.filter("o_orderstatus <> 'P'").withColumn(
        "o_totalprice",
        F.when(F.col("o_totalprice") < 50000, F.col("o_totalprice") + 10)
        .otherwise(F.col("o_totalprice")),
    )
    ds.commit(edited.repartition(4), mode="overwrite")
    state_v1 = join_rollup_state(
        ds.read(1), dim, "o_custkey", ["c_mktsegment"], ["o_totalprice"]
    )
    cdf = ds.changes(1, 2, key_cols=["o_orderkey"], update_images="both")
    state_v2 = apply_fact_changes_through_join(
        state_v1, cdf, dim, "o_custkey", ["c_mktsegment"], ["o_totalprice"]
    )
    return state_v2.select(
        "c_mktsegment",
        "n",
        F.round(F.col("sum_o_totalprice"), 2).cast("double").alias("revenue"),
    )



@query(
    "s12_update_metadata_writethrough",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE n_chars BETWEEN 200 AND 600
    """,
)
def s12_update_metadata_writethrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 write-through sidecar refresh, end to end (reference
    ``update_metadata=True`` on write, `pydala/dataset.py:1479-1530`):
    two writes land the corpus with the knob on, then the range query
    is answered THROUGH the StatsIndex-pruned scan. ``read_pruned`` is
    staleness-SAFE (unindexed files always scan), so correctness here
    is by construction; the write-through FRESHNESS itself is pinned
    by tests/test_analyze_fused.py's added==0 contracts. No manual
    ANALYZE anywhere.

    At 100 TB: each write's refresh footer-scans only the files that
    write added (distributed over executors), and the read prunes to
    files whose min/max overlap the range — I/O scales with data under
    the predicate, not with the dataset."""
    from pydala2_spark.plans.stats import StatsIndex
    from pydala2_spark.sources.dataset import ParquetDataset

    path = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_s12") + "/ds"
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    ds = ParquetDataset(path, spark)
    ds.write_to_dataset(
        docs.filter(F.col("doc_id") % 2 == 0).repartition(4),
        mode="overwrite",
        update_metadata=True,
    )
    ds.write_to_dataset(
        docs.filter(F.col("doc_id") % 2 != 0).repartition(4),
        mode="append",
        update_metadata=True,
    )
    pruned = StatsIndex(spark, path).read_pruned("n_chars", 200, 600)
    return pruned.filter(F.col("n_chars").between(200, 600)).select(
        "doc_id", "lang", "n_chars"
    )



def _hll_full_oracle_no_exact() -> str:
    from pydala2_spark.functions.sketch import hll_oracle_sql

    inner = hll_oracle_sql("orders", "o_orderpriority", "o_custkey", p=7)
    return (
        "SELECT o_orderpriority, hll_estimate, n_registers_hit FROM ("
        + inner
        + ")"
    )



@query("ivm_hll_distinct", _hll_full_oracle_no_exact())
def ivm_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained DISTINCT counts: commit orders v1 to a
    snapshot dataset, append the rest as v2, and advance the per-group
    HLL REGISTER state with the change feed's inserts only — the v1
    fact rows are never re-read. The oracle recomputes the full-table
    HLL from scratch; because registers merge by max (algebraic), the
    delta-maintained state must land on it BIT-FOR-BIT — the property
    that makes sketch-backed materialized views safe to advance
    forever. (Distinct-count IVM is append-only by nature: register
    max cannot retract a delete — a deleting feed needs a full
    register rebuild of the affected groups, documented here.)

    100 TB: maintenance cost is hash+max over the DELTA plus a
    |groups| x 2^p state merge — independent of the fact table's size;
    the register state is the only thing that persists between
    commits. See functions/sketch.hll_registers."""
    import shutil

    from pydala2_spark.functions.sketch import (
        hll_estimate_from_registers,
        hll_registers,
    )
    from pydala2_spark.plans.snapshots import SnapshotDataset

    root = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_ivmh")
    path = f"{root}/snap"
    shutil.rmtree(path, ignore_errors=True)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_custkey"
    )
    ds = SnapshotDataset(spark, path)
    ds.commit(orders.filter(F.col("o_orderkey") % 3 != 0).repartition(4))
    ds.commit(orders.filter(F.col("o_orderkey") % 3 == 0).repartition(2))
    state_v1 = hll_registers(ds.read(1), "o_orderpriority", "o_custkey", p=7)
    delta = ds.changes(1, 2, key_cols=["o_orderkey"]).filter(
        F.col("_change_type") == "insert"
    )
    delta_regs = hll_registers(delta, "o_orderpriority", "o_custkey", p=7)
    state_v2 = (
        state_v1.unionByName(delta_regs)
        .groupBy("o_orderpriority", "idx")
        .agg(F.max("r").alias("r"))
    )
    return hll_estimate_from_registers(state_v2, "o_orderpriority", p=7)



@query(
    "p_bloom_pruned_scan",
    """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id IN (7, 123, 456)
    """,
)
def p_bloom_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookups THROUGH the bloom-filter file index, end to end
    in the oracle gate (the sidecar family's s12-style driver proof:
    StatsIndex already has one, this is the bloom's): write the
    corpus as a multi-file dataset, build the per-file bloom sidecar
    on doc_id, then answer an IN-list probe by scanning ONLY the
    bloom-surviving files + the row-level filter. Blooms serve
    exactly the predicate min/max stats cannot — point lookups on
    high-cardinality UNCLUSTERED ids, where every file's min/max
    straddles every value. Must equal the oracle's full-scan IN.

    100 TB shape: the probe is a sidecar-only job (bounded by file
    count); the data scan touches only surviving files. Build cost is
    one scan amortized over every later lookup.
    See plans/bloom.build_bloom_index."""
    import shutil

    from pydala2_spark.plans.bloom import build_bloom_index, read_bloom_pruned

    root = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_bloomq")
    path = f"{root}/docs"
    shutil.rmtree(path, ignore_errors=True)
    # project to the probe's columns before the fixture write (guide
    # §2.3 "project before the exchange"): the bloom proof is about
    # file pruning on doc_id; shipping the text blobs through the
    # scatter shuffle and write adds nothing to it
    _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    ).repartition(8).write.parquet(path)
    build_bloom_index(spark, path, "doc_id", num_bits=1 << 14)
    vals = [7, 123, 456]
    pruned = read_bloom_pruned(spark, path, "doc_id", vals)
    return pruned.filter(F.col("doc_id").isin(vals)).select(
        "doc_id", "lang", "n_chars"
    )



@query(
    "m1_compact_roundtrip",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_custkey) AS BIGINT) AS custkey_sum
    FROM orders GROUP BY o_orderpriority
    """,
)
def m1_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (M1) driven through the oracle gate:
    write orders as a 40-file dataset, compact to row-bounded files,
    and prove the rewrite moved every row and invented none — the
    post-compaction aggregate must equal the oracle computed on the
    pristine table. Also pins the file-count contract (fewer, bounded
    files) inside the query itself: a silent row loss OR a bloated
    layout both fail loudly.

    100 TB shape: compaction is the per-partition rewrite with
    staging-dir atomic swap (operators/maintenance.compact_partitions
    — lazy CompactionPlan, no driver-side group materialization)."""
    import shutil

    from pydala2_spark.operators.maintenance import compact_partitions

    root = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_m1q")
    path = f"{root}/orders"
    shutil.rmtree(path, ignore_errors=True)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_custkey"
    )
    orders.repartition(40).write.parquet(path)
    # candidate rule is the reference's: a partition compacts only if
    # its TOTAL rows fit one output file — an effectively-unbounded
    # cap consolidates at every SF without paying a row-count job to
    # size it (r14: the count's only consumer was this cap)
    compact_partitions(spark, path, max_rows_per_file=2**62)
    import glob as _g

    n_files = len(_g.glob(f"{path}/*.parquet"))
    if not 0 < n_files < 40:
        raise AssertionError(
            f"compaction left {n_files} files — expected a consolidated "
            "layout strictly smaller than the 40-file input"
        )
    back = spark.read.parquet(path)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("o_custkey").cast("long").alias("custkey_sum"),
    )



@query(
    "snap_rollback_read",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders WHERE o_orderkey % 3 <> 0
    GROUP BY o_orderstatus
    """,
)
def snap_rollback_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot ROLLBACK driven through the oracle gate: commit v1
    (2/3 of orders), append the rest as v2, roll back to v1 — the
    rollback publishes a NEW auditable version whose file set equals
    v1's — and the head read must equal the oracle computed on the
    v1 slice. Proves the manifest math end to end: the v2 files are
    still on disk (time travel to v2 keeps working) yet invisible to
    the head reader.

    100 TB shape: rollback moves file NAMES in one manifest publish —
    nothing scales with data. See plans/snapshots.rollback."""
    import shutil

    from pydala2_spark.plans.snapshots import SnapshotDataset

    root = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_rbq")
    path = f"{root}/snap"
    shutil.rmtree(path, ignore_errors=True)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    ds = SnapshotDataset(spark, path)
    ds.commit(orders.filter(F.col("o_orderkey") % 3 != 0).repartition(4))
    ds.commit(orders.filter(F.col("o_orderkey") % 3 == 0).repartition(2))
    ds.rollback(1)
    return ds.read().groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
    )



@query(
    "m5_optimize_dtypes_roundtrip",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           CAST(max(o_custkey) AS BIGINT) AS max_cust
    FROM orders GROUP BY o_orderstatus
    """,
)
def m5_optimize_dtypes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dtype optimization (M5) driven through the oracle gate: write
    orders with a STRINGIFIED key column (the classic CSV-heritage
    smell), run optimize_dtypes — SAFE full-data validation, then an
    in-place staging-dir rewrite — and prove the round trip: the key
    column must come back integer-typed (asserted in-query) and the
    typed aggregates must equal the oracle computed on the pristine
    table. A silently-failed cast OR a row lost in the rewrite both
    fail loudly.

    100 TB shape: inference samples, validation and rewrite are one
    full pass each (operators/maintenance.optimize_dtypes)."""
    import shutil

    from pydala2_spark.operators.maintenance import optimize_dtypes

    root = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_m5q")
    path = f"{root}/orders"
    shutil.rmtree(path, ignore_errors=True)
    _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        "o_orderstatus",
    ).repartition(4).write.parquet(path)
    plan = optimize_dtypes(spark, path)
    if "o_orderkey" not in plan:
        raise AssertionError(
            f"optimize_dtypes proposed no cast for the stringified key: {plan}"
        )
    back = spark.read.parquet(path)
    kt = dict(back.dtypes)["o_orderkey"]
    if kt not in ("int", "bigint", "smallint"):
        raise AssertionError(f"o_orderkey came back {kt}, not integer-typed")
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        F.max("o_custkey").cast("long").alias("max_cust"),
    )



@query(
    "m6_schema_repair_roundtrip",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           CAST(round(sum(CAST(CASE WHEN o_orderkey % 2 = 1
                    THEN CAST(CAST(o_totalprice AS REAL) AS DOUBLE)
                    ELSE o_totalprice END AS DECIMAL(38,6))), 2) AS DOUBLE)
             AS price_sum
    FROM orders GROUP BY o_orderstatus
    """,
)
def m6_schema_repair_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema repair (M6) driven through the oracle gate: land two
    files with DRIFTED physical schemas in one dataset (even keys as
    bigint/double, odd keys as int/float — the classic
    multiple-writers smell), run repair_schema — promotion-ladder
    unify, then per-file atomic rewrite of nonconforming files — and
    prove the read: unified integer/double types (asserted in-query)
    and aggregates equal to the oracle, which models the float leg's
    precision loss explicitly (REAL->DOUBLE round trip). Every row
    must survive the per-file rewrite.

    100 TB shape: only nonconforming FILES rewrite; conforming data
    is untouched (operators/maintenance.repair_schema)."""
    import shutil

    from pydala2_spark.operators.maintenance import repair_schema

    root = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_m6q")
    path = f"{root}/orders"
    shutil.rmtree(path, ignore_errors=True)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    orders.filter(F.col("o_orderkey") % 2 == 0).repartition(2).write.parquet(
        path
    )
    orders.filter(F.col("o_orderkey") % 2 == 1).select(
        F.col("o_orderkey").cast("int").alias("o_orderkey"),
        "o_orderstatus",
        F.col("o_totalprice").cast("float").alias("o_totalprice"),
    ).repartition(2).write.mode("append").parquet(path)
    plan = repair_schema(spark, path)
    if not plan["files"]:
        raise AssertionError("repair_schema found nothing to rewrite")
    back = spark.read.parquet(path)
    dts = dict(back.dtypes)
    if dts["o_orderkey"] != "bigint" or dts["o_totalprice"] != "double":
        raise AssertionError(f"unify landed on the wrong ladder rung: {dts}")
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        _dsum("o_totalprice", 2).alias("price_sum"),
    )



@query(
    "p_zorder_pruned_scan",
    """
    SELECT l_orderkey, l_partkey, l_suppkey, round(l_extendedprice, 2)
             AS price
    FROM lineitem
    WHERE l_partkey BETWEEN 500 AND 600
      AND l_suppkey BETWEEN 10 AND 60
    """,
)
def p_zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustering driven through the oracle gate — the last
    member of the data-skipping family after the StatsIndex (s12) and
    bloom proofs: write lineitem scattered (no useful file min/max on
    either column), Z-order-rewrite on (l_partkey, l_suppkey), refresh
    the stats sidecar, and answer a two-dimensional range predicate
    THROUGH StatsIndex.read_pruned. The in-query contract asserts the
    pruned scan read strictly fewer files than the layout holds —
    i.e. the interleaved-bit clustering actually tightened per-file
    min/max on BOTH columns, which a linear sort cannot do for the
    trailing one — and the rows must equal the full-scan oracle.

    100 TB shape: one range shuffle on the Morton key at maintenance
    time buys min/max pruning for every later multi-dimension range
    query; the probe is sidecar-only (file-count bounded).
    See operators/maintenance.zorder_rewrite."""
    import shutil

    from pydala2_spark.operators.maintenance import zorder_rewrite
    from pydala2_spark.plans.stats import StatsIndex

    root = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_zoq")
    path = f"{root}/li"
    shutil.rmtree(path, ignore_errors=True)
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    # scatter: hash-random layout = every file straddles every range
    li.repartition(16).write.parquet(path)
    zorder_rewrite(spark, path, ["l_partkey", "l_suppkey"], target_file_count=16)
    idx = StatsIndex(spark, path)
    idx.refresh()
    import glob as _g

    n_layout = len(_g.glob(f"{path}/*.parquet"))
    n_pruned = len(idx.prune("l_partkey", 500, 600))
    # strictly fewer files than the layout holds; ZERO is legitimate
    # (a range matching nothing prunes everything — at sf0.001 the
    # probe range is beyond the part key space)
    if not n_pruned < n_layout:
        raise AssertionError(
            f"z-order pruning read {n_pruned} of {n_layout} files — "
            "clustering failed to tighten per-file min/max"
        )
    pruned = idx.read_pruned("l_partkey", 500, 600)
    return pruned.filter(
        F.col("l_partkey").between(500, 600)
        & F.col("l_suppkey").between(10, 60)
    ).select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.round("l_extendedprice", 2).alias("price"),
    )



_BUCKETED_ORACLE = """
    SELECT c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE), 2)
             AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """



@query("j_bucketed_join", _BUCKETED_ORACLE)
def j_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join driven through the oracle gate: write
    orders and customer as bucketed tables on the customer key
    (sources/writer.write_bucketed — pay the shuffle ONCE at write
    time), then join them and prove (a) the physical plan has NO
    shuffle exchange with broadcast disabled — asserted inside the
    query, so a silent bucketing regression fails loudly — and (b)
    the result matches the plain-join oracle on the pristine parquet.
    At 100 TB this is the difference between re-shuffling the fact
    table on every query and never shuffling it again.
    See sources/writer.write_bucketed; tests/test_bucketing.py pins
    the same no-Exchange contract on synthetic data."""
    from pydala2_spark.sources.writer import write_bucketed

    root = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_bktq")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "r11_bucketed_orders",
        "custkey",
        num_buckets=16,
        path=f"{root}/orders",
    )
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "custkey"),
        "r11_bucketed_customer",
        "custkey",
        num_buckets=16,
        path=f"{root}/customer",
    )
    joined = spark.table("r11_bucketed_orders").join(
        spark.table("r11_bucketed_customer"), "custkey"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = spark.table("r11_bucketed_orders").join(
            spark.table("r11_bucketed_customer"), "custkey"
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        if "Exchange" in plan:
            raise AssertionError(
                "bucketed join planned a shuffle exchange - bucketing "
                "metadata was lost:\n" + plan
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,2)")).cast("double"),
            2,
        ).alias("revenue"),
    )



_DPP_ORACLE = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2)
             AS value_sum
    FROM events
    WHERE dayofweek(date_trunc('day', ts)) + 1 = 2
    GROUP BY 1
    """



@query("p_dynamic_partition_pruning", _DPP_ORACLE)
def p_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning driven through the oracle gate: land
    events day-partitioned, join the fact against a filtered dim
    (Mondays), and assert INSIDE the query that the fact scan carries
    a ``dynamicpruningexpression`` PartitionFilter (the broadcast-
    reusing subquery that prunes fact partitions at RUNTIME from the
    dim side) — the Spark feature that turns a 100 TB
    fact-x-filtered-dim join into a read of only the matching
    partitions, complementing hive_partitioned_scan's static pruning.
    The oracle recomputes the Monday aggregate from the pristine
    table, so the partitioned round-trip must also preserve values."""
    path = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_dppq")
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "value", F.to_date("ts").alias("d")
    )
    ev.write.mode("overwrite").partitionBy("d").parquet(path)
    fact = spark.read.parquet(path)
    dim = (
        fact.select("d")
        .distinct()
        .withColumn("dow", F.dayofweek("d"))
        .filter(F.col("dow") == 2)
    )
    joined = fact.join(dim, "d")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "dynamicpruningexpression" not in plan:
        raise AssertionError(
            "fact scan lost its dynamic partition pruning filter:\n" + plan
        )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 2
        ).alias("value_sum"),
    )


@query(
    "m2_compact_timeperiod_roundtrip",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM events GROUP BY 1
    """,
)
def m2_compact_timeperiod_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-period compaction (M2) driven through the oracle gate:
    events land as a 30-file dataset, compact into one file per DAY
    bucket, and the post-compaction per-day aggregate must equal the
    oracle computed on the pristine table — a silent row loss, a
    duplicated row, or a bucket-boundary misassignment all flip the
    hash. The file-count contract (≤ one file per day, fewer than the
    input) pins inside the query.

    100 TB shape: the single-job fast path — rows rejoin their
    interval bucket via a broadcast (file → group) equi-join, ONE
    shuffle on the bucket gives each (interval) one output file
    (operators/maintenance.compact_by_timeperiod)."""
    import glob as _g
    import shutil

    from pydala2_spark.operators.maintenance import compact_by_timeperiod

    root = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_m2q")
    path = f"{root}/events"
    shutil.rmtree(path, ignore_errors=True)
    ev = _t(spark, sf_dir, "events").select("event_id", "ts")
    ev.repartition(30).write.parquet(path)
    # effectively-unbounded cap: one file per day bucket at every SF,
    # without a row-count job whose only consumer was this cap (r14)
    compact_by_timeperiod(
        spark, path, interval="1d", timestamp_column="ts",
        max_rows_per_file=2**62,
    )
    n_days = spark.read.parquet(path).select(
        F.to_date("ts").alias("d")
    ).distinct().count()
    n_files = len(_g.glob(f"{path}/*.parquet"))
    if not 0 < n_files <= min(n_days, 29):
        raise AssertionError(
            f"time-period compaction left {n_files} files for {n_days} "
            "days — expected at most one per day and fewer than the "
            "30-file input"
        )
    back = spark.read.parquet(path)
    return back.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("event_id").cast("long").alias("id_sum"),
    )


@query(
    "m3_compact_rows_roundtrip",
    """
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT p_partkey) AS BIGINT) AS n_keys,
           CAST(sum(p_size) AS BIGINT) AS size_sum
    FROM part
    """,
)
def m3_compact_rows_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-count compaction (M3) driven through the oracle gate: part
    lands as a 25-file unpartitioned dataset, compacts to row-bounded
    files, and the corpus totals must match the pristine oracle. The
    layout contract (ceil(rows / cap) files, fewer than input) pins
    inside the query.

    100 TB shape: one scan + one repartition(n_target) write with
    maxRecordsPerFile; delete-old after publish
    (operators/maintenance.compact_by_rows)."""
    import glob as _g
    import math as _m
    import shutil

    from pydala2_spark.operators.maintenance import compact_by_rows

    root = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_m3q")
    path = f"{root}/part"
    shutil.rmtree(path, ignore_errors=True)
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_size")
    part.repartition(25).write.parquet(path)
    n_rows = spark.read.parquet(path).count()
    cap = max(1, _m.ceil(n_rows / 4))  # target ~4 files at any SF
    compact_by_rows(spark, path, max_rows_per_file=cap)
    n_files = len(_g.glob(f"{path}/*.parquet"))
    if not 0 < n_files < 25:
        raise AssertionError(
            f"row compaction left {n_files} files — expected a "
            "consolidated layout strictly smaller than the 25-file input"
        )
    back = spark.read.parquet(path)
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("p_partkey").cast("long").alias("n_keys"),
        F.sum("p_size").cast("long").alias("size_sum"),
    )


@query(
    "m4_repartition_roundtrip",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2)
                AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
    """,
)
def m4_repartition_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive re-layout (M4) driven through the oracle gate: orders land
    flat, repartition into a year=... hive layout (the partition
    column DERIVED from the timestamp — the reference's datepart
    pipeline), and the per-year aggregate read back THROUGH the
    partition column must match the pristine oracle. The layout
    contract (a year=* directory per year, partition pruning works)
    pins inside the query: the readback groups by the hive column
    itself, so a misassigned row changes a group's hash.

    100 TB shape: one scan + one partitionBy write into a staging dir
    with atomic rename swap (operators/maintenance.repartition_dataset)."""
    import glob as _g
    import shutil

    from pydala2_spark.operators.maintenance import repartition_dataset

    root = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_m4q")
    path = f"{root}/orders"
    shutil.rmtree(path, ignore_errors=True)
    orders = _t(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    orders.repartition(8).write.parquet(path)
    repartition_dataset(
        spark, path, partitioning_columns=["year"],
        timestamp_column="o_orderdate",
    )
    year_dirs = _g.glob(f"{path}/year=*")
    if not year_dirs:
        raise AssertionError("repartition produced no year=* hive dirs")
    back = spark.read.option("basePath", path).parquet(path)
    return back.groupBy(F.col("year").cast("long").alias("year")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")), 2
        ).cast("double").alias("revenue"),
    )
