"""Merge contract tests — behavior parity with the reference's
tests/test_dataset_merge.py (insert/update/upsert counts, null-safe
keys, last-row-wins, inferred keys, list-as-batch, partition rules)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from pydala2_spark import Dataset, MergeResult


def t(**cols):
    return pa.table(cols)


def rows(ds, *cols):
    ds.clear_cache()
    return sorted([tuple(r[c] for c in cols) for r in ds.df.collect()])


def test_merge_into_missing_target_inserts_all(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    r = ds.merge(t(id=[1, 2, 3], v=["a", "b", "c"]), strategy="insert", key_columns=["id"])
    assert isinstance(r, MergeResult)
    assert r.inserted == 3
    assert r.target_count_after == 3


def test_merge_typed_result_counts(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    r = ds.merge(t(id=[1, 2], v=["a", "b"]), strategy="upsert", key_columns=["id"])
    assert r.strategy == "upsert"
    assert r.target_count_before == 0
    assert r.target_count_after == 2
    assert r.inserted == 2
    assert r.updated == 0


def test_merge_insert_noop_when_keys_exist(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.merge(t(id=[1, 2], v=["a", "b"]), strategy="upsert", key_columns=["id"])
    r = ds.merge(t(id=[1, 2], v=["X", "X"]), strategy="insert", key_columns=["id"])
    assert r.inserted == 0 and r.updated == 0
    assert rows(ds, "id", "v") == [(1, "a"), (2, "b")]


def test_merge_update_noop_when_no_match(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.merge(t(id=[1, 2], v=["a", "b"]), strategy="upsert", key_columns=["id"])
    r = ds.merge(t(id=[3, 4], v=["c", "d"]), strategy="update", key_columns=["id"])
    assert r.inserted == 0 and r.updated == 0
    assert rows(ds, "id", "v") == [(1, "a"), (2, "b")]


def test_merge_upsert_updates_and_inserts(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.merge(t(id=[1, 2], v=["a", "b"]), strategy="upsert", key_columns=["id"])
    r = ds.merge(t(id=[2, 3], v=["B", "c"]), strategy="upsert", key_columns=["id"])
    assert r.updated == 1 and r.inserted == 1
    assert rows(ds, "id", "v") == [(1, "a"), (2, "B"), (3, "c")]


def test_merge_update_rewrites_matched_files_only(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.merge(t(id=[1], v=["a"]), strategy="upsert", key_columns=["id"])
    ds.merge(t(id=[2], v=["b"]), strategy="upsert", key_columns=["id"])
    r = ds.merge(t(id=[1], v=["A"]), strategy="update", key_columns=["id"])
    assert r.updated == 1 and r.inserted == 0
    assert len(r.rewritten_files) >= 1
    assert r.preserved_files
    assert rows(ds, "id", "v") == [(1, "A"), (2, "b")]


def test_merge_null_safe_composite_keys(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.merge(t(id=[121221], value=["abc"]), strategy="insert", key_columns=["id", "value"])
    r1 = ds.merge(t(id=[121221], value=[None]), strategy="insert", key_columns=["id", "value"])
    r2 = ds.merge(t(id=[121221], value=[None]), strategy="insert", key_columns=["id", "value"])
    assert r1.inserted == 1
    assert r2.inserted == 0


def test_merge_duplicate_source_keys_last_wins(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.merge(t(id=[1], v=["orig"]), strategy="upsert", key_columns=["id"])
    r = ds.merge(
        t(id=[2, 2, 2], v=["first", "second", "third"]), strategy="upsert", key_columns=["id"]
    )
    assert r.inserted == 1
    assert rows(ds, "id", "v") == [(1, "orig"), (2, "third")]


def test_merge_list_is_one_batch_last_wins(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    r = ds.merge(
        [t(id=[1], v=["first"]), t(id=[1], v=["second"])], strategy="upsert", key_columns=["id"]
    )
    assert r.inserted == 1
    assert rows(ds, "id", "v") == [(1, "second")]


def test_merge_composite_keys(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.merge(t(a=[1, 1], b=["x", "y"], v=["ax", "by"]), strategy="upsert", key_columns=["a", "b"])
    r = ds.merge(t(a=[1, 2], b=["x", "z"], v=["AX", "cz"]), strategy="upsert", key_columns=["a", "b"])
    assert r.updated == 1 and r.inserted == 1
    assert rows(ds, "a", "b", "v") == [(1, "x", "AX"), (1, "y", "by"), (2, "z", "cz")]


def test_merge_key_inference_whole_row(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.merge(t(id=[1], value=["first"]), strategy="upsert")
    r = ds.merge(t(id=[1], value=["changed"]), strategy="upsert")
    assert r.inserted == 1
    assert rows(ds, "id", "value") == [(1, "changed"), (1, "first")]


def test_merge_schema_cast_to_target(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.merge(t(id=[1], v=["a"]), strategy="upsert", key_columns=["id"])
    r = ds.merge(
        pa.table({"id": pa.array([2], pa.int64()), "v": pa.array([42], pa.int32())}),
        strategy="insert",
        key_columns=["id"],
    )
    assert r.inserted == 1
    assert rows(ds, "id", "v") == [(1, "a"), (2, "42")]


def test_merge_partitioned_upsert(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.merge(
        t(id=[1, 2], region=["eu", "us"], v=["one", "two"]),
        strategy="upsert",
        key_columns=["id"],
        partition_by=["region"],
    )
    r = ds.merge(
        t(id=[1, 3], region=["eu", "eu"], v=["ONE", "three"]),
        strategy="upsert",
        key_columns=["id"],
        partition_by=["region"],
    )
    assert r.updated == 1 and r.inserted == 1
    assert rows(ds, "id", "region", "v") == [
        (1, "eu", "ONE"),
        (2, "us", "two"),
        (3, "eu", "three"),
    ]


def test_merge_rejects_partition_move(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.merge(
        t(id=[1], region=["eu"], v=["one"]),
        strategy="upsert",
        key_columns=["id"],
        partition_by=["region"],
    )
    with pytest.raises(ValueError):
        ds.merge(
            t(id=[1], region=["us"], v=["moved"]),
            strategy="update",
            key_columns=["id"],
            partition_by=["region"],
        )
    assert rows(ds, "id", "region", "v") == [(1, "eu", "one")]


def test_merge_partition_aware_followup(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.merge(
        t(id=[1], region=["eu"], v=["one"]),
        strategy="upsert",
        key_columns=["id"],
        partition_by=["region"],
    )
    r = ds.merge(t(id=[2], region=["us"], v=["two"]), strategy="insert", key_columns=["id"])
    assert r.inserted == 1
    import glob

    assert glob.glob(f"{tmp_ds_path}/region=us/*.parquet")


def test_merge_rejects_bad_args(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    with pytest.raises(ValueError):
        ds.merge(t(id=[1]), strategy="delete", key_columns=["id"])
    with pytest.raises(ValueError):
        ds.merge(t(id=[1]), strategy="upsert", key_columns=[])
    with pytest.raises(TypeError):
        ds.merge("not a frame", strategy="upsert", key_columns=["id"])


def test_merge_empty_source_noop(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.merge(t(id=[1], v=["a"]), strategy="upsert", key_columns=["id"])
    r = ds.merge(t(id=pa.array([], pa.int64()), v=pa.array([], pa.string())),
                 strategy="upsert", key_columns=["id"])
    assert r.inserted == 0 and r.updated == 0
    assert r.source_count == 0
    assert rows(ds, "id", "v") == [(1, "a")]


def test_merge_source_families(spark, tmp_ds_path):
    import duckdb
    import pandas as pd

    families = [
        pa.table({"id": [1], "v": ["a"]}),
        pa.RecordBatch.from_arrays([pa.array([1]), pa.array(["a"])], names=["id", "v"]),
        pd.DataFrame({"id": [1], "v": ["a"]}),
        duckdb.sql("SELECT 1 AS id, 'a' AS v"),
    ]
    for i, src in enumerate(families):
        ds = Dataset(f"{tmp_ds_path}_{i}", spark)
        r = ds.merge(src, strategy="upsert", key_columns=["id"])
        assert r.target_count_after == 1, type(src)


# -- delete_where: row-level predicate delete (round 6) -----------------


def test_delete_where_file_selective(spark, tmp_path):
    """Only files containing matching rows rewrite; untouched files
    keep their names; counts and survivors are exact."""
    from pydala2_spark.operators.merge import delete_where
    from pydala2_spark.plans.fs import list_files

    p = str(tmp_path / "ds")
    # three files with disjoint id ranges
    for lo in (0, 100, 200):
        spark.range(lo, lo + 50).selectExpr(
            "id", "id % 7 AS grp"
        ).repartition(1).write.mode("append").parquet(p)
    before = set(list_files(spark, p))
    assert len(before) == 3

    out = delete_where(spark, p, "id >= 100 AND id < 110")
    assert out["deleted_rows"] == 10
    assert len(out["matched_files"]) == 1  # min/max isolates one file
    after = spark.read.parquet(p)
    assert after.count() == 140
    assert after.filter("id >= 100 AND id < 110").count() == 0
    # the two untouched files survive by NAME
    preserved = set(out["preserved_files"])
    assert preserved <= before and len(preserved) == 2
    assert preserved <= set(list_files(spark, p))


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    """SQL DELETE three-valued logic: rows where the predicate is
    NULL are NOT deleted."""
    from pydala2_spark.operators.merge import delete_where

    p = str(tmp_path / "ds")
    spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 50.0)], "id long, v double"
    ).repartition(1).write.parquet(p)
    out = delete_where(spark, p, "v > 10")
    assert out["deleted_rows"] == 1
    left = {r["id"] for r in spark.read.parquet(p).collect()}
    assert left == {1, 2}  # the NULL row survives


def test_delete_where_noop_and_missing_target(spark, tmp_path):
    from pydala2_spark.operators.merge import delete_where

    p = str(tmp_path / "ds")
    assert delete_where(spark, p, "id > 5")["deleted_rows"] == 0  # absent
    spark.range(10).repartition(1).write.parquet(p)
    out = delete_where(spark, p, "id > 99")  # no matches
    assert out["deleted_rows"] == 0 and out["rewritten_files"] == []
    assert spark.read.parquet(p).count() == 10


def test_delete_where_partitioned_dataset(spark, tmp_path):
    """Rewrites land back in the right hive partitions; whole-partition
    deletes leave the other partitions untouched."""
    from pydala2_spark.sources.dataset import Dataset

    p = str(tmp_path / "ds")
    spark.range(100).selectExpr(
        "id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS part"
    ).write.partitionBy("part").parquet(p)
    ds = Dataset(p, spark=spark, partitioning=["part"])
    out = ds.delete_where("part = 'a' AND id < 50")
    assert out["deleted_rows"] == 25
    left = ds.df
    assert left.count() == 75
    assert left.filter("part = 'a'").count() == 25
    assert left.filter("part = 'b'").count() == 50
    # partition column still rehydrates from directories
    assert set(r["part"] for r in left.select("part").distinct().collect()) == {"a", "b"}


def test_delete_where_predicate_pushdown(spark, tmp_path):
    """The matched-file discovery scan pushes the predicate to parquet
    (min/max row-group pruning does the skipping at scale) — asserted
    on the REAL discovery frame delete_where scans (_delete_discovery),
    not a re-implementation."""
    from pyspark.sql import functions as F

    from pydala2_spark.operators.merge import _FILE, _delete_discovery

    p = str(tmp_path / "ds")
    spark.range(1000).repartition(1).write.parquet(p)
    tagged = spark.read.parquet(p).withColumn(_FILE, F.col("_metadata.file_path"))
    plan = (
        _delete_discovery(tagged, F.expr("id > 900"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "id" in plan.split("PushedFilters:")[1][:120]


def test_file_filter_broadcast_join_above_literal_limit(spark, tmp_path, monkeypatch):
    """Above _FILE_LITERAL_LIMIT the matched-file restriction switches
    from a driver-built IN literal to a broadcast semi-join: identical
    delete/merge semantics, and the physical plan carries a broadcast
    join instead of a file-list literal (a 10^5-file predicate at
    100 TB would otherwise be a multi-megabyte plan string)."""
    from pydala2_spark.operators import merge as m
    from pydala2_spark.operators.merge import delete_where, merge

    monkeypatch.setattr(m, "_FILE_LITERAL_LIMIT", 0)  # force the join path

    # the helper itself: no IN literal, broadcast join in the plan
    import pyspark.sql.functions as F

    p0 = str(tmp_path / "probe")
    spark.range(0, 100).repartition(1).write.parquet(p0)
    tagged = spark.read.parquet(p0).withColumn(
        m._FILE, F.col("_metadata.file_path")
    )
    files = [r[m._FILE] for r in tagged.select(m._FILE).distinct().collect()]
    plan = m._filter_to_files(tagged, files)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert files[0] not in plan  # file names are broadcast data, not plan text
    assert m._filter_to_files(tagged, files).count() == 100

    # delete_where end-to-end through the join path
    p = str(tmp_path / "ds")
    for lo in (0, 100, 200):
        spark.range(lo, lo + 50).selectExpr("id", "id % 7 AS grp").coalesce(
            1
        ).write.mode("append").parquet(p)
    out = delete_where(spark, p, "id >= 100 AND id < 110")
    assert out["deleted_rows"] == 10
    after = spark.read.parquet(p)
    assert after.count() == 140
    assert after.filter("id >= 100 AND id < 110").count() == 0

    # merge upsert end-to-end through the join path
    p2 = str(tmp_path / "ds2")
    spark.range(0, 20).selectExpr("id", "id * 2 AS v").repartition(1).write.parquet(p2)
    src = spark.range(15, 25).selectExpr("id", "id * 100 AS v")
    res = m.merge(spark, p2, src, key_columns=["id"], strategy="upsert")
    assert res.updated == 5 and res.inserted == 5
    got = {r["id"]: r["v"] for r in spark.read.parquet(p2).collect()}
    assert got[15] == 1500 and got[24] == 2400 and got[0] == 0 and len(got) == 25


def test_update_where_semantics_and_file_selectivity(spark, tmp_path):
    """SET applies only to TRUE-predicate rows (NULL preserves); all
    assignments see the PRE-update row (swap stays correct); files
    without matches keep their names; SET validation raises."""
    import pytest
    from pyspark.sql import functions as F

    from pydala2_spark.operators.merge import update_where

    path = str(tmp_path / "upd")
    rows = [
        (1, 10.0, 100.0, "a"),
        (2, 20.0, 200.0, "a"),
        (3, None, 300.0, "b"),   # NULL predicate -> preserved
        (4, 40.0, 400.0, "b"),
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double, g string")
    # one file per g-partition so selectivity is observable
    df.repartition("g").write.partitionBy("g").parquet(path)

    before = set(spark.read.parquet(path).select(
        F.col("_metadata.file_path")).distinct().toPandas()["file_path"])

    out = update_where(
        spark, path, "x >= 20 AND g = 'a'",
        set={"x": "y", "y": "x"},  # swap: both read pre-update values
    )
    assert out["updated_rows"] == 1
    got = {r["id"]: (r["x"], r["y"]) for r in spark.read.parquet(path).collect()}
    assert got[2] == (200.0, 20.0)      # swapped
    assert got[1] == (10.0, 100.0)      # untouched (pred false)
    assert got[3] == (None, 300.0)      # NULL predicate preserved
    assert got[4] == (40.0, 400.0)

    after = set(spark.read.parquet(path).select(
        F.col("_metadata.file_path")).distinct().toPandas()["file_path"])
    preserved_b = {f for f in before if "g=b" in f}
    assert preserved_b <= after  # b-partition files untouched
    assert set(out["preserved_files"]) == {f for f in before if "g=b" in f}

    with pytest.raises(ValueError, match="SET columns"):
        update_where(spark, path, "x > 0", set={"nope": "1"})
    with pytest.raises(ValueError, match="SET assignment"):
        update_where(spark, path, "x > 0", set={})

    # idempotence of a no-match predicate
    out2 = update_where(spark, path, "x > 1e9", set={"x": "0.0"})
    assert out2["updated_rows"] == 0 and out2["rewritten_files"] == []
