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
