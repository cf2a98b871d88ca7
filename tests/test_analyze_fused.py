"""Fused ANALYZE contracts: one shared data scan builds sidecars
row-identical to the sequential single-sidecar builders, incremental
discipline survives per-sidecar, and the data is opened exactly once
per analyze regardless of how many columns are indexed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pydala2_spark.plans.analyze import analyze_dataset
from pydala2_spark.plans.bloom import _SENTINEL, bloom_prune, refresh_bloom_index
from pydala2_spark.plans.stats import (
    StatsIndex,
    build_ndv_sketches,
    estimate_ndv,
    ndv_sidecar_path,
    refresh_ndv_sketches,
)

from conftest import make_simple_pdf


def _write_batches(spark, path, n_batches, rows=40):
    for i in range(n_batches):
        pdf = make_simple_pdf(rows, seed=i * rows)
        spark.createDataFrame(pdf).repartition(1).write.mode("append").parquet(path)


def _bloom_rows(spark, path, col):
    df = spark.read.parquet(f"{path}/_bloom_index/{col}")
    return sorted(
        (r["file_path"], r["word_index"], r["word"], r["num_bits"], r["num_hashes"], r["value_type"])
        for r in df.collect()
    )


def _ndv_membership(spark, path):
    df = spark.read.parquet(ndv_sidecar_path(path))
    return sorted(
        (r["file_path"], r["column"], r["lg_k"]) for r in df.collect()
    )


def test_fused_equals_sequential(spark, tmp_ds_path):
    """The fused build must produce sidecars row-identical (bloom) /
    estimate-identical (NDV — sketch bytes legitimately vary with
    merge order) to the sequential builders over the SAME data: build
    sequentially, record, wipe the sidecars, build fused, compare."""
    import shutil

    _write_batches(spark, tmp_ds_path, 3)

    StatsIndex(spark, tmp_ds_path).refresh()
    refresh_bloom_index(spark, tmp_ds_path, "id")
    refresh_bloom_index(spark, tmp_ds_path, "name")
    build_ndv_sketches(spark, tmp_ds_path, ["id", "name"])
    seq_bloom = {c: _bloom_rows(spark, tmp_ds_path, c) for c in ("id", "name")}
    seq_stats = sorted(
        (r["file_path"], r["num_rows"], r["size_bytes"])
        for r in StatsIndex(spark, tmp_ds_path).stats().collect()
    )
    seq_ndv = {c: estimate_ndv(spark, tmp_ds_path, c) for c in ("id", "name")}
    seq_members = _ndv_membership(spark, tmp_ds_path)

    for side in ("_bloom_index", "_ndv_sketches", "_stats_index"):
        shutil.rmtree(f"{tmp_ds_path}/{side}", ignore_errors=True)

    out = analyze_dataset(
        spark, tmp_ds_path, bloom_columns=["id", "name"], ndv_columns=["id", "name"]
    )
    assert out["stats"]["added"] == 3
    assert out["bloom:id"]["added"] == 3 and out["bloom:name"]["added"] == 3
    assert out["ndv"]["files"] == 3 and sorted(out["ndv"]["columns"]) == ["id", "name"]

    # bloom words are deterministic (bit_or is order-free): word-for-word
    for col in ("id", "name"):
        assert _bloom_rows(spark, tmp_ds_path, col) == seq_bloom[col]
    assert (
        sorted(
            (r["file_path"], r["num_rows"], r["size_bytes"])
            for r in StatsIndex(spark, tmp_ds_path).stats().collect()
        )
        == seq_stats
    )
    for col in ("id", "name"):
        assert estimate_ndv(spark, tmp_ds_path, col) == seq_ndv[col]
    assert _ndv_membership(spark, tmp_ds_path) == seq_members


def test_fused_incremental_and_out_of_sync(spark, tmp_ds_path):
    """After an append, fused analyze must (a) index only the appended
    files for already-built sidecars, (b) full-scan a newly requested
    NDV column, (c) keep bloom's no-false-negative contract."""
    _write_batches(spark, tmp_ds_path, 2)
    analyze_dataset(spark, tmp_ds_path, bloom_columns=["id"], ndv_columns=["id"])

    _write_batches(spark, tmp_ds_path, 1)  # ids 0..39 again → one more file
    out = analyze_dataset(
        spark, tmp_ds_path, bloom_columns=["id", "name"], ndv_columns=["id", "name"]
    )
    assert out["stats"]["added"] == 1 and out["stats"]["total"] == 3
    assert out["bloom:id"]["added"] == 1  # incremental
    assert out["bloom:name"]["added"] == 3  # fresh build
    assert out["ndv"]["added"] == 1 and out["ndv"]["new_columns"] == ["name"]

    # bloom: every id value must keep its containing file (no false negatives)
    for probe, n_expected_min in ((0, 2), (45, 1), (75, 1)):
        kept = bloom_prune(spark, tmp_ds_path, "id", [probe])
        df = spark.read.parquet(*kept).filter(F.col("id") == probe)
        want = spark.read.parquet(tmp_ds_path).filter(F.col("id") == probe).count()
        assert df.count() == want and want >= n_expected_min
    # NDV: the new column's estimate covers ALL files, not just appended
    approx = estimate_ndv(spark, tmp_ds_path, "name")
    exact = spark.read.parquet(tmp_ds_path).select("name").distinct().count()
    assert abs(approx - exact) <= max(2, exact * 0.05)


def test_fused_recovers_from_emptied_sidecars(spark, tmp_ds_path):
    """An analyze after ALL data files were removed writes EMPTY
    sidecars (no parameter rows); the next analyze over new files must
    REBUILD instead of crashing on the missing parameter row — and
    invalid bloom parameters are rejected up front (an unvalidated
    num_hashes=0 sidecar would silently prune every file)."""
    import shutil

    _write_batches(spark, tmp_ds_path, 2)
    analyze_dataset(spark, tmp_ds_path, bloom_columns=["id"], ndv_columns=["id"])

    # wipe data, keep sidecar dirs → refresh writes empty sidecars
    for f in spark.read.parquet(tmp_ds_path).inputFiles():
        import os

        os.remove(f.replace("file:", ""))
    analyze_dataset(spark, tmp_ds_path, bloom_columns=["id"], ndv_columns=["id"])

    _write_batches(spark, tmp_ds_path, 1)  # new data arrives
    out = analyze_dataset(spark, tmp_ds_path, bloom_columns=["id"], ndv_columns=["id"])
    assert out["bloom:id"]["added"] == 1 and out["ndv"]["files"] == 1
    kept = bloom_prune(spark, tmp_ds_path, "id", [5])
    assert spark.read.parquet(*kept).filter(F.col("id") == 5).count() == 1
    assert estimate_ndv(spark, tmp_ds_path, "id") > 0

    with pytest.raises(ValueError):
        analyze_dataset(spark, tmp_ds_path, bloom_columns=["id"], num_hashes=0)
    with pytest.raises(ValueError):
        analyze_dataset(spark, tmp_ds_path, bloom_columns=["id"], num_bits=1000)


def test_fused_single_data_scan(spark, tmp_ds_path, monkeypatch):
    """Structural pin for the fusion: with 2 bloom + 2 NDV columns, the
    DATA files are opened by exactly ONE DataFrameReader call (sidecar
    reads don't count; the StatsIndex footer pass doesn't go through
    the reader at all). Before the fusion this was 4+ data scans."""
    from pyspark.sql.readwriter import DataFrameReader

    _write_batches(spark, tmp_ds_path, 2)
    # pre-build so the refresh path (the common case) is what's pinned
    analyze_dataset(
        spark, tmp_ds_path, bloom_columns=["id", "name"], ndv_columns=["id", "name"]
    )
    _write_batches(spark, tmp_ds_path, 1)

    calls: list[tuple[str, ...]] = []
    orig = DataFrameReader.parquet

    def spy(self, *paths):
        calls.append(paths)
        return orig(self, *paths)

    monkeypatch.setattr(DataFrameReader, "parquet", spy)
    out = analyze_dataset(
        spark, tmp_ds_path, bloom_columns=["id", "name"], ndv_columns=["id", "name"]
    )
    assert out["stats"]["added"] == 1

    sidecar_markers = ("_bloom_index", "_ndv_sketches", "_stats_index", "__staging")
    data_scans = [
        c for c in calls if not any(m in p for p in c for m in sidecar_markers)
    ]
    assert len(data_scans) == 1, f"expected 1 data scan, saw {data_scans}"
    # and that one scan touches only the appended file
    assert len(data_scans[0]) == 1


def test_update_metadata_write_through(spark, tmp_ds_path):
    """S12 write-through (reference ``update_metadata=True``,
    `pydala/dataset.py:1479-1530`): a write/DML with the knob folds the
    touched files into every EXISTING sidecar in the same call — a
    follow-up analyze finds nothing left to index — and never invents
    sidecars the caller didn't build."""
    import os

    from pydala2_spark.sources.dataset import CSVDataset, ParquetDataset

    _write_batches(spark, tmp_ds_path, 2)
    analyze_dataset(spark, tmp_ds_path, bloom_columns=["id"], ndv_columns=["id"])

    ds = ParquetDataset(tmp_ds_path, spark)
    ds.write_to_dataset(
        spark.createDataFrame(make_simple_pdf(40, seed=1000)),
        mode="append",
        update_metadata=True,
    )
    # everything the write added is already indexed in ALL sidecars
    out = analyze_dataset(spark, tmp_ds_path, bloom_columns=["id"], ndv_columns=["id"])
    assert out["stats"]["added"] == 0 and out["stats"]["removed"] == 0
    assert out["bloom:id"]["added"] == 0
    assert out["ndv"]["added"] == 0 and out["ndv"]["new_columns"] == []
    # no sidecar invention: only the opted-into bloom column exists
    assert os.listdir(f"{tmp_ds_path}/_bloom_index") == ["id"]

    # row-level DML write-through: rewritten-away files leave the
    # index, replacement files enter it, in the same call
    ds.delete_where("id < 5", update_metadata=True)
    out = analyze_dataset(spark, tmp_ds_path, bloom_columns=["id"], ndv_columns=["id"])
    assert out["stats"]["added"] == 0 and out["stats"]["removed"] == 0
    assert out["bloom:id"]["added"] == 0
    assert out["ndv"]["added"] == 0
    # the index matches the live layout exactly
    live = {p.rsplit("/", 1)[-1] for p in ds.files()}
    indexed = {
        r["file_path"].rsplit("/", 1)[-1]
        for r in StatsIndex(spark, tmp_ds_path).stats().collect()
    }
    assert indexed == live

    # sidecars are parquet-footer-derived: non-parquet formats refuse
    with pytest.raises(ValueError, match="parquet"):
        CSVDataset(f"{tmp_ds_path}_csv", spark).write_to_dataset(
            spark.createDataFrame(make_simple_pdf(5)), update_metadata=True
        )


def test_update_metadata_stats_only_when_no_sidecars(spark, tmp_ds_path):
    """With no sidecars built yet, ``update_metadata=True`` maintains
    just the StatsIndex (always-on min/max skipping) and leaves the
    opt-in bloom/NDV layers absent."""
    import os

    from pydala2_spark.sources.dataset import ParquetDataset

    ds = ParquetDataset(tmp_ds_path, spark)
    ds.write_to_dataset(
        spark.createDataFrame(make_simple_pdf(30)), mode="append", update_metadata=True
    )
    idx = StatsIndex(spark, tmp_ds_path)
    assert idx.exists() and idx.stats().count() >= 1
    assert idx.refresh()["added"] == 0  # nothing left unindexed
    assert not os.path.exists(f"{tmp_ds_path}/_bloom_index")
    assert not os.path.exists(ndv_sidecar_path(tmp_ds_path))

    # explicit method form: sync after an out-of-band write
    spark.createDataFrame(make_simple_pdf(5, seed=99)).repartition(1).write.mode(
        "append"
    ).parquet(tmp_ds_path)
    r = ds.refresh_metadata()
    assert r["stats"]["added"] == 1
    assert StatsIndex(spark, tmp_ds_path).refresh()["added"] == 0


def test_read_pruned_safe_under_stale_index(spark, tmp_ds_path):
    """A stale StatsIndex (append after the last refresh — or a lost
    concurrent write-through race) must degrade to extra I/O, never to
    silently missing rows: read_pruned unions every unindexed live
    file into the scan."""
    _write_batches(spark, tmp_ds_path, 2)
    idx = StatsIndex(spark, tmp_ds_path)
    idx.refresh()
    # out-of-band append the index has never seen
    spark.createDataFrame(make_simple_pdf(40, seed=5000)).repartition(1).write.mode(
        "append"
    ).parquet(tmp_ds_path)
    got = (
        idx.read_pruned("id", 5000, 5039)
        .filter("id BETWEEN 5000 AND 5039")
        .count()
    )
    assert got == 40  # the unindexed file's rows all arrive
    # prune() itself stays index-only (documented): no unindexed paths
    assert len(idx.prune("id", 5000, 5039)) == 0
