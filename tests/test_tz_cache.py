"""timestamp_column timezone detection + cached-filesystem parity
(reference `pydala/dataset.py:1160-1175`, `pydala/filesystem.py:179-227`)."""

from __future__ import annotations

import pandas as pd
import pytest

from pydala2_spark.sources.dataset import Dataset


def _write_ts(spark, path):
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
        }
    )
    spark.createDataFrame(pdf).write.parquet(path)


def test_tz_detected_for_instant_timestamps(spark, tmp_ds_path):
    _write_ts(spark, tmp_ds_path)
    ds = Dataset(tmp_ds_path, spark)
    assert ds.timestamp_column == "ts"
    assert ds.tz == "UTC"  # session writes adjusted-to-UTC micros


def test_apply_session_timezone(spark, tmp_ds_path):
    _write_ts(spark, tmp_ds_path)
    before = spark.conf.get("spark.sql.session.timeZone")
    try:
        applied = Dataset(tmp_ds_path, spark).apply_session_timezone()
        assert applied == "UTC"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", before)


def test_tz_none_for_ntz(spark, tmp_ds_path):
    spark.sql(
        "SELECT 1 AS id, timestamp_ntz'2024-01-01 10:00:00' AS ts"
    ).write.parquet(tmp_ds_path)
    ds = Dataset(tmp_ds_path, spark)
    assert ds.timestamp_column == "ts"
    assert ds.tz is None  # wall-clock timestamps carry no zone


# -- cached filesystem -------------------------------------------------


def test_local_cache_sync_and_serve(spark, tmp_path):
    from pydala2_spark.plans.cachefs import LocalCache

    remote = str(tmp_path / "remote")
    _write_ts(spark, remote)
    cache = LocalCache(spark, remote, cache_dir=str(tmp_path / "cache"))

    copied = cache.sync()
    assert len(copied) >= 1
    assert cache.sync() == []  # fresh cache → nothing re-copied

    ds = cache.dataset()
    assert ds.count_rows() == 3
    assert all(f.startswith("file:") and "/cache" in f for f in ds.files())


def test_local_cache_incremental_and_invalidate(spark, tmp_path):
    from pydala2_spark.plans.cachefs import LocalCache

    remote = str(tmp_path / "remote")
    _write_ts(spark, remote)
    cache = LocalCache(spark, remote, cache_dir=str(tmp_path / "cache"))
    cache.sync()

    # remote grows → only the new file is pulled
    spark.createDataFrame(
        pd.DataFrame({"id": [4], "ts": pd.to_datetime(["2024-01-04"])})
    ).write.mode("append").parquet(remote)
    newly = cache.sync()
    assert len(newly) >= 1
    assert cache.dataset().count_rows() == 4

    cache.invalidate()
    assert cache.sync()  # everything re-downloads after invalidation
