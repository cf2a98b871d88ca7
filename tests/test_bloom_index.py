"""Bloom-filter file index: no false negatives, real pruning power on
the exact shape min/max stats cannot prune (uniform high-cardinality
ids), conservative handling of unindexed files."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pydala2_spark.plans.bloom import bloom_prune, build_bloom_index, read_bloom_pruned
from pydala2_spark.plans.stats import StatsIndex

N_FILES = 8
N_ROWS = 4000


@pytest.fixture(scope="module")
def bloom_ds(spark, tmp_path_factory):
    """Uniform random ids shuffled across files: every file's [min,max]
    spans ~the full id range, the worst case for min/max pruning."""
    path = str(tmp_path_factory.mktemp("bloom") / "ds")
    rng = random.Random(7)
    ids = list(range(N_ROWS))
    rng.shuffle(ids)
    rows = [(i, f"doc-{i}") for i in ids]
    df = spark.createDataFrame(rows, "id long, name string")
    df.repartition(N_FILES).write.mode("overwrite").parquet(path)
    build_bloom_index(spark, path, "id", num_bits=1 << 16)
    build_bloom_index(spark, path, "name", num_bits=1 << 16)
    return path


def _norm(paths):
    import re as _re

    return {_re.sub(r"^[A-Za-z0-9+.-]+:/+", "/", p) for p in paths}


def _file_of(spark, path, id_):
    return _norm(
        r["f"]
        for r in spark.read.parquet(path)
        .where(F.col("id") == id_)
        .select(F.input_file_name().alias("f"))
        .collect()
    )


def test_minmax_cannot_prune_uniform_ids(spark, bloom_ds):
    # the motivating contrast: stats-index range pruning keeps every
    # file for a point probe on shuffled uniform ids
    idx = StatsIndex(spark, bloom_ds)
    kept = idx.prune("id", lo=1234, hi=1234)
    assert len(kept) == N_FILES


def test_bloom_prunes_point_lookup(spark, bloom_ds):
    probe = 1234
    kept = bloom_prune(spark, bloom_ds, "id", [probe])
    assert _file_of(spark, bloom_ds, probe) <= _norm(kept)  # no false negative
    assert len(kept) < N_FILES  # actually prunes
    # pruned read + row filter == full filter
    got = read_bloom_pruned(spark, bloom_ds, "id", [probe]).where(F.col("id") == probe)
    assert [r["name"] for r in got.collect()] == [f"doc-{probe}"]


def test_no_false_negatives_sampled(spark, bloom_ds):
    rng = random.Random(21)
    sample = rng.sample(range(N_ROWS), 40)
    kept = _norm(bloom_prune(spark, bloom_ds, "id", sample))
    for v in sample:
        assert _file_of(spark, bloom_ds, v) <= kept


def test_in_list_unions_candidates(spark, bloom_ds):
    vals = [10, 2222, 3999]
    kept = _norm(bloom_prune(spark, bloom_ds, "id", vals))
    per_value = set()
    for v in vals:
        per_value |= _file_of(spark, bloom_ds, v)
    assert per_value <= kept


def test_string_column_probe(spark, bloom_ds):
    kept = bloom_prune(spark, bloom_ds, "name", ["doc-77"])
    assert _file_of(spark, bloom_ds, 77) <= _norm(kept)
    assert len(kept) < N_FILES
    got = read_bloom_pruned(spark, bloom_ds, "name", ["doc-77"]).where(
        F.col("name") == "doc-77"
    )
    assert [r["id"] for r in got.collect()] == [77]


def test_absent_value_prunes_everything_or_fp_rate(spark, bloom_ds):
    # values far outside the inserted domain: only bloom false
    # positives may survive; at 2^16 bits / 500 values per file the fp
    # rate is ~0, so expect zero files for most probes
    kept = bloom_prune(spark, bloom_ds, "id", [10_000_000])
    assert len(kept) <= 1


def test_appended_files_kept_conservatively(spark, bloom_ds, tmp_path):
    extra = spark.createDataFrame([(99_999_999, "late")], "id long, name string")
    extra.repartition(1).write.mode("append").parquet(bloom_ds)
    try:
        kept = bloom_prune(spark, bloom_ds, "id", [99_999_999])
        # the appended file is not in the index → must be kept
        assert _file_of(spark, bloom_ds, 99_999_999) <= _norm(kept)
    finally:
        from pydala2_spark.plans.fs import delete_paths

        late = _file_of(spark, bloom_ds, 99_999_999)
        delete_paths(spark, list(late))


def test_empty_probe_and_missing_index(spark, bloom_ds, tmp_ds_path):
    assert bloom_prune(spark, bloom_ds, "id", []) == []
    spark.createDataFrame([(1, "a")], "id long, name string").repartition(1).write.parquet(
        tmp_ds_path
    )
    # no index built → every file kept
    kept = bloom_prune(spark, tmp_ds_path, "id", [42])
    assert len(kept) == 1


def test_rejects_bad_params(spark, bloom_ds):
    with pytest.raises(ValueError):
        build_bloom_index(spark, bloom_ds, "id", num_bits=1000)
    with pytest.raises(ValueError):
        build_bloom_index(spark, bloom_ds, "id", num_hashes=0)
    with pytest.raises(ValueError):
        build_bloom_index(spark, bloom_ds, "id; drop table x")


def test_sidecar_hidden_from_dataset_scans(spark, bloom_ds):
    # underscore-prefixed sidecar must not pollute reads
    assert spark.read.parquet(bloom_ds).columns == ["id", "name"]


def test_dataset_api_surface(spark, bloom_ds):
    from pydala2_spark.sources.dataset import ParquetDataset

    ds = ParquetDataset(bloom_ds, spark=spark)
    got = ds.scan_point("id", [1234]).where(F.col("id") == 1234)
    assert [r["name"] for r in got.collect()] == ["doc-1234"]


# -- NDV sketch sidecar (same uniform-id fixture) --------------------


def test_ndv_sketches_estimate_and_subsets(spark, bloom_ds):
    from pydala2_spark.plans.fs import list_files
    from pydala2_spark.plans.stats import build_ndv_sketches, estimate_ndv

    out = build_ndv_sketches(spark, bloom_ds, ["id", "name"])
    assert out["rows"] == 2 * N_FILES  # one sketch per (file, column)

    # full-dataset estimate within HLL error (~1.6% at lg_k=12)
    est = estimate_ndv(spark, bloom_ds, "id")
    assert abs(est - N_ROWS) / N_ROWS < 0.05

    # subset estimate: half the files hold ~half the distinct ids
    files = list_files(spark, bloom_ds, suffixes=(".parquet",))
    half = files[: len(files) // 2]
    est_half = estimate_ndv(spark, bloom_ds, "id", files=half)
    true_half = (
        spark.read.parquet(*half).select("id").distinct().count()
    )
    assert abs(est_half - true_half) / true_half < 0.05

    # string column too
    est_name = estimate_ndv(spark, bloom_ds, "name")
    assert abs(est_name - N_ROWS) / N_ROWS < 0.05


def test_ndv_sketch_sidecar_hidden(spark, bloom_ds):
    assert spark.read.parquet(bloom_ds).columns == ["id", "name"]


def test_binary_column_probe_no_false_negative(spark, tmp_ds_path):
    """Binary probes must hash the raw BYTES, not str(bytes) — the
    content-hash column use case from the module docstring."""
    import hashlib

    rows = [(i, hashlib.md5(str(i).encode()).digest()) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, content_md5 binary")
    df.repartition(4).write.parquet(tmp_ds_path)
    build_bloom_index(spark, tmp_ds_path, "content_md5", num_bits=1 << 16)

    probe = hashlib.md5(b"123").digest()
    kept = bloom_prune(spark, tmp_ds_path, "content_md5", [probe])
    holder = _norm(
        r["f"]
        for r in spark.read.parquet(tmp_ds_path)
        .where(F.col("content_md5") == probe)
        .select(F.input_file_name().alias("f"))
        .collect()
    )
    assert holder  # the value exists
    assert holder <= _norm(kept)  # and its file survives pruning
    assert len(kept) < 4  # while the index still prunes


def test_incremental_refreshes_cover_appended_files(spark, tmp_ds_path):
    """bloom + NDV sidecars refresh incrementally: only appended files
    are scanned, and both probes then see the new data."""
    from pydala2_spark.plans.bloom import refresh_bloom_index
    from pydala2_spark.plans.stats import (
        build_ndv_sketches,
        estimate_ndv,
        refresh_ndv_sketches,
    )

    df = spark.createDataFrame([(i, f"d{i}") for i in range(200)], "id long, name string")
    df.repartition(2).write.parquet(tmp_ds_path)
    build_bloom_index(spark, tmp_ds_path, "id", num_bits=1 << 16)
    build_ndv_sketches(spark, tmp_ds_path, ["id"])

    # append a file holding a brand-new id
    spark.createDataFrame([(5555, "late")], "id long, name string").coalesce(
        1
    ).write.mode("append").parquet(tmp_ds_path)

    out_b = refresh_bloom_index(spark, tmp_ds_path, "id")
    assert out_b["added"] == 1 and out_b["removed"] == 0 and out_b["total"] == 3
    # after refresh the new file is INDEXED (not conservative-kept):
    # probing an absent value prunes everything
    assert bloom_prune(spark, tmp_ds_path, "id", [999_999]) == []
    # and the new id's file is found
    kept = bloom_prune(spark, tmp_ds_path, "id", [5555])
    assert len(kept) >= 1
    got = spark.read.parquet(*kept).where(F.col("id") == 5555)
    assert got.count() == 1

    out_s = refresh_ndv_sketches(spark, tmp_ds_path)
    assert out_s["added"] == 1 and out_s["total"] == 3
    est = estimate_ndv(spark, tmp_ds_path, "id")  # staleness guard passes
    assert abs(est - 201) / 201 < 0.05


def test_ndv_zero_row_file_is_sketched_member(spark, tmp_ds_path):
    """A zero-row part file gets a membership marker: the staleness
    guard must pass right after a build (it used to raise forever)."""
    from pydala2_spark.plans.stats import build_ndv_sketches, estimate_ndv

    spark.createDataFrame([(1,), (2,)], "id long").repartition(1).write.parquet(tmp_ds_path)
    # produce an empty part file via an empty append
    spark.createDataFrame([], "id long").repartition(1).write.mode("append").parquet(
        tmp_ds_path
    )
    build_ndv_sketches(spark, tmp_ds_path, ["id"])
    est = estimate_ndv(spark, tmp_ds_path, "id")  # must not raise
    assert est == 2


def test_writer_native_parquet_bloom_filters(spark, tmp_path):
    """bloom_filter_columns writes REAL parquet bloom filters (the
    file grows by the filter's size — this pyarrow build exposes no
    bloom metadata API, so size is the observable), expected.ndv
    shrinks them, and the data round-trips unchanged."""
    import glob
    import os

    from pydala2_spark.sources.writer import Writer

    # high-cardinality key: parquet-mr SKIPS blooms for fully
    # dictionary-encoded (low-NDV) columns — the dictionary already
    # answers point lookups exactly, so only non-dict columns carry one
    df = spark.range(5000).selectExpr("id", "CAST(id AS STRING) AS k",
                                      "id * 2 AS v")

    def total(p):
        return sum(os.path.getsize(f) for f in glob.glob(f"{p}/*.parquet"))

    plain = str(tmp_path / "plain")
    Writer(spark, plain).write(df, mode="overwrite", target_file_count=1)
    on = str(tmp_path / "on")
    Writer(spark, on).write(
        df, mode="overwrite", target_file_count=1, bloom_filter_columns=["k"]
    )
    sized = str(tmp_path / "sized")
    Writer(spark, sized).write(
        df, mode="overwrite", target_file_count=1,
        bloom_filter_columns=["k"], bloom_filter_ndv=100,
    )
    assert total(on) > total(plain) + 100_000   # default-NDV filter present
    assert total(plain) < total(sized) < total(on)  # ndv shrinks it

    back = spark.read.parquet(on)
    assert back.count() == 5000
    assert back.filter("k = '13'").count() == 1
