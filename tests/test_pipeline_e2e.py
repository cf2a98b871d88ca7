"""End-to-end training-data pipeline: the full lifecycle a corpus
build runs, composed from the individually-verified operators —
curate (quality gate → exact dedup → near-dup clusters) → mixture
(temperature resample over a deterministic md5 coin) → pack into
fixed token budgets → write a managed dataset. Run twice from the
same inputs, the output must be byte-for-byte identical: every stage
is engineered deterministic (md5 coins, min-id keepers, tie-broken
windows), so the pipeline is reproducible across runs, executors and
engines.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _run_pipeline(spark, sf_dir: str, out_path: str):
    from pydala2_spark.operators.curate import (
        curate_corpus,
        pack_sequences,
        stratified_sample,
        temperature_resample_rates,
    )
    from pydala2_spark.operators.dedup import remove_boilerplate_segments
    from pydala2_spark.sources.testdata import read_table
    from pydala2_spark.sources.writer import Writer

    docs = read_table(spark, sf_dir, "documents")

    # 1. curation: disposition per doc, keep survivors
    disp = curate_corpus(docs)
    kept = docs.join(disp.filter("status = 'kept'").select("doc_id"), "doc_id")

    # 1b. boilerplate edit on the survivors: cut corpus-frequent
    # segments, rebuild text (docs reduced to nothing drop out); the
    # token-derived columns are recomputed from the cleaned text so
    # downstream packing budgets see the post-edit sizes
    cleaned = remove_boilerplate_segments(kept, k=3, min_docs=2)
    kept = (
        kept.drop("text", "n_chars")
        .join(cleaned.select("doc_id", F.col("cleaned").alias("text")), "doc_id")
        .withColumn("n_chars", F.length("text"))
    )

    # 2. mixture: temperature-flatten the (source, lang) distribution,
    # then materialize with the md5-coin sampler (deterministic)
    rates = {
        f"{r['source']}|{r['lang']}": r["rate"]
        for r in temperature_resample_rates(kept, alpha=0.5).collect()
    }
    strat = kept.withColumn("__mix", F.concat_ws("|", "source", "lang"))
    mixed = stratified_sample(strat, rates, group_col="__mix").drop("__mix")

    # 2b. quota: no source contributes more than 60 docs post-mix
    # (count bound on top of the rate-based mixture), best-quality
    # first via doc length as the stand-in score
    from pydala2_spark.operators.curate import source_quota_cap

    mixed = source_quota_cap(
        mixed, cap=60, group_col="source", order_col="n_chars", descending=True
    )

    # 3. pack into 512-token budgets per language
    packed = pack_sequences(mixed, budget=512)

    # 4. write the packed manifest as a managed dataset
    Writer(spark, out_path).write(packed, mode="overwrite", partition_by=["lang"])
    return spark.read.parquet(out_path)


def _fingerprint(df) -> list:
    rows = df.select(
        F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in sorted(df.columns)]))
        .alias("h")
    )
    return sorted(r["h"] for r in rows.collect())


def test_full_pipeline_runs_and_is_reproducible(spark, sf_dir, tmp_path):
    out_a = str(tmp_path / "run_a")
    out_b = str(tmp_path / "run_b")
    a = _run_pipeline(spark, sf_dir, out_a)
    b = _run_pipeline(spark, sf_dir, out_b)

    # non-trivial output with the expected manifest schema
    assert a.count() > 0
    assert set(a.columns) == {"lang", "seq_id", "n_docs", "seq_tokens"}
    # no sequence exceeds its budget except single-doc overflows
    over = a.filter((F.col("seq_tokens") > 512) & (F.col("n_docs") > 1)).count()
    assert over == 0

    # byte-for-byte reproducible across runs
    assert _fingerprint(a) == _fingerprint(b)


def test_pipeline_curation_reduces_corpus(spark, sf_dir):
    from pydala2_spark.operators.curate import curate_corpus
    from pydala2_spark.sources.testdata import read_table

    docs = read_table(spark, sf_dir, "documents")
    disp = curate_corpus(docs)
    by_status = {r["status"]: r["n"] for r in disp.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(by_status.values()) == docs.count()  # total conservation
    assert by_status.get("kept", 0) > 0


def test_managed_corpus_lifecycle_snapshots_bloom_ndv(spark, sf_dir, tmp_path):
    """The storage-side lifecycle composed end to end: raw corpus
    lands as snapshot v1, the curated corpus publishes as v2
    (overwrite — raw stays time-travelable), a bloom index serves
    point lookups on the curated files, and HLL sketches answer
    per-version cardinality without rescans."""
    from pydala2_spark.operators.curate import curate_corpus
    from pydala2_spark.plans.bloom import bloom_prune, build_bloom_index
    from pydala2_spark.plans.snapshots import SnapshotDataset
    from pydala2_spark.plans.stats import build_ndv_sketches, estimate_ndv
    from pydala2_spark.sources.testdata import read_table

    docs = read_table(spark, sf_dir, "documents")
    path = str(tmp_path / "managed_corpus")
    ds = SnapshotDataset(spark, path)

    m1 = ds.commit(docs)
    n_raw = ds.read().count()
    assert n_raw == docs.count()

    curated = curate_corpus(docs).filter(F.col("status") == "kept")
    kept = docs.join(curated.select("doc_id"), "doc_id", "left_semi")
    m2 = ds.commit(kept, mode="overwrite")
    n_cur = ds.read().count()
    assert 0 < n_cur < n_raw  # curation dropped something
    assert ds.read(version=m1["version"]).count() == n_raw  # raw preserved

    # point lookup on the curated VERSION: bloom prunes at directory
    # grain (v1 + v2 files both hold the id), the manifest narrows to
    # the version — intersect the two file sets
    some_id = ds.read().select("doc_id").orderBy("doc_id").first()["doc_id"]
    build_bloom_index(spark, path, "doc_id")
    keep_files = bloom_prune(spark, path, "doc_id", [some_id])
    assert keep_files  # conservative, non-empty
    import re

    v2_files = {f"/{path.lstrip('/')}/{rel}" for rel in m2["files"]}
    v2_kept = [
        f for f in keep_files
        if re.sub(r"^[A-Za-z0-9+.-]+:/+", "/", f) in v2_files
    ]
    got = spark.read.parquet(*v2_kept).filter(F.col("doc_id") == some_id)
    assert got.count() == 1

    # per-version NDV from sketches: curated strictly fewer docs
    build_ndv_sketches(spark, path, ["doc_id"])
    files_v2 = [f"{path}/{rel}" for rel in m2["files"]]
    est_v2 = estimate_ndv(spark, path, "doc_id", files=files_v2)
    assert abs(est_v2 - n_cur) / n_cur < 0.05
    files_v1 = [f"{path}/{rel}" for rel in m1["files"]]
    est_v1 = estimate_ndv(spark, path, "doc_id", files=files_v1)
    assert abs(est_v1 - n_raw) / n_raw < 0.05
    assert est_v2 < est_v1


def test_app_scoped_tmp_liveness_and_prune(spark, tmp_path, monkeypatch):
    """_app_scoped_tmp must never prune the LIVE app's own scratch —
    liveness is signaled by use (mtime refresh on every call), so a
    harness run longer than the prune horizon keeps its round-trip
    dataset; stale sibling directories (finished runs) are removed."""
    import os
    import time

    from pydala2_spark.queries import _app_scoped_tmp

    prefix = f"pydala2_test_tmp_{os.getpid()}"
    root = f"/tmp/{prefix}"
    own = _app_scoped_tmp(spark, "sfX", prefix)
    os.makedirs(own, exist_ok=True)
    marker = os.path.join(own, "dataset.parquet")
    open(marker, "w").close()
    # age OUR directory past the horizon, plus a stale sibling
    old = time.time() - 3 * 3600
    os.utime(own, (old, old))
    stale = os.path.join(root, "deadbeef00")
    os.makedirs(stale, exist_ok=True)
    os.utime(stale, (old, old))
    got = _app_scoped_tmp(spark, "sfX", prefix)
    assert got == own
    assert os.path.exists(marker), "live app's scratch was pruned"
    assert os.path.getmtime(own) > time.time() - 60, "mtime not refreshed"
    assert not os.path.exists(stale), "stale sibling survived the prune"
    import shutil

    shutil.rmtree(root, ignore_errors=True)


def test_cms_stream_equals_batch_sketch_across_microbatches(spark, tmp_path):
    """Counters folded incrementally over TWO microbatches equal the
    batch cms_build over the union — associativity end to end — and
    the state key space stays within depth*width."""
    import datetime as dt

    from pydala2_spark.functions.sketch import cms_build
    from pydala2_spark.streaming.pipeline import (
        cms_stream,
        read_event_stream,
        run_to_memory,
    )

    zone = tmp_path / "cms_zone"
    zone.mkdir()
    base = dt.datetime(2024, 1, 1)

    def _mk(tag, uids):
        rows = [
            (i, u, "view", base + dt.timedelta(minutes=i), 1.0, "{}")
            for i, u in enumerate(uids)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, "
            "ts timestamp_ntz, value double, props string",
        )
        df.repartition(1).write.mode("overwrite").parquet(str(zone / tag))
        # move the part file into the flat zone so each is one microbatch
        import glob
        import shutil

        part = glob.glob(str(zone / tag / "*.parquet"))[0]
        shutil.move(part, str(zone / f"{tag}.parquet"))
        shutil.rmtree(str(zone / tag))
        return df

    d1 = _mk("a", [1, 1, 2, 3])
    d2 = _mk("b", [1, 2, 2, 9])

    events = read_event_stream(spark, str(zone), max_files_per_trigger=1)
    ck = tmp_path / "ck_cms"
    got = run_to_memory(
        cms_stream(events, "user_id", depth=3, width=32),
        "cms_t",
        str(ck),
        state_partitions=2,
        output_mode="complete",
    )
    want = cms_build(d1.unionByName(d2), "user_id", depth=3, width=32)
    g = {(r["row_id"], r["bucket"]): r["cnt"] for r in got.collect()}
    w = {(r["row_id"], r["bucket"]): r["cnt"] for r in want.collect()}
    assert g == w
    assert len(g) <= 3 * 32


def test_priority_sample_contracts(spark):
    """Priority sampling (Duffield-Lund-Thorup) contracts: bounded at
    k; heavy rows (w >= tau) always sampled at exact weight; inputs
    that fit in k degrade to exact (tau=0, est=w); the HT total lands
    inside a ~4/sqrt(k) envelope of the true total; deterministic."""
    from pyspark.sql import functions as F

    from pydala2_spark.operators.curate import priority_sample

    df = spark.range(2000).select(
        F.col("id").alias("k_"),
        (F.col("id") % 97 + 1).cast("long").alias("w"),
    )
    k = 64
    s = priority_sample(df, "k_", "w", k=k)
    rows = s.collect()
    assert len(rows) == k
    tau = rows[0]["__tau"]
    assert all(r["__tau"] == tau for r in rows)
    # every row with w >= tau must be in the sample, at exact weight
    heavy = {r["k_"] for r in df.filter(F.col("w") >= tau).collect()}
    sampled = {r["k_"] for r in rows}
    assert heavy <= sampled
    for r in rows:
        if r["w"] >= tau:
            assert r["__w_est"] == float(r["w"])
    # HT total ~ true total (variance <= Var(optimal k-1 sample); the
    # envelope is generous on purpose -- this is one draw)
    est_total = sum(r["__w_est"] for r in rows)
    true_total = df.agg(F.sum("w")).first()[0]
    assert abs(est_total - true_total) / true_total < 4 / (k ** 0.5)
    # determinism
    again = priority_sample(df, "k_", "w", k=k).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    # input smaller than k: exact passthrough with tau = 0
    tiny = df.limit(10)
    t = priority_sample(tiny, "k_", "w", k=k).collect()
    assert len(t) == 10
    assert all(r["__tau"] == 0.0 and r["__w_est"] == float(r["w"]) for r in t)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        priority_sample(df, "k_", "w", k=0)
