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
    from pydala2_spark.sources.testdata import read_table
    from pydala2_spark.sources.writer import Writer

    docs = read_table(spark, sf_dir, "documents")

    # 1. curation: disposition per doc, keep survivors
    disp = curate_corpus(docs)
    kept = docs.join(disp.filter("status = 'kept'").select("doc_id"), "doc_id")

    # 2. mixture: temperature-flatten the (source, lang) distribution,
    # then materialize with the md5-coin sampler (deterministic)
    rates = {
        f"{r['source']}|{r['lang']}": r["rate"]
        for r in temperature_resample_rates(kept, alpha=0.5).collect()
    }
    strat = kept.withColumn("__mix", F.concat_ws("|", "source", "lang"))
    mixed = stratified_sample(strat, rates, group_col="__mix").drop("__mix")

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
