"""1000x scaling spot-check — the '1000 executors, 1000x data' question
measured directly for the cheap single-pass / bounded-state shapes.

Builds the 1000x corpus by re-replicating the EXISTING 100x ops corpus
(/tmp/sfscale_ops_x100) 10x with shifted keys — a 1000-way union from
sf0.1 would blow up driver planning; 10 x 100 keeps the plan small.
Events shift user_id (the r10e lesson: shifting only event_id squares
per-user fanout, a replication artifact); embeddings shift vec_id with
a tiny deterministic wobble; documents shift doc_id.

Timed at 1x (sf0.1-derived ops corpus) vs 1000x, reps=1 (these are
minutes-long at the top end; the signal is the ratio's ORDER, not its
second digit).

Usage: python scripts/scaling_1000x.py [--skip-build] [--only=a,b]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pydala2_spark.session import get_spark

SRC = "/tmp/sfscale_ops_x100"
ROOT = "/tmp/sfscale_ops_x1000"


def build(spark):
    os.makedirs(ROOT, exist_ok=True)
    ev = spark.read.parquet(f"{SRC}/ev_big")
    mu = ev.agg(F.max("user_id")).first()[0] + 1
    me = ev.agg(F.max("event_id")).first()[0] + 1
    big = ev
    for c in range(1, 10):
        big = big.unionByName(
            ev.withColumn("user_id", F.col("user_id") + F.lit(c * mu))
            .withColumn("event_id", F.col("event_id") + F.lit(c * me))
        )
    big.repartition(256).write.mode("overwrite").parquet(f"{ROOT}/ev")
    emb = spark.read.parquet(f"{SRC}/emb_big")
    nv = emb.agg(F.max("vec_id")).first()[0] + 1
    mbig = emb
    for c in range(1, 10):
        mbig = mbig.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(c * nv))
            .withColumn(
                "embedding",
                F.transform(
                    "embedding", lambda x: (x * (1.0 + c * 1e-5)).cast("float")
                ),
            )
        )
    mbig.repartition(128).write.mode("overwrite").parquet(f"{ROOT}/emb")
    dd = spark.read.parquet(f"{SRC}/docs_big")
    nd = dd.agg(F.max("doc_id")).first()[0] + 1
    dbig = dd
    for c in range(1, 10):
        dbig = dbig.unionByName(
            dd.withColumn("doc_id", F.col("doc_id") + F.lit(c * nd))
        )
    dbig.repartition(256).write.mode("overwrite").parquet(f"{ROOT}/docs")


def main():
    from pydala2_spark.functions.dq import chi2_independence
    from pydala2_spark.operators.dedup import exact_duplicates
    from pydala2_spark.operators.events import (
        anova_oneway,
        concurrency_sweep,
        rfm_scores,
    )
    from pydala2_spark.operators.similarity import embedding_drift

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a[len("--only="):].split(",")

    def want(op):
        return only is None or any(s in op for s in only)

    if "--skip-build" not in sys.argv:
        t0 = time.time()
        build(spark)
        print(f"build: {time.time() - t0:.0f} s", flush=True)

    def timed(fn):
        t0 = time.time()
        fn()
        return round(time.time() - t0, 2)

    def norm_ts(df):
        if dict(df.dtypes).get("ts") == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df

    frames = {
        "1x": {
            "ev": norm_ts(spark.read.parquet(f"{SRC}/ev_1x")),
            "emb": spark.read.parquet(f"{SRC}/emb_1x"),
            "docs": spark.read.parquet(f"{SRC}/docs_1x"),
        },
        "big": {
            "ev": norm_ts(spark.read.parquet(f"{ROOT}/ev")),
            "emb": spark.read.parquet(f"{ROOT}/emb"),
            "docs": spark.read.parquet(f"{ROOT}/docs"),
        },
    }
    out = {}
    for label, t in frames.items():
        ev, emb, docs = t["ev"], t["emb"], t["docs"]
        if want("chi2"):
            out.setdefault("chi2", {})[label] = timed(
                lambda: chi2_independence(
                    ev.withColumn("dow", F.dayofweek("ts")),
                    "event_type", "dow",
                ).collect()
            )
        if want("anova"):
            out.setdefault("anova", {})[label] = timed(
                lambda: anova_oneway(ev, "event_type", "value").collect()
            )
        if want("rfm"):
            out.setdefault("rfm", {})[label] = timed(
                lambda: rfm_scores(ev).collect()
            )
        if want("concurrency"):
            out.setdefault("concurrency", {})[label] = timed(
                lambda: concurrency_sweep(ev).collect()
            )
        if want("drift"):
            out.setdefault("emb_drift", {})[label] = timed(
                lambda: embedding_drift(emb).collect()
            )
        if want("exact_dedup"):
            out.setdefault("exact_dedup", {})[label] = timed(
                lambda: exact_duplicates(docs).count()
            )
    print(f"{'op':16s} {'1x':>8s} {'x1000':>9s} {'ratio':>8s}")
    for op, v in out.items():
        print(f"{op:16s} {v['1x']:8.2f} {v['big']:9.2f} {v['big']/v['1x']:7.1f}x")


if __name__ == "__main__":
    main()
