"""Interleaved A/B for emb_pair_cosine_hist (r14 verdict item 3).

Arm WIDE  = r14 shape: stride-explode ON the widened (id, d1..dN)
            frame, one equi-join on ib.
Arm IDS   = explode a 2-column (ia, ib) pair frame, then join the
            widened frame twice (a-side on ia, b-side on ib).

Same session, arms alternated W,I,W,I,... (equal rounds, min-of-N per
arm — the measurement-discipline rule), noop sink. Both shapes read
the same _materialize_once widened frame, so the A/B isolates ONLY
the fanout+join structure.

Usage: SPARK_GRAFT_CPUS=32 python scripts/ab_pair_cosine.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
STRIDES = (1, 7, 31)


def build(spark, wide, d, fanout):
    id_col = "vec_id"
    if fanout == "wide":
        ua = wide.select(
            F.col(id_col).alias("ia"),
            F.explode(F.array(*[F.lit(int(s)) for s in STRIDES])).alias("__s"),
            *[F.col(f"d{i}").alias(f"a{i}") for i in range(1, d + 1)],
        ).select(
            "ia",
            (F.col("ia") + F.col("__s")).alias("ib"),
            *[f"a{i}" for i in range(1, d + 1)],
        )
        ub = wide.select(
            F.col(id_col).alias("ib"),
            *[F.col(f"d{i}").alias(f"b{i}") for i in range(1, d + 1)],
        )
        j = ua.join(ub, "ib")
    else:
        pairs = wide.select(
            F.col(id_col).alias("ia"),
            F.explode(F.array(*[F.lit(int(s)) for s in STRIDES])).alias("__s"),
        ).select("ia", (F.col("ia") + F.col("__s")).alias("ib"))
        ua = wide.select(
            F.col(id_col).alias("ia"),
            *[F.col(f"d{i}").alias(f"a{i}") for i in range(1, d + 1)],
        )
        ub = wide.select(
            F.col(id_col).alias("ib"),
            *[F.col(f"d{i}").alias(f"b{i}") for i in range(1, d + 1)],
        )
        j = pairs.join(ua, "ia").join(ub, "ib")
    dot = None
    for i in range(1, d + 1):
        term = F.col(f"a{i}") * F.col(f"b{i}")
        dot = term if dot is None else dot + term
    cos = F.round(dot, 4)
    binned = j.select(
        F.floor(cos * F.lit(10.0)).cast("int").alias("bin"), cos.alias("c")
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("c").cast("decimal(38,6)")).alias("__sc"),
    )
    tot = per.agg(F.sum("n_pairs").cast("long").alias("__t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_pairs",
        F.round(F.col("__sc").cast("double") / F.col("n_pairs"), 6).alias("a"),
    )


def main() -> None:
    from pydala2_spark.operators.dedup import _materialize_once
    from pydala2_spark.operators.similarity import (
        unit_scalar_frame,
        vector_dim,
    )
    from pydala2_spark.session import get_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="ab_pair_cosine", cpus=CPUS)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    d = vector_dim(emb, "embedding")
    print(f"dim={d} rows={emb.count()}")

    times = {"wide": [], "ids": []}
    for r in range(rounds):
        for arm in ("wide", "ids") if r % 2 == 0 else ("ids", "wide"):
            wide = _materialize_once(
                unit_scalar_frame(emb, "embedding", ["vec_id"], d)
            )
            spark.sparkContext.setJobDescription(f"pair_cos {arm} r{r}")
            t0 = time.perf_counter()
            build(spark, wide, d, arm).write.format("noop").mode(
                "overwrite"
            ).save()
            times[arm].append(round(time.perf_counter() - t0, 3))
    for arm, ts in times.items():
        print(f"{arm}: min={min(ts):.3f} all={ts}")
    # sanity: identical output
    wide = _materialize_once(unit_scalar_frame(emb, "embedding", ["vec_id"], d))
    a = {tuple(r) for r in build(spark, wide, d, "wide").collect()}
    b = {tuple(r) for r in build(spark, wide, d, "ids").collect()}
    print("outputs_equal:", a == b)


if __name__ == "__main__":
    main()
