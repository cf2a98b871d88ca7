"""Interleaved A/B for the trigram index build (r14 verdict item 2).

Arm OLD = r14 shape: repartition(bucket) + dropDuplicates([bucket, id,
          gram]) — the dedup aggregate runs complete inside the
          bucket-capped post-shuffle tasks.
Arm NEW = r15 shape (the operator as committed): repartition(bucket)
          only; postings are already unique per (id, gram).

Each timed run = full build (overwrite write) + the indexed probe
counted — the same work the declared query times. Arms alternate,
equal rounds. Usage: SPARK_GRAFT_CPUS=32 python scripts/ab_substring.py [rounds]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def build_old(df, path, text="text", id_col="doc_id", buckets=64):
    from pydala2_spark.operators.curate import _term_bucket

    gram_arr = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(char_length({text}) - 2, 0)),"
            f" i -> substring({text}, i, 3))"
        )
    )
    grams = df.select(F.col(id_col), F.explode(gram_arr).alias("gram"))
    (
        grams.withColumn("bucket", _term_bucket(F.col("gram"), buckets))
        .repartition(F.col("bucket"))
        .dropDuplicates(["bucket", id_col, "gram"])
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/postings")
    )


def main() -> None:
    from pydala2_spark.operators.curate import (
        build_trigram_index,
        substring_search_indexed,
    )
    from pydala2_spark.session import get_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab_substring", cpus=CPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.limit(1).collect()  # warm the scan

    times = {"old": [], "new": []}
    results = {}
    base = "/tmp/ab_trgm"
    for r in range(rounds):
        for arm in ("old", "new") if r % 2 == 0 else ("new", "old"):
            path = f"{base}_{arm}"
            shutil.rmtree(path, ignore_errors=True)
            spark.sparkContext.setJobDescription(f"trgm {arm} r{r}")
            t0 = time.perf_counter()
            if arm == "old":
                build_old(docs, path)
            else:
                build_trigram_index(spark, docs, path)
            n = substring_search_indexed(
                spark, path, docs, "merge batch"
            ).count()
            times[arm].append(round(time.perf_counter() - t0, 3))
            results[arm] = n
    oracle = docs.filter(F.col("text").contains("merge batch")).count()
    for arm, ts in times.items():
        print(f"{arm}: min={min(ts):.3f} all={ts} rows={results[arm]}")
    print("oracle_rows:", oracle, "equal:", results["old"] == results["new"] == oracle)
    # one-file-per-bucket layout check on the NEW build
    import glob

    per_bucket = {}
    for f in glob.glob(f"{base}_new/postings/bucket=*/*.parquet"):
        b = f.split("bucket=")[1].split("/")[0]
        per_bucket[b] = per_bucket.get(b, 0) + 1
    print("max_files_per_bucket:", max(per_bucket.values()), "buckets:", len(per_bucket))


if __name__ == "__main__":
    main()
