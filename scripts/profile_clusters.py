"""One-off profiler for the dedup_clusters regression (round-3 diag).

Times each stage of duplicate_clusters at sf0.1 to localize the
1.77s -> 4.27s regression seen between BENCH_r01 and BENCH_r02.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pydala2_spark.session import get_spark
from pydala2_spark.operators.dedup import ngram_jaccard_pairs

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
docs.count()  # warm the scan

for trial in range(3):
    t0 = time.perf_counter()
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    undirected = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).distinct().localCheckpoint(eager=True)
    t_ckpt = time.perf_counter() - t0

    t0 = time.perf_counter()
    n = undirected.count()
    t_count = time.perf_counter() - t0

    # diagnosis result (round 3): toLocalIterator() here ran one
    # sequential job per partition (32 after _spread) ~= 1.5-2.0 s of
    # pure job-launch latency at sf0.1 — the BENCH_r02 regression.
    # duplicate_clusters now uses a single Arrow toPandas() job.
    t0 = time.perf_counter()
    rows = undirected.toPandas()
    t_iter = time.perf_counter() - t0

    print(
        f"trial={trial} edges={n} "
        f"build={t_build:.2f} ckpt={t_ckpt:.2f} count={t_count:.2f} collect={t_iter:.2f}"
    )
