"""sf1-equivalent scaling spot-check for the most expensive queries.

Synthesizes a ~10x corpus from /root/testdata/sf0.1 (documents,
embeddings, events — the tables behind the top-cost queries), then
times each query at 1x and 10x. A blocked/bucketed design should scale
close to linearly in rows; a ratio far above the replication factor
(say >3x the factor) flags an accidental quadratic that the sf0.1
bench can't see.

The 10x corpus is a perturbed replication, not a straight copy: doc
ids/texts get a copy-specific token (so exact-dup groups don't explode
10x), embeddings get a tiny deterministic scale wobble, events get new
user ids per copy (state scales linearly).

Usage: python scripts/scaling_check.py [factor]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pydala2_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_pos_args = [a for a in sys.argv[1:] if not a.startswith("--")]
FACTOR = int(_pos_args[0]) if _pos_args else 10
OUT = f"/tmp/sfscale_x{FACTOR}"

QUERIES = [
    "dedup_simhash",
    "dedup_clusters",
    "doc_curation",
    "dedup_minhash_lsh",
    "emb_near_dup_srp",
    "stream_sessionization",
    # round-4 long tail: TPC-H fact-growth shapes (facts x10, dims
    # fixed — how a warehouse actually scales), the text screens, and
    # the new entropy/contamination aggs
    "q9_product_profit",
    "q21_multi_exists",
    "q18_large_volume_customers",
    "q16_supplier_count_by_part",
    "dedup_ngram_blocked",
    "doc_contamination",
    "doc_winnow_candidates",
    "doc_entropy_quality",
    "emb_knn_ivf",
    # round-4 additions: the iterative fit (3 corpus passes + 2 small
    # shuffles — should track rows), the segment/tfidf token pipelines,
    # and the stage-narrowing funnel
    "emb_kmeans",
    "doc_segment_dups",
    "doc_tfidf_top_terms",
    "ev_funnel",
    # screen + edit over the same segment keys; rebuild is scan-stage
    "doc_boilerplate_removal",
    # round-5: unigram-LM scoring (explode + aggs + broadcast join —
    # should track rows). emb_semantic_dedup is NOT here: at the
    # query's fixed k=4 the within-cell pair stage is quadratic in
    # cell size by design; the linear-at-scale form (k scaled with the
    # corpus, constant cell size) is measured in scaling_ops.py.
    "doc_unigram_logprob",
    # continuation session: the new multi-stage shapes. Facts scale,
    # dims stay fixed, so the part-table pair ops (fuzzy_part_matches,
    # er_part_linkage) are excluded — their input doesn't grow here;
    # their scale knob is the blocking key (documented in-operator).
    "graph_pagerank",       # edge window + fixed-k loop on vocab
    "scd2_event_history",   # gaps-and-islands window over events
    "ev_ohlc_bars",         # one struct-minmax agg
    "ev_rolling_quantiles", # daily collapse + window percentile
    "ev_anomaly_days",      # daily collapse + 2 window percentiles
    "ev_value_histogram",   # auto-bounds + bucket agg
    "agg_hll_sketch",       # register fold (orders facts)
    "agg_cms_heavy_hitters",# counter fold + broadcast probe
    "profile_orders",       # two-pass profile over orders
    "emb_dim_stats",        # posexplode + one agg
    "doc_token_pmi",        # within-doc pairs, vocab-bounded agg
    "doc_heaps_fit",        # bucketed growth curve
    "doc_zipf_fit",         # term counts + vocab window
    "stream_cms_counters",  # streaming sketch drain
    "ivm_join_rollup",      # two snapshot commits + delta join
    # r9 additions
    "agg_kmv_set_ops",      # distinct + per-partition bottom-k
    "dedup_keep_best",      # cluster CC + max_by canonicalization
    "s12_update_metadata_writethrough",  # write+sidecar round-trip
]


def build(spark) -> None:
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)

    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    n_docs = docs.count()
    copies = []
    for k in range(FACTOR):
        c = (
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * n_docs))
            # vary content per copy: append a copy token so replicas are
            # near-dups (realistic) rather than byte-identical
            .withColumn(
                "text",
                F.when(F.lit(k) == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(f" c{k}tok"))
                ),
            )
        )
        c = c.withColumn("n_chars", F.length("text"))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.parquet(os.path.join(OUT, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    n_emb = emb.count()
    ecopies = []
    for k in range(FACTOR):
        scale = 1.0 + k * 1e-4
        ecopies.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * n_emb)).withColumn(
                "embedding",
                F.transform("embedding", lambda x: (x * scale).cast("float")),
            )
        )
    eout = ecopies[0]
    for c in ecopies[1:]:
        eout = eout.unionByName(c)
    eout.repartition(32).write.parquet(os.path.join(OUT, "embeddings.parquet"))

    ev = spark.read.parquet(os.path.join(BASE, "events.parquet"))
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
    n_ev = ev.count()
    vcopies = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(k * n_ev)).withColumn(
            "user_id", F.col("user_id") + F.lit(k * n_users)
        )
        for k in range(FACTOR)
    ]
    vout = vcopies[0]
    for c in vcopies[1:]:
        vout = vout.unionByName(c)
    vout.repartition(32).write.parquet(os.path.join(OUT, "events.parquet"))

    # TPC-H: replicate the FACTS (orders + lineitem, orderkeys shifted
    # per copy so the join graph stays 1:N), keep dimensions fixed —
    # fact growth against stable dims is how a warehouse scales, and it
    # preserves every query's broadcast-ability assumptions.
    orders = spark.read.parquet(os.path.join(BASE, "orders.parquet"))
    key_stride = orders.agg(F.max("o_orderkey")).first()[0] + 1
    ocopies = [
        orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * key_stride))
        for k in range(FACTOR)
    ]
    oout = ocopies[0]
    for c in ocopies[1:]:
        oout = oout.unionByName(c)
    oout.repartition(32).write.parquet(os.path.join(OUT, "orders.parquet"))

    li = spark.read.parquet(os.path.join(BASE, "lineitem.parquet"))
    lcopies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * key_stride))
        for k in range(FACTOR)
    ]
    lout = lcopies[0]
    for c in lcopies[1:]:
        lout = lout.unionByName(c)
    lout.repartition(32).write.parquet(os.path.join(OUT, "lineitem.parquet"))

    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(
            os.path.join(BASE, f"{t}.parquet"), os.path.join(OUT, f"{t}.parquet")
        )


def main() -> None:
    from pydala2_spark.queries import queries

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    if "--skip-build" not in sys.argv:  # reuse an existing OUT corpus
        build(spark)
    qs = queries()

    # --all: the ENTIRE registry instead of the curated heavy list —
    # the full-coverage long-tail sweep (slow; run in the background);
    # --only=a,b,c restricts to named queries
    names = sorted(qs) if "--all" in sys.argv else QUERIES
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            names = [n for n in a[len("--only="):].split(",") if n in qs]

    print(f"{'query':32s} {'1x':>7s} {'x' + str(FACTOR):>7s} {'ratio':>7s}")
    for name in names:
        fn = qs[name]
        times = {}
        for label, d in (("base", BASE), ("big", OUT)):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, d).count()
                e = time.perf_counter() - t0
                best = e if best is None or e < best else best
            times[label] = best
        ratio = times["big"] / times["base"]
        flag = "  <-- SUPERLINEAR?" if ratio > 3 * FACTOR else ""
        print(f"{name:32s} {times['base']:7.2f} {times['big']:7.2f} {ratio:6.1f}x{flag}")


if __name__ == "__main__":
    main()
