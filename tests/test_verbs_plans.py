"""DataFrame verbs (F5-F7) + plan-shape regressions.

The plan tests pin the scale-critical physical properties: predicate
pushdown reaches the parquet scan, projections prune the read schema,
small dimensions broadcast, and expression-only operators contain no
Python evaluation nodes.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_unnest_all(spark):
    from pydala2_spark.functions.verbs import unnest_all

    df = spark.createDataFrame(
        [(1, {"a": 2, "b": {"c": 3}})],
        "id long, s struct<a: long, b: struct<c: long>>",
    )
    out = unnest_all(df)
    assert set(out.columns) == {"id", "s.a", "s.b.c"}
    r = out.first()
    assert (r["id"], r["s.a"], r["s.b.c"]) == (1, 2, 3)


def test_explode_all(spark):
    from pydala2_spark.functions.verbs import explode_all

    df = spark.createDataFrame([(1, [1, 2], ["x"])], "id long, a array<long>, b array<string>")
    out = explode_all(df)
    assert out.count() == 2  # 2 x 1
    empty = spark.createDataFrame([(1, [], ["x"])], "id long, a array<long>, b array<string>")
    assert explode_all(empty, outer=True).count() == 1  # null row kept


def test_drop_null_columns(spark):
    from pydala2_spark.functions.verbs import drop_null_columns

    pdf = pd.DataFrame({"a": [1, 2], "b": [None, None], "c": ["x", None]})
    df = spark.createDataFrame(pdf)
    out = drop_null_columns(df)
    assert set(out.columns) == {"a", "c"}


def test_cast_relaxed(spark):
    from pydala2_spark.functions.verbs import cast_relaxed

    df = spark.createDataFrame([(1, "10", "extra")], "id long, v string, e string")
    target = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("missing", T.StringType()),
        ]
    )
    out = cast_relaxed(df, target)
    assert dict(out.dtypes) == {"id": "int", "v": "double", "missing": "string", "e": "string"}
    r = out.first()
    assert (r["id"], r["v"], r["missing"], r["e"]) == (1, 10.0, None, "extra")


def test_to_batch_reader(spark, sf_dir):
    from pydala2_spark.sources.dataset import Dataset

    ds = Dataset(f"{sf_dir}/orders.parquet", spark=spark)
    reader = ds.to_batch_reader(columns=["o_orderkey"], batch_size=1000)
    batches = list(reader)
    assert sum(b.num_rows for b in batches) == ds.count_rows()
    assert all(b.num_rows <= 1000 for b in batches)
    assert batches[0].schema.names == ["o_orderkey"]


def test_to_batch_reader_streams_bounded(spark, tmp_ds_path):
    """S7 streaming semantics: batches are produced lazily from a
    multi-partition result — consuming the first batch must not
    materialize the rest (generator-backed), and early close is clean."""
    spark.range(0, 20_000, 1, 8).selectExpr(
        "id", "cast(id % 7 as double) AS v"
    ).write.parquet(tmp_ds_path)
    from pydala2_spark.sources.dataset import Dataset

    ds = Dataset(tmp_ds_path, spark=spark)
    reader = ds.to_batch_reader(batch_size=500)
    first = reader.read_next_batch()
    assert first.num_rows == 500  # exact re-chunking, not partition-sized
    # early stop: abandon the reader after one batch — no error, no
    # full materialization required
    reader.close()
    # full drain through the arrow interface agrees with the DataFrame
    total = sum(
        b.num_rows for b in ds.to_batch_reader(batch_size=4096)
    )
    assert total == 20_000


def test_to_batch_reader_filter_sort(spark, tmp_ds_path):
    """Reference knob parity (pydala/table.py:547-556): a filtered,
    sorted export streams in bounded batches AND arrives in global
    sort order; the filter may reference a column dropped by the
    projection."""
    spark.range(0, 10_000, 1, 8).selectExpr(
        "id", "cast(id % 97 as long) AS k", "cast(id % 7 as double) AS v"
    ).write.parquet(tmp_ds_path)
    from pydala2_spark.sources.dataset import Dataset

    ds = Dataset(tmp_ds_path, spark=spark)
    reader = ds.to_batch_reader(
        columns=["id", "k"], batch_size=256, filter="v < 2.0", sort_by="k desc"
    )
    got_k, got_rows = [], 0
    for b in reader:
        assert b.num_rows <= 256
        assert b.schema.names == ["id", "k"]
        got_k.extend(b.column("k").to_pylist())
        got_rows += b.num_rows
    expected = ds.df.filter("v < 2.0").count()
    assert got_rows == expected and expected > 0
    assert got_k == sorted(got_k, reverse=True)  # global order preserved


# -- plan-shape regressions ---------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    from pydala2_spark.queries import queries

    df = queries()["scan_filter_project"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters:")[1][:200]


def test_projection_prunes_read_schema(spark, sf_dir):
    from pydala2_spark.queries import queries

    df = queries()["scan_filter_project"](spark, sf_dir)
    read_schema = _plan(df).split("ReadSchema:")[1].split("\n")[0]
    # 4 projected + 2 filter columns at most; the wide rest is pruned
    assert "l_extendedprice" in read_schema
    assert "l_tax" not in read_schema and "l_shipdate" not in read_schema


def test_star_join_broadcasts_dims(spark, sf_dir):
    from pydala2_spark.queries import queries

    plan = _plan(queries()["q5_nation_revenue"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4  # all dims broadcast
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_topk_avoids_global_sort(spark, sf_dir):
    from pydala2_spark.queries import queries

    plan = _plan(queries()["sort_limit_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_text_ops_have_no_python_nodes(spark, sf_dir):
    from pydala2_spark.queries import queries

    for name in ["doc_token_stats", "doc_fingerprint_groups", "dedup_simhash", "emb_near_dup"]:
        plan = _plan(queries()[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_triangles_checkpoint_bounds_exchanges(spark, sf_dir):
    """triangle_counts localCheckpoints its three reused frames (edges,
    degrees, oriented edges); without that, every reuse re-runs the
    caller's full edge-derivation lineage — observed as a 289-exchange
    final plan at sf0.1 (r9 BENCH_DETAIL flagged 232, an order of
    magnitude above any other query). The checkpointed plan reads each
    segment once; pin the final plan's exchange count at the fixed
    post-fix shape with slack for AQE variation."""
    from pydala2_spark.queries import queries

    plan = _plan(queries()["graph_triangles"](spark, sf_dir))
    # r11: the per-corner 3-way unionAll became one explode(array(x,y,z)),
    # so the wedge-join subtree appears once, not three times (25 -> 9)
    assert plan.count("Exchange") <= 15, plan.count("Exchange")


def test_clustering_coeff_shares_triangle_pass(spark, sf_dir):
    """clustering_coefficients reuses the SAME checkpointed degree and
    triangle-count frames as the enumeration pass — the global and
    local transitivity legs add one left join and one single-row agg
    on top of graph_triangles' plan, not a second enumeration
    (r10 BENCH_DETAIL flagged 27 exchanges; the shared-pass + explode
    rewrite lands at 11)."""
    from pydala2_spark.queries import queries

    plan = _plan(queries()["graph_clustering_coeff"](spark, sf_dir))
    assert plan.count("Exchange") <= 17, plan.count("Exchange")


def test_negative_samples_shares_lineage(spark, sf_dir):
    """negative_edge_samples reduces the per-pair CN counts straight
    to the per-label grain and joins two per-label aggregate frames,
    instead of left-joining CN back onto the corpus-sized pair frame
    (which replayed the succ/anti-join lineage a third time); the
    twice-consumed pair and adjacency frames are lazily checkpointed.
    r11 BENCH_DETAIL flagged 21 exchanges (suite's highest); the
    shared-lineage shape lands at 14 pre-execution."""
    from pydala2_spark.queries import queries

    plan = _plan(queries()["graph_negative_samples"](spark, sf_dir))
    assert plan.count("Exchange") <= 16, plan.count("Exchange")


def test_dau_wau_mau_denies_nested_loop(spark, sf_dir):
    """dau_wau_mau's trailing windows are explode(sequence(0, w-1))
    equi-joins over the user-day grain — NOT range joins. The r11
    shape (pure-range join of user-days against the calendar) planned
    as a BroadcastNestedLoopJoin: |user-days| x |calendar-days|
    compares where a strict x7/x30 fan-out fits. DENY, don't allow —
    this query is also excluded from the global-sweep allowlist."""
    from pydala2_spark.queries import queries

    plan = _plan(queries()["ev_dau_wau_mau"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # two trailing legs (dedup + count each) + dau + 2 final joins
    assert plan.count("Exchange") <= 12, plan.count("Exchange")


def test_merge_core_uses_nullsafe_join(spark, sf_dir):
    from pydala2_spark.queries import queries

    plan = _plan(queries()["merge_upsert_semantics"](spark, sf_dir))
    # Catalyst compiles `<=>` to (coalesce(key), isnull(key)) composite
    # hash keys — the physical signature of a null-safe equi-join
    assert "coalesce(" in plan and "isnull(" in plan


def test_registry_plan_audit(spark, sf_dir):
    """Global plan regressions, ONE registry sweep (r15: the former
    test_no_accidental_cartesian_anywhere and
    test_no_row_at_a_time_python_anywhere each constructed all 278
    query plans — 80 s + 68 s of the suite; the union pass builds each
    plan once and applies both checks, identical coverage):

    - NO query may plan a cartesian product or nested-loop join
      except the documented bounded/broadcast shapes below;
    - NO query may plan a row-at-a-time Python UDF (BatchEvalPython) —
      Arrow-batched Python (ArrowEvalPython / MapInPandas /
      FlatMapGroupsInPandas) is allowed where declared: the multimodal
      decode ladder, the per-group recursions (Holt), and the
      streaming state machines; everything else stays JVM-side.
    """
    from pydala2_spark.queries import queries

    # documented exceptions: exact brute-force baseline; IVF routing
    # (queries x centroids — a tiny bounded cross); q11's scalar
    # threshold (1-row broadcast nested loop — the canonical way to
    # attach a global aggregate without a single-partition window);
    # tfidf's corpus-size frame and the funnel's stage counts (same
    # 1-row broadcast shape as q11); the rerank's stage-1 corpus x
    # broadcast-query-set cross (same bounded shape as bruteforce —
    # the whole point is that stage 2 then touches only the shortlist)
    allowed_cross = {
        "emb_knn_bruteforce",
        "emb_knn_ivf",
        "q11_supplier_value_share",
        "doc_tfidf_top_terms",
        "ev_funnel",
        "emb_quantized_rerank",
        # total-token count frame — the same 1-row broadcast shape as
        # q11/tfidf (a global aggregate attached without a
        # single-partition window)
        "doc_unigram_logprob",
        # N/avgdl and tq/tp/V one-row aggregate frames — same shape
        "doc_bm25_search",
        "doc_dsir_resample",
        # 10 probe items x the sketch's 3-row hash-row frame — a
        # bounded cross by construction (depth is a small constant)
        "agg_cms_heavy_hitters",
        # L1-normalizer one-row aggregate frames, attached per
        # iteration — same 1-row broadcast shape as q11
        "graph_hits",
        # node-count one-row frame for the wrap-around successor rank
        "graph_negative_samples",
        # one-row broadcast totals frames (bin totals / hour-zero+mean /
        # type stats / cumulative-weight total / type-share total) —
        # the same 1-row broadcast shape as q11
        "dq_psi",
        "ev_periodogram",
        "doc_oov_rate",
        "agg_weighted_quantiles",
        "doc_feature_hashing",
        # +-3-day moving-average RANGE join on the calendar-bounded
        # DAILY frame (30-400 rows) — same bounded-range shape as
        # range_join_ship_window
        "ev_seasonal_decompose",
        "ev_anomaly_seasonal",
        # r12: one-row broadcast aggregate frames — block totals
        # (jackknife), W/quantile rows (iqr), ref-type count
        # (novelty), pair total (cosine hist), max-gap row (sequence
        # gaps) — same 1-row broadcast shape as q11
        "agg_jackknife_ci",
        "dq_iqr_outliers",
        "doc_ngram_novelty",
        "emb_pair_cosine_hist",
        "dq_sequence_gaps",
        # r12 batch three: midpoint bounds row (diff-in-diff),
        # W/quantile rows (winsorized), per-side doc-count rows (idf
        # drift) — same 1-row broadcast shape as q11
        "ev_diff_in_diff",
        "agg_winsorized_mean",
        "doc_idf_drift",
        # exact brute-force legs of the truncation eval — same bounded
        # corpus x broadcast-query-set cross as emb_knn_bruteforce
        "emb_dim_truncation_eval",
        # exact brute-force baseline leg of the recall eval — same
        # bounded corpus x broadcast-query-set cross as
        # emb_knn_bruteforce / emb_ann_recall
        "emb_lsh_multiprobe",
        # node-count and dangling-mass one-row aggregate frames,
        # attached per iteration — same 1-row broadcast shape as q11
        "graph_pagerank",
        # auto-bounds min/max one-row frame — same 1-row broadcast shape
        "ev_value_histogram",
        # corpus-count / max-id / chi2 one-row broadcast frames
        "doc_token_pmi",
        "doc_heaps_fit",
        "dq_fk_orphans",
        "dq_benford",
        "ev_anomaly_days",
        # corpus-end bucket — one-row broadcast aggregate frame
        "ev_resample_locf",
        # KMV summary assembly: crossJoins of ONE-ROW (hk, nd)
        # aggregate frames — the same 1-row broadcast shape as q11;
        # the corpus-sized work is the distinct + TakeOrdered upstream
        "agg_kmv_set_ops",
        # r9 continuation: more of the same 1-row broadcast aggregate
        # shape — est_total/exact_total frames (priority sample), the
        # two per-side moment rows (welch), est x exact rows (cms join
        # size), the gini/top10/max one-row frames (key skew), and the
        # basket-count frame (association rules)
        "doc_priority_sample",
        "ev_welch_ttest",
        "agg_cms_join_size",
        "dq_key_skew",
        "assoc_rules_parts",
        # one-row total-revenue frame attached after the distributed
        # prefix cumsum (the window that used to carry it is gone)
        "w_pareto_abc",
        # one-row count frame feeding the distributed ntile formula
        "w_value_deciles",
        # one-row max-revenue frame (replaced the global-window max
        # that funneled every supplier through one task)
        "q15_top_suppliers",
        # r10: total/h_x/h_y/mi one-row aggregate frames crossJoined
        # onto each other — the same 1-row broadcast shape as q11; the
        # corpus-sized work is the single joint-count groupBy upstream
        "dq_mutual_info",
        # r10: one-row bigram-total / corpus-total / corpus-end frames
        # attached broadcast — same 1-row shape
        "doc_collocation_llr",
        "doc_js_divergence",
        "ev_kaplan_meier",
        # r10: one-row (n1, n2) totals and the one-row max-diff frame
        "dq_ks_test",
        # r10 continuation: one-row (n, kx, ky) totals and the one-row
        # term-sum frame (chi2); the one-row corpus-max-ts frame and
        # the per-ntile one-row count frames (rfm) — all 1-row
        # broadcasts, corpus work is the upstream groupBy
        "agg_chi2_independence",
        "ev_rfm_scores",
        # one-row peak / first-peak / interval-count frames assembled
        # after the distributed-prefix sweep
        "ev_concurrency_peak",
        # one-row totals / term-sum frames over the k-row group frame
        "agg_anova_f",
        # one-row edge-total frame attached to the community rollup
        "graph_modularity",
        # one-row planted/detected/total count frames
        "dedup_minhash_eval",
        # one-row moment frame attached to the node count
        "graph_assortativity",
        # one-row dims-moment frame attached to the norm summary
        "emb_centroid_drift",
        # composes the allowlisted broadcast-probe ANN paths (exact +
        # IVF) — the probe frame is the same tiny broadcast side
        "emb_ann_recall",
        # the |classes|-row prior frame broadcast onto the test-doc
        # frame IS the dense (doc, class) score grid — intentional,
        # bounded by class cardinality
        "doc_nb_classifier",
        # pagerank's one-row node-count broadcast, riding on the
        # Zipf-small token graph
        "doc_textrank_keywords",
        # PPR's one-row seed-count / dangling-mass broadcasts
        "graph_ppr",
        # r13: one-row broadcast aggregate frames — sketch totals
        # (ddsketch), both-cohort totals (wasserstein), midpoint
        # bounds + moment rows (cuped), basket-count frame (pruned
        # rules, same as assoc_rules_parts) — all the 1-row broadcast
        # shape as q11
        "agg_ddsketch_quantiles",
        "dq_wasserstein",
        "ev_cuped",
        "assoc_rules_pruned",
        # r13 batch two: one-row broadcast totals (theil moment row,
        # freshness corpus-max frontier) — same 1-row broadcast shape
        "agg_theil_decomposition",
        "dq_freshness",
        # r13 batch three: post-drain frontier row (stream freshness);
        # one-row edge-counts x node-counts frames (rich club)
        "stream_freshness",
        "graph_rich_club",
        # one-row bounds/base/rate frames around the O(offsets) fit
        "ev_retention_halflife",
    }
    cross_offenders = []
    py_offenders = []
    for name, fn in queries().items():
        check_cross = name not in allowed_cross
        # streaming drains / decode stages: Arrow-batched by design,
        # checked by the dedicated streaming/multimodal tests
        check_py = not name.startswith(("stream_", "mm_"))
        if not (check_cross or check_py):
            continue
        try:
            plan = _plan(fn(spark, sf_dir))
        except Exception:
            if check_cross:
                raise  # the cartesian audit never tolerated failures
            continue  # side-effecting queries checked by the mirror
        if check_cross and (
            "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        ):
            cross_offenders.append(name)
        if check_py and "BatchEvalPython" in plan:
            py_offenders.append(name)
    assert not cross_offenders, (
        f"unexpected cartesian/nested-loop joins in: {cross_offenders}"
    )
    assert not py_offenders, f"row-at-a-time Python UDFs in: {py_offenders}"


def test_salted_join_streams_fact_side(spark, sf_dir):
    """The salted join must broadcast the replicated dim (BuildRight),
    never the salted fact side — the shape the operator exists for."""
    from pydala2_spark.queries import queries

    plan = _plan(queries()["skew_salted_join_agg"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BuildRight" in plan and "BuildLeft" not in plan


def test_hive_partition_predicate_prunes_at_plan_time(spark, tmp_path):
    """A predicate on hive partition columns must land in the scan's
    PartitionFilters (directory pruning at planning time — zero data
    touched for excluded partitions), not just PushedFilters."""
    import re

    from pydala2_spark.sources.dataset import Dataset
    from pydala2_spark.sources.writer import Writer

    path = str(tmp_path / "hive_ds")
    df = spark.range(200).selectExpr(
        "id",
        "CASE WHEN id % 10 < 8 THEN 'train' WHEN id % 10 < 9 THEN 'val' "
        "ELSE 'test' END AS split",
        "CASE WHEN id % 3 = 0 THEN 'en' ELSE 'de' END AS lang",
    )
    Writer(spark, path).write(df, mode="overwrite", partition_by=["split", "lang"])
    out = Dataset(path, spark=spark, partitioning=["split", "lang"]).filter(
        "split = 'train' AND lang = 'en'"
    )
    plan = _plan(out)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, plan
    assert "split" in m.group(1) and "lang" in m.group(1), m.group(1)
    # and the values round-trip: only the matching partition's rows
    rows = out.collect()
    assert rows and all(r["split"] == "train" and r["lang"] == "en" for r in rows)
    assert len(rows) == sum(1 for i in range(200) if i % 10 < 8 and i % 3 == 0)


# (test_no_row_at_a_time_python_anywhere merged into
# test_registry_plan_audit above — one registry sweep, same coverage)
