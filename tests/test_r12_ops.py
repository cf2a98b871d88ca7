"""Round-12 operator contracts: Mann-Whitney U, block-jackknife CI,
IQR fences, n-gram novelty, pair-cosine histogram, growth accounting,
and the distributed_prefix consistency regression pin."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _one(df):
    rows = df.collect()
    assert len(rows) == 1, rows
    return rows[0]


# -- Mann-Whitney U ------------------------------------------------------


def _mwu_reference(va, vb):
    """Plain-python U + z with average ranks and tie correction."""
    pooled = sorted([(v, "a") for v in va] + [(v, "b") for v in vb])
    ranks, i = {}, 0
    vals = [p[0] for p in pooled]
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        for k in range(i, j):
            ranks[k] = (i + j + 1) / 2.0
        i = j
    ra = sum(ranks[k] for k, p in enumerate(pooled) if p[1] == "a")
    na, nb = len(va), len(vb)
    u = ra - na * (na + 1) / 2.0
    n = na + nb
    from collections import Counter

    tie = sum(c**3 - c for c in Counter(vals).values())
    var = na * nb / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    z = (u - na * nb / 2.0) / math.sqrt(var)
    return u, z


def test_mann_whitney_matches_reference_with_ties(spark):
    from pydala2_spark.functions.dq import mann_whitney

    va = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0, 8.0]
    vb = [2.0, 4.0, 4.0, 6.0, 7.0, 9.0, 9.0, 12.0]
    pdf = pd.DataFrame(
        {"v": va + vb, "g": ["a"] * len(va) + ["b"] * len(vb)}
    )
    row = _one(
        mann_whitney(spark.createDataFrame(pdf), "v", F.col("g") == "a")
    )
    u, z = _mwu_reference(va, vb)
    assert row["n_a"] == len(va) and row["n_b"] == len(vb)
    assert row["u_stat"] == pytest.approx(u, abs=1e-9)
    assert row["z_score"] == pytest.approx(z, abs=1e-6)


def test_mann_whitney_symmetric_null(spark):
    # identical cohorts => U = na*nb/2, z = 0
    from pydala2_spark.functions.dq import mann_whitney

    vals = list(range(30))
    pdf = pd.DataFrame({"v": vals * 2, "g": [0] * 30 + [1] * 30})
    row = _one(
        mann_whitney(spark.createDataFrame(pdf), "v", F.col("g") == 0)
    )
    assert row["u_stat"] == 30 * 30 / 2.0
    assert row["z_score"] == 0.0


def test_mann_whitney_all_tied_guard(spark):
    # every value identical => variance 0 => z NULL, not NaN/error
    from pydala2_spark.functions.dq import mann_whitney

    pdf = pd.DataFrame({"v": [5.0] * 10, "g": [0, 1] * 5})
    row = _one(
        mann_whitney(spark.createDataFrame(pdf), "v", F.col("g") == 0)
    )
    assert row["z_score"] is None


# -- block jackknife -----------------------------------------------------


def test_jackknife_matches_reference(spark):
    from pydala2_spark.functions.dq import jackknife_ci

    vals = [float(i % 17) + 0.25 * (i % 5) for i in range(200)]
    pdf = pd.DataFrame({"id": range(200), "v": vals})
    row = _one(jackknife_ci(spark.createDataFrame(pdf), "v", "id", n_groups=8))
    # reference: exact block sums, leave-one-out means
    import collections

    s = collections.defaultdict(float)
    c = collections.defaultdict(int)
    for i, v in enumerate(vals):
        s[i % 8] += v
        c[i % 8] += 1
    S, N, k = sum(s.values()), sum(c.values()), 8
    m = [(S - s[g]) / (N - c[g]) for g in range(8)]
    mbar = sum(round(x, 12) for x in m) / k
    var = (k - 1) / k * sum(round((round(x, 12) - mbar) ** 2, 12) for x in m)
    assert row["n_rows"] == 200 and row["n_blocks"] == 8
    assert row["mean"] == pytest.approx(S / N, abs=1e-6)
    assert row["se_jack"] == pytest.approx(math.sqrt(var), abs=1e-6)
    assert row["ci_lo"] == pytest.approx(S / N - 1.96 * math.sqrt(var), abs=1e-5)
    assert row["ci_hi"] == pytest.approx(S / N + 1.96 * math.sqrt(var), abs=1e-5)


def test_jackknife_constant_column_zero_se(spark):
    from pydala2_spark.functions.dq import jackknife_ci

    pdf = pd.DataFrame({"id": range(100), "v": [7.5] * 100})
    row = _one(jackknife_ci(spark.createDataFrame(pdf), "v", "id", n_groups=5))
    assert row["mean"] == 7.5 and row["se_jack"] == 0.0
    assert row["ci_lo"] == 7.5 and row["ci_hi"] == 7.5


# -- IQR fences ----------------------------------------------------------


def test_iqr_outliers_flags_planted_spikes(spark):
    from pydala2_spark.functions.dq import iqr_outliers

    base = [float(v) for v in range(1, 101)]  # 1..100
    data = base + [1000.0, -500.0]  # one spike each side
    pdf = pd.DataFrame({"x": data})
    row = _one(iqr_outliers(spark.createDataFrame(pdf), ["x"]))
    # type-1 quantiles over 102 values: q1 = 26th smallest, q3 = 77th
    svals = sorted(data)
    q1, q3 = svals[25], svals[76]
    assert row["col_name"] == "x" and row["n_rows"] == 102
    assert row["q1"] == q1 and row["q3"] == q3
    assert row["n_below"] == 1 and row["n_above"] == 1
    assert row["outlier_rate"] == pytest.approx(2 / 102, abs=1e-6)


def test_iqr_outliers_multi_column_rows(spark):
    from pydala2_spark.functions.dq import iqr_outliers

    pdf = pd.DataFrame(
        {"a": [1.0, 2.0, 3.0, 4.0], "b": [10.0, 10.0, 10.0, 10.0]}
    )
    out = {
        r["col_name"]: r
        for r in iqr_outliers(spark.createDataFrame(pdf), ["a", "b"]).collect()
    }
    assert set(out) == {"a", "b"}
    # constant column: iqr 0, no outliers
    assert out["b"]["iqr"] == 0.0 and out["b"]["n_below"] == 0
    assert out["b"]["n_above"] == 0


# -- n-gram novelty ------------------------------------------------------


def test_ngram_novelty_identical_corpora_zero(spark):
    from pydala2_spark.operators.curate import ngram_novelty

    docs = spark.createDataFrame(
        pd.DataFrame({"text": ["a b c d e f", "g h i j k l"]})
    )
    row = _one(ngram_novelty(docs, docs, k=3))
    assert row["n_novel_types"] == 0 and row["type_novelty"] == 0.0
    assert row["occ_novelty"] == 0.0


def test_ngram_novelty_disjoint_corpora_one(spark):
    from pydala2_spark.operators.curate import ngram_novelty

    ref = spark.createDataFrame(pd.DataFrame({"text": ["a b c d e"]}))
    new = spark.createDataFrame(pd.DataFrame({"text": ["v w x y z"]}))
    row = _one(ngram_novelty(ref, new, k=3))
    assert row["type_novelty"] == 1.0 and row["occ_novelty"] == 1.0
    assert row["n_ref_types"] == 3 and row["n_new_types"] == 3


def test_ngram_novelty_counts_occurrences_not_types(spark):
    from pydala2_spark.operators.curate import ngram_novelty

    ref = spark.createDataFrame(pd.DataFrame({"text": ["a b c"]}))
    # "a b c" repeated => 4 occurrences of the known 3-gram via
    # overlap windows: tokens a b c a b c -> shingles: "a b c",
    # "b c a", "c a b", "a b c" — 2 known occurrences, 2 novel
    new = spark.createDataFrame(pd.DataFrame({"text": ["a b c a b c"]}))
    row = _one(ngram_novelty(ref, new, k=3))
    assert row["n_new_occ"] == 4
    assert row["n_novel_occ"] == 2
    assert row["n_novel_types"] == 2  # "b c a", "c a b"


# -- pair cosine histogram -----------------------------------------------


def test_pair_cosine_hist_orthogonal_and_identical(spark):
    from pydala2_spark.operators.similarity import pair_cosine_histogram

    # ids 0..3: e0, e0, e1, e0 — stride-1 pairs: (0,1) cos 1,
    # (1,2) cos 0, (2,3) cos 0
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r["bin_lo"]: r
        for r in pair_cosine_histogram(
            emb, strides=(1,), dim=2
        ).collect()
    }
    assert out[1.0]["n_pairs"] == 1  # the cos=1.0 pair
    assert out[0.0]["n_pairs"] == 2  # the two orthogonal pairs
    assert out[0.0]["share"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[1.0]["avg_cos"] == 1.0


def test_pair_cosine_hist_shares_sum_to_one(spark, sf_dir):
    from pydala2_spark.operators.similarity import pair_cosine_histogram
    from pydala2_spark.sources.testdata import read_table

    out = pair_cosine_histogram(read_table(spark, sf_dir, "embeddings")).collect()
    assert abs(sum(r["share"] for r in out) - 1.0) < 1e-3
    assert all(-1.0 <= r["bin_lo"] <= 1.0 for r in out)


# -- growth accounting ---------------------------------------------------


def test_growth_accounting_classification(spark):
    from pydala2_spark.operators.events import growth_accounting

    # three Mondays: w1 2024-01-01, w2 2024-01-08, w3 2024-01-15
    rows = [
        # u1 active w1, w2, w3  -> new@w1, retained@w2, retained@w3
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-09 10:00:00"),
        (1, "2024-01-16 10:00:00"),
        # u2 active w1, w3      -> new@w1, churned@w2, resurrected@w3
        (2, "2024-01-02 10:00:00"),
        (2, "2024-01-17 10:00:00"),
        # u3 active w2 only     -> new@w2, churned@w3
        (3, "2024-01-10 10:00:00"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {str(r["week"]): r for r in growth_accounting(ev).collect()}
    w1, w2, w3 = "2024-01-01", "2024-01-08", "2024-01-15"
    assert out[w1]["active"] == 2 and out[w1]["new_users"] == 2
    assert out[w1]["churned"] == 0
    assert out[w2]["active"] == 2 and out[w2]["new_users"] == 1
    assert out[w2]["retained"] == 1 and out[w2]["churned"] == 1  # u2
    assert out[w3]["active"] == 2 and out[w3]["retained"] == 1  # u1
    assert out[w3]["resurrected"] == 1  # u2
    assert out[w3]["churned"] == 1  # u3
    assert out[w3]["quick_ratio"] == 1.0  # (0 new + 1 res) / 1 churned


def test_growth_accounting_totals_consistent(spark, sf_dir):
    from pydala2_spark.operators.events import growth_accounting
    from pydala2_spark.sources.testdata import read_table

    out = growth_accounting(read_table(spark, sf_dir, "events")).collect()
    for r in out:
        assert r["active"] == r["new_users"] + r["retained"] + r["resurrected"]


# -- distributed_prefix consistency regression ----------------------------


def test_distributed_prefix_stable_across_actions(spark):
    """r12 regression pin: the ranged frame must be materialized once.

    Without it, the offsets join can re-evaluate the range shuffle
    with DIFFERENT sampled boundaries per side (RangePartitioner
    samples a shuffle output whose intra-partition order is
    nondeterministic; runtime exchange reuse is best-effort), and
    rows pick up offsets for a partitioning they are not in. Observed
    pre-fix: three aggregations over one prefix frame returned three
    different sums. Pin: repeated aggregate over a fresh prefix frame
    equals the single-window truth every time."""
    from pyspark.sql import Window

    from pydala2_spark.functions.skew import distributed_prefix

    pdf = pd.DataFrame(
        {
            "v": [float((i * 37) % 211) for i in range(4000)],
            "c": [1] * 4000,
        }
    )
    df = (
        spark.createDataFrame(pdf)
        .groupBy("v")
        .agg(F.sum("c").cast("decimal(38,0)").alias("c"))
    )
    p = distributed_prefix(df, ["v"], sum_col="c", cum_col="__cum")
    expr = F.sum(F.col("c") * F.col("__cum"))
    w = Window.orderBy("v")
    truth = (
        df.withColumn(
            "cum",
            F.sum("c").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .agg(F.sum(F.col("c") * F.col("cum")))
        .collect()[0][0]
    )
    for _ in range(3):
        assert p.agg(expr).collect()[0][0] == truth


# -- sequence gaps -------------------------------------------------------


def test_sequence_gaps_planted(spark):
    from pydala2_spark.functions.dq import sequence_gaps

    # ids 1..10 minus {4,5,6,9}, with 7 duplicated twice
    ids = [1, 2, 3, 7, 7, 7, 8, 10]
    df = spark.createDataFrame(pd.DataFrame({"i": ids}))
    row = _one(sequence_gaps(df, "i"))
    assert row["n_rows"] == 8 and row["n_distinct"] == 6
    assert row["n_duplicate_rows"] == 2
    assert row["min_id"] == 1 and row["max_id"] == 10
    assert row["n_missing"] == 4
    assert row["max_gap"] == 3  # 4,5,6


def test_sequence_gaps_dense(spark):
    from pydala2_spark.functions.dq import sequence_gaps

    df = spark.createDataFrame(pd.DataFrame({"i": list(range(100))}))
    row = _one(sequence_gaps(df, "i"))
    assert row["n_missing"] == 0 and row["max_gap"] == 0
    assert row["n_duplicate_rows"] == 0


# -- null correlation ----------------------------------------------------


def test_null_correlation_perfect_cooccurrence(spark):
    from pydala2_spark.functions.dq import null_correlation

    # a and b null together on even rows -> phi = 1; c independent
    rows = [
        (None if i % 2 == 0 else 1.0, None if i % 2 == 0 else 2.0,
         None if i % 3 == 0 else 3.0)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    out = {(r["col_a"], r["col_b"]): r
           for r in null_correlation(df, ["a", "b", "c"]).collect()}
    assert out[("a", "b")]["phi"] == 1.0
    assert out[("a", "b")]["n_both_null"] == 30
    assert out[("a", "b")]["n_only_a"] == 0
    assert abs(out[("a", "c")]["phi"]) < 0.2  # independent-ish


def test_null_correlation_mutually_exclusive(spark):
    from pydala2_spark.functions.dq import null_correlation

    # exactly one of a/b null per row -> phi = -1
    rows = [
        (None if i % 2 == 0 else 1.0, 2.0 if i % 2 == 0 else None)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["a", "b"])
    row = _one(null_correlation(df, ["a", "b"]))
    assert row["phi"] == -1.0 and row["n_both_null"] == 0


def test_null_correlation_constant_guard(spark):
    from pydala2_spark.functions.dq import null_correlation

    # no nulls at all -> every margin empty -> phi NULL, not NaN
    df = spark.createDataFrame(
        pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]})
    )
    row = _one(null_correlation(df, ["a", "b"]))
    assert row["phi"] is None and row["null_rate_a"] == 0.0


# -- LSH band tuning -----------------------------------------------------


def test_band_tuning_scurve_hand_check(spark):
    from pydala2_spark.operators.dedup import lsh_band_tuning

    # two docs per stride pair: one identical pair (j=1), one disjoint
    # (j=0); catch(1)=1 for every config, catch(0)=0
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f"),
            (1, "a b c d e f"),
            (2, "p q r s t u"),
            (3, "v w x y z zz"),
        ],
        ["doc_id", "text"],
    )
    out = lsh_band_tuning(
        docs, strides=(1,), grid=((4, 3),), target_j=0.5, noise_j=0.3
    ).collect()
    row = out[0]
    assert row["n_target_pairs"] == 1  # the identical pair
    assert row["n_noise_pairs"] == 2  # the two disjoint pairs
    assert row["exp_recall"] == 1.0
    assert row["exp_noise_rate"] == 0.0


def test_band_tuning_more_bands_more_recall(spark, sf_dir):
    from pydala2_spark.operators.dedup import lsh_band_tuning
    from pydala2_spark.sources.testdata import read_table

    docs = read_table(spark, sf_dir, "documents")
    out = {(r["bands"], r["rows_per_band"]): r
           for r in lsh_band_tuning(docs).collect()}
    # at fixed num_hashes=12, more bands (shorter rows) can only raise
    # both catch rates: (6,2) dominates (2,6) on recall AND noise
    if out[(2, 6)]["n_target_pairs"]:
        assert out[(6, 2)]["exp_recall"] >= out[(2, 6)]["exp_recall"]
    assert out[(6, 2)]["exp_noise_rate"] >= out[(2, 6)]["exp_noise_rate"]


# -- incremental dedup screen --------------------------------------------


def test_incremental_screen_verdicts(spark, tmp_path):
    from pydala2_spark.operators.dedup import incremental_dedup_screen

    ref = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "pack my box with five dozen liquor jugs right now"),
            (3, "sphinx of black quartz judge my vow said the king"),
        ],
        ["doc_id", "text"],
    )
    incoming = spark.createDataFrame(
        [
            # verbatim copy of 1 -> exact
            (101, "the quick brown fox jumps over the lazy dog today"),
            # one-token-changed copy of 2 -> near (high shingle overlap)
            (102, "pack my box with five dozen liquor jugs right here"),
            # unrelated -> unique
            (103, "completely different words about nothing in particular"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in incremental_dedup_screen(
            spark, ref, incoming, str(tmp_path / "idx"), threshold=0.5
        ).collect()
    }
    assert out[101]["verdict"] == "exact" and out[101]["n_matches"] == 1
    assert out[102]["verdict"] == "near" and out[102]["n_matches"] >= 1
    assert out[103]["verdict"] == "unique" and out[103]["n_matches"] == 0


# -- diff in diff --------------------------------------------------------


def test_diff_in_diff_recovers_planted_effect(spark):
    from pydala2_spark.operators.events import diff_in_diff

    # 40 days, two users per group per day. baseline 10, common time
    # trend +5 post, treatment effect +3 post for treated only
    rows = []
    for day in range(40):
        post = day > 19  # midpoint split: d0=day0, d1=day39 -> mid=day19
        for uid in (0, 2):  # treated (even)
            rows.append(
                (uid, f"2024-01-{day + 1:02d} 12:00:00" if day < 31
                 else f"2024-02-{day - 30:02d} 12:00:00",
                 10.0 + (5.0 + 3.0 if post else 0.0))
            )
        for uid in (1, 3):  # control (odd)
            rows.append(
                (uid, f"2024-01-{day + 1:02d} 12:00:00" if day < 31
                 else f"2024-02-{day - 30:02d} 12:00:00",
                 10.0 + (5.0 if post else 0.0))
            )
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    row = _one(diff_in_diff(ev, treat_col=F.col("user_id") % 2 == 0))
    assert row["did"] == pytest.approx(3.0, abs=1e-9)
    # naive post-pre on treated alone would read 8.0; DiD removes the
    # common +5 trend
    assert row["m_treat_post"] - row["m_treat_pre"] == pytest.approx(8.0, abs=1e-9)
    # zero within-cell variance => se == 0 => z NULL (guarded)
    assert row["se"] == 0.0 and row["z_score"] is None


def test_diff_in_diff_null_when_no_effect(spark):
    from pydala2_spark.operators.events import diff_in_diff

    rows = []
    for day in range(20):
        for uid in range(4):
            rows.append(
                (uid, f"2024-03-{day + 1:02d} 09:00:00",
                 float(uid) + (1.0 if day > 9 else 0.0))
            )
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    row = _one(diff_in_diff(ev, treat_col=F.col("user_id") % 2 == 0))
    assert row["did"] == pytest.approx(0.0, abs=1e-9)


# -- winsorized mean -----------------------------------------------------


def test_winsorized_mean_clamps_spikes(spark):
    from pydala2_spark.functions.dq import winsorized_mean

    base = [float(v) for v in range(1, 99)]  # 1..98
    data = base + [10_000.0, -10_000.0]  # two spikes
    row = _one(
        winsorized_mean(
            spark.createDataFrame(pd.DataFrame({"v": data})),
            "v",
            lo_q=0.02,
            hi_q=0.98,
        )
    )
    # type-1 quantiles over 100 rows: p_lo = 2nd smallest, p_hi = 98th
    sv = sorted(data)
    # type-1: p_lo = smallest v with cum >= 2 (the 2nd value), p_hi =
    # smallest v with cum >= 98 (the 98th value = 97.0 — so both 98.0
    # and the spike clamp down)
    assert row["p_lo"] == sv[1] and row["p_hi"] == sv[97]
    assert row["n_clamped_lo"] == 1 and row["n_clamped_hi"] == 2
    # winsorized mean is near the uncontaminated center; raw is not
    assert abs(row["winsorized_mean"] - 49.5) < 2.0
    assert row["raw_mean"] == pytest.approx(sum(data) / 100, abs=1e-6)


def test_winsorized_mean_noop_on_clean_data(spark):
    from pydala2_spark.functions.dq import winsorized_mean

    data = [float(v) for v in range(1, 101)]
    row = _one(
        winsorized_mean(
            spark.createDataFrame(pd.DataFrame({"v": data})),
            "v",
            lo_q=0.0,
            hi_q=1.0,
        )
    )
    assert row["winsorized_mean"] == row["raw_mean"]
    assert row["n_clamped_lo"] == 0 and row["n_clamped_hi"] == 0


# -- graph component sizes -----------------------------------------------


def test_component_sizes_hand_graph(spark):
    from pydala2_spark.queries import queries  # noqa: F401 (import check)
    from pydala2_spark.operators.dedup import duplicate_clusters

    # triangle {1,2,3}, edge {10,11}, chain {20,21,22,23}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        ["id_a", "id_b"],
    )
    cl = duplicate_clusters(pairs)
    sizes = (
        cl.groupBy("cluster_id", "cluster_size")
        .count()
        .groupBy("cluster_size")
        .count()
        .collect()
    )
    got = {r["cluster_size"]: r["count"] for r in sizes}
    assert got == {3: 1, 2: 1, 4: 1}


# -- idf drift -----------------------------------------------------------


def test_idf_drift_identical_halves_zero(spark):
    from pydala2_spark.operators.curate import idf_drift

    docs = spark.createDataFrame(
        pd.DataFrame({"text": ["alpha beta gamma", "beta gamma delta"]})
    )
    row = _one(idf_drift(docs, docs))
    assert row["mean_abs_idf_shift"] == 0.0
    assert row["max_abs_idf_shift"] == 0.0
    assert row["n_only_a"] == 0 and row["n_only_b"] == 0


def test_idf_drift_detects_shift(spark):
    from pydala2_spark.operators.curate import idf_drift

    # term "x" in 1/2 ref docs (idf ln2) vs 2/2 incoming docs (idf 0)
    ref = spark.createDataFrame(
        pd.DataFrame({"text": ["x common", "common other"]})
    )
    new = spark.createDataFrame(
        pd.DataFrame({"text": ["x common", "x common"]})
    )
    row = _one(idf_drift(ref, new))
    assert row["max_abs_idf_shift"] == pytest.approx(math.log(2), abs=1e-6)
    assert row["n_only_a"] == 1  # "other" vanished
    assert row["n_shared_terms"] == 2  # x, common
