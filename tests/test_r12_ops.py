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
