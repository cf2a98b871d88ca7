"""Round-13 operator contracts: the degenerate-input guards the r12
advice flagged (diff-in-diff cells with <2 rows, jackknife with one
populated block / negative ids), plus contracts for the r13 additions
as they land (CSV/JSON round-trip scans, t-digest quantiles,
streaming session funnels, association rules)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _one(df):
    rows = df.collect()
    assert len(rows) == 1, rows
    return rows[0]


# -- diff-in-diff degenerate cells ----------------------------------------


def test_diff_in_diff_single_row_cell_null_se(spark):
    # treated-post holds exactly ONE row -> its var/n is 0/0; the guard
    # must emit NULL se and NULL z (not NaN, not an ANSI error), while
    # the cell means and did remain defined.
    from pydala2_spark.operators.events import diff_in_diff

    rows = []
    for day in range(10):
        post = day > 4
        # control rows both sides, two per day
        rows.append((1, f"2024-05-{day + 1:02d} 08:00:00", 10.0 + day * 0.1))
        rows.append((3, f"2024-05-{day + 1:02d} 09:00:00", 11.0 + day * 0.1))
        # treated rows PRE only, except one lone post row on day 6
        if not post:
            rows.append((0, f"2024-05-{day + 1:02d} 10:00:00", 12.0 + day))
    rows.append((0, "2024-05-06 11:00:00", 20.0))  # the lone treated-post row
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    row = _one(diff_in_diff(ev, treat_col=F.col("user_id") % 2 == 0))
    assert row["m_treat_post"] == pytest.approx(20.0, abs=1e-9)
    assert row["did"] is not None
    assert row["se"] is None and row["z_score"] is None


def test_diff_in_diff_empty_cell_null_se(spark):
    # one treat group entirely absent post-midpoint -> n=0 cell:
    # mean NULL, se NULL, no error
    from pydala2_spark.operators.events import diff_in_diff

    rows = []
    for day in range(10):
        post = day > 4
        rows.append((1, f"2024-06-{day + 1:02d} 08:00:00", 5.0 + day))
        rows.append((1, f"2024-06-{day + 1:02d} 18:00:00", 6.0 + day))
        if not post:  # treated rows only PRE
            rows.append((0, f"2024-06-{day + 1:02d} 10:00:00", 7.0 + day))
            rows.append((0, f"2024-06-{day + 1:02d} 11:00:00", 8.0 + day))
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    row = _one(diff_in_diff(ev, treat_col=F.col("user_id") % 2 == 0))
    assert row["m_treat_post"] is None
    assert row["did"] is None and row["se"] is None and row["z_score"] is None


# -- jackknife degenerate blocks ------------------------------------------


def test_jackknife_single_populated_block_null_se(spark):
    # constant id_col: n_groups=20 residue classes but only ONE is
    # populated; every leave-one-out mean is 0/0. Guarded -> explicit
    # NULL se/ci, defined mean, n_blocks=1.
    from pydala2_spark.functions.dq import jackknife_ci

    pdf = pd.DataFrame({"id": [7] * 50, "v": [float(i) for i in range(50)]})
    row = _one(jackknife_ci(spark.createDataFrame(pdf), "v", "id"))
    assert row["n_blocks"] == 1
    assert row["mean"] == pytest.approx(24.5, abs=1e-9)
    assert row["se_jack"] is None
    assert row["ci_lo"] is None and row["ci_hi"] is None


def test_jackknife_negative_ids_use_pmod_blocks(spark):
    # negative ids must land in pmod (non-negative) residue classes —
    # the same answer as the shifted-to-non-negative ids
    from pydala2_spark.functions.dq import jackknife_ci

    vals = [float(i % 13) + 0.5 * (i % 3) for i in range(120)]
    neg = pd.DataFrame({"id": [i - 60 for i in range(120)], "v": vals})
    pos = pd.DataFrame({"id": [(i - 60) % 8 for i in range(120)], "v": vals})
    r_neg = _one(
        jackknife_ci(spark.createDataFrame(neg), "v", "id", n_groups=8)
    )
    r_pos = _one(
        jackknife_ci(spark.createDataFrame(pos), "v", "id", n_groups=8)
    )
    assert r_neg["n_blocks"] == 8
    for c in ("n_rows", "n_blocks", "mean", "se_jack", "ci_lo", "ci_hi"):
        assert r_neg[c] == r_pos[c], c


def test_jackknife_negative_ids_match_oracle(spark):
    # the oracle's ((id % n) + n) % n must agree with Spark pmod on
    # negative ids end-to-end
    import duckdb

    from pydala2_spark.functions.dq import jackknife_ci, jackknife_oracle_sql

    vals = [float(i % 11) * 1.25 for i in range(90)]
    pdf = pd.DataFrame({"id": [i - 45 for i in range(90)], "v": vals})
    spark_row = _one(
        jackknife_ci(spark.createDataFrame(pdf), "v", "id", n_groups=6)
    )
    con = duckdb.connect()
    con.register("jk_neg", pdf)
    sql = jackknife_oracle_sql(
        "SELECT id, v FROM jk_neg", "v", "id", n_groups=6
    )
    oracle = con.execute(sql).fetchone()
    cols = ["n_rows", "n_blocks", "mean", "se_jack", "ci_lo", "ci_hi"]
    for c, o in zip(cols, oracle):
        sv = spark_row[c]
        if isinstance(o, float):
            assert sv == pytest.approx(o, abs=1e-9), c
        else:
            assert sv == o, c


# -- CSV/JSON round-trip datasets (S4/S5 driver-query support) -------------


def test_json_roundtrip_resurfaces_null_fields(spark, tmp_ds_path):
    # Spark's JSON writer OMITS null fields; an explicit read schema
    # must bring them back as typed NULLs
    from pydala2_spark.sources.dataset import JSONDataset

    src = spark.createDataFrame(
        [(1, "en", 10), (2, None, 20), (3, "de", None)],
        "doc_id bigint, lang string, n_chars bigint",
    )
    ds = JSONDataset(
        tmp_ds_path, spark=spark,
        schema="doc_id bigint, lang string, n_chars bigint",
    )
    ds.write_to_dataset(src, mode="overwrite")
    rows = {r["doc_id"]: r for r in ds.df.collect()}
    assert rows[2]["lang"] is None and rows[2]["n_chars"] == 20
    assert rows[3]["lang"] == "de" and rows[3]["n_chars"] is None


def test_csv_roundtrip_explicit_schema_types(spark, tmp_ds_path):
    # explicit schema read-back (the scale path: no inference pass)
    # preserves exact types and 2-decimal doubles bit-for-bit
    from pydala2_spark.sources.dataset import CSVDataset

    src = spark.createDataFrame(
        [(1, "a,b", 12.34), (2, "plain", -0.05)],
        "id bigint, name string, v double",
    )
    ds = CSVDataset(
        tmp_ds_path, spark=spark, schema="id bigint, name string, v double"
    )
    ds.write_to_dataset(src, mode="overwrite")
    got = {r["id"]: r for r in ds.df.collect()}
    assert dict(ds.df.dtypes) == {"id": "bigint", "name": "string", "v": "double"}
    assert got[1]["name"] == "a,b" and got[1]["v"] == 12.34
    assert got[2]["v"] == -0.05


# -- DDSketch ---------------------------------------------------------------


def test_ddsketch_relative_error_bound(spark):
    from pydala2_spark.functions.sketch import (
        ddsketch_quantiles,
        ddsketch_state,
    )

    vals = [1.0 + (i * 37 % 1000) * 3.7 for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {
        r["q"]: r
        for r in ddsketch_quantiles(
            ddsketch_state(df, "v", alpha=0.01), [0.5, 0.9, 0.99], alpha=0.01
        ).collect()
    }
    sv = sorted(vals)
    n = len(sv)
    for q in (0.5, 0.9, 0.99):
        # exact value at the same cum >= q*n convention
        idx = math.ceil(q * n) - 1
        exact = sv[idx]
        assert abs(out[q]["est_value"] - exact) / exact <= 0.0101, q
        assert out[q]["n_rows"] == n


def test_ddsketch_merge_equals_single_pass(spark):
    from pydala2_spark.functions.sketch import ddsketch_merge, ddsketch_state

    vals = [(float(i % 97) + 0.5, i) for i in range(500)]
    df = spark.createDataFrame(vals, "v double, i bigint")
    full = ddsketch_state(df, "v")
    merged = ddsketch_merge(
        ddsketch_state(df.filter(F.col("i") % 2 == 0), "v"),
        ddsketch_state(df.filter(F.col("i") % 2 == 1), "v"),
    )
    a = {r["bucket"]: r["cnt"] for r in full.collect()}
    b = {r["bucket"]: r["cnt"] for r in merged.collect()}
    assert a == b and sum(a.values()) == 500


def test_ddsketch_filters_nonpositive(spark):
    from pydala2_spark.functions.sketch import ddsketch_state

    df = spark.createDataFrame(
        [(1.0,), (0.0,), (-5.0,), (None,), (2.0,)], "v double"
    )
    total = sum(r["cnt"] for r in ddsketch_state(df, "v").collect())
    assert total == 2


# -- Gini ---------------------------------------------------------------


def test_gini_known_values(spark):
    from pydala2_spark.functions.skew import gini_coefficient

    even = spark.createDataFrame(
        [(5.0, i) for i in range(8)], "v double, k bigint"
    )
    row = _one(gini_coefficient(even, "v", ["k"]))
    assert row["gini"] == 0.0 and row["n_rows"] == 8
    # one row holds everything: G = (n-1)/n = 0.75 for n=4
    conc = spark.createDataFrame(
        [(0.0, 1), (0.0, 2), (0.0, 3), (10.0, 4)], "v double, k bigint"
    )
    row = _one(gini_coefficient(conc, "v", ["k"]))
    assert row["gini"] == pytest.approx(0.75, abs=1e-9)


def test_gini_filters_negative_and_null(spark):
    from pydala2_spark.functions.skew import gini_coefficient

    df = spark.createDataFrame(
        [(1.0, 1), (-3.0, 2), (None, 3), (2.0, 4)], "v double, k bigint"
    )
    row = _one(gini_coefficient(df, "v", ["k"]))
    assert row["n_rows"] == 2


# -- Wasserstein ---------------------------------------------------------


def test_wasserstein_known_shift(spark):
    from pydala2_spark.functions.dq import wasserstein_1d

    rows = [(0.0, "a"), (1.0, "a"), (1.0, "b"), (2.0, "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    row = _one(
        wasserstein_1d(df, "v", F.col("g") == "a", F.col("g") == "b")
    )
    # F_a - F_b: [0,1): 0.5; [1,2): 1.0 - 0.5 = 0.5 -> W1 = 1.0
    assert row["w1"] == pytest.approx(1.0, abs=1e-9)
    assert row["n_a"] == 2 and row["n_b"] == 2


def test_wasserstein_identical_is_zero(spark):
    from pydala2_spark.functions.dq import wasserstein_1d

    rows = [(float(i % 7), "a") for i in range(70)] + [
        (float(i % 7), "b") for i in range(70)
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    row = _one(
        wasserstein_1d(df, "v", F.col("g") == "a", F.col("g") == "b")
    )
    assert row["w1"] == 0.0


def test_wasserstein_empty_cohort_null(spark):
    from pydala2_spark.functions.dq import wasserstein_1d

    rows = [(1.0, "a"), (2.0, "a"), (3.0, "a")]
    df = spark.createDataFrame(rows, "v double, g string")
    row = _one(
        wasserstein_1d(df, "v", F.col("g") == "a", F.col("g") == "b")
    )
    assert row["w1"] is None and row["n_b"] == 0


# -- CUPED ---------------------------------------------------------------


def test_cuped_recovers_effect_and_reduces_variance(spark):
    from pydala2_spark.operators.events import cuped

    # BALANCED design (covariate independent of assignment — CUPED's
    # own precondition): x = 10 + (u % 5) is uniform within each
    # parity group over 40 users, post value = 2x + 5*treat exactly.
    # Then theta = 2 and both estimators recover the planted 5.0, and
    # the covariate explains corr^2 = 4*var(x)/(4*var(x)+25*var(t))
    # = 8/14.25 of the outcome variance.
    rows = []
    for u in range(40):
        x = 10.0 + (u % 5)
        treat = u % 2 == 0
        for d in range(1, 6):  # pre period
            rows.append((u, f"2024-01-{d:02d} 10:00:00", x))
        for d in range(7, 12):  # post period
            rows.append(
                (u, f"2024-01-{d:02d} 10:00:00",
                 2.0 * x + (5.0 if treat else 0.0))
            )
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    row = _one(cuped(ev, treat_col=F.col("user_id") % 2 == 0))
    assert row["n_users"] == 40
    assert row["theta"] == pytest.approx(2.0, abs=1e-6)
    assert row["diff_raw"] == pytest.approx(5.0, abs=1e-6)
    assert row["diff_cuped"] == pytest.approx(5.0, abs=1e-6)
    assert row["var_reduction"] == pytest.approx(8.0 / 14.25, abs=1e-6)


def test_cuped_constant_covariate_null_theta(spark):
    from pydala2_spark.operators.events import cuped

    rows = []
    for u in range(10):
        rows.append((u, "2024-02-01 10:00:00", 1.0))  # constant pre
        rows.append((u, "2024-02-10 10:00:00", float(u)))
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    row = _one(cuped(ev, treat_col=F.col("user_id") % 2 == 0))
    assert row["theta"] is None and row["diff_cuped"] is None
    assert row["diff_raw"] is not None


# -- lexical diversity -------------------------------------------------------


def test_lexical_diversity_known_corpus(spark):
    from pydala2_spark.operators.curate import lexical_diversity

    docs = spark.createDataFrame(
        [
            ("s1", "a a a a"),          # 4 tokens, 1 type
            ("s2", "a b c d"),          # 4 tokens, 4 types
        ],
        "source string, text string",
    )
    rows = {r["source"]: r for r in lexical_diversity(docs, "source").collect()}
    # s1: sum c(c-1) = 12, N(N-1) = 12 -> simpson 1.0
    assert rows["s1"]["simpson"] == 1.0
    assert rows["s1"]["effective_types"] == 1.0
    # s2: all distinct -> simpson 0, effective NULL (1/0 guarded)
    assert rows["s2"]["simpson"] == 0.0
    assert rows["s2"]["effective_types"] is None
    assert rows["s2"]["ttr"] == 1.0


# -- streaming session funnel ------------------------------------------------


class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def test_funnel_fn_ordered_stages():
    from pydala2_spark.streaming.pipeline import _funnel_fn

    us = 1_000_000  # microseconds per step
    t0 = 1_700_000_000_000_000

    def pdf(rows):
        return pd.DataFrame(
            {
                "user_id": [1] * len(rows),
                "ts": pd.to_datetime(
                    [t0 + r[0] * us for r in rows], unit="us"
                ),
                "event_id": [i for i in range(len(rows))],
                "event_type": [r[1] for r in rows],
            }
        )

    # session 1: click before view -> only view counts -> stage 1;
    # >30 min gap; session 2: view, click, purchase in order -> stage 3
    gap = 31 * 60
    rows = [
        (0, "click"), (10, "view"),
        (gap + 20, "view"), (gap + 30, "click"), (gap + 40, "purchase"),
    ]
    st = _FakeState()
    out = list(_funnel_fn((1,), [pdf(rows)], st))
    r = out[0].iloc[0]
    assert (r["s0"], r["s1"], r["s2"], r["s3"]) == (0, 1, 0, 1)


def test_funnel_fn_open_session_counts_and_state_carries():
    from pydala2_spark.streaming.pipeline import _funnel_fn

    us = 1_000_000
    t0 = 1_700_000_000_000_000

    def pdf(rows, base_id=0):
        return pd.DataFrame(
            {
                "user_id": [7] * len(rows),
                "ts": pd.to_datetime([t0 + r[0] * us for r in rows], unit="us"),
                "event_id": [base_id + i for i in range(len(rows))],
                "event_type": [r[1] for r in rows],
            }
        )

    st = _FakeState()
    out1 = list(_funnel_fn((7,), [pdf([(0, "view"), (5, "click")])], st))
    r1 = out1[0].iloc[0]
    assert (r1["s1"], r1["s2"]) == (0, 1)  # open session at stage 2
    # second batch continues the SAME session to purchase
    out2 = list(_funnel_fn((7,), [pdf([(10, "purchase")], 100)], st))
    r2 = out2[0].iloc[0]
    assert (r2["s2"], r2["s3"]) == (0, 1)


# -- Theil decomposition -------------------------------------------------


def test_theil_decomposition_adds_up_and_known_cases(spark):
    from pydala2_spark.functions.skew import theil_decomposition

    # all-equal values -> zero inequality
    eq = spark.createDataFrame(
        [("a", 5.0)] * 4 + [("b", 5.0)] * 4, "g string, v double"
    )
    row = _one(theil_decomposition(eq, "v", "g"))
    assert row["theil_total"] == 0.0
    assert row["theil_between"] == 0.0 and row["theil_within"] == 0.0
    # between-only inequality: each group internally equal
    be = spark.createDataFrame(
        [("a", 2.0)] * 4 + [("b", 8.0)] * 4, "g string, v double"
    )
    row = _one(theil_decomposition(be, "v", "g"))
    assert row["theil_within"] == pytest.approx(0.0, abs=1e-9)
    assert row["theil_between"] == pytest.approx(row["theil_total"], abs=1e-9)
    # python reference for the total: T = sum(v/A * ln(v/mu))... via
    # T = L/A - ln(mu)
    vals = [2.0] * 4 + [8.0] * 4
    A = sum(vals)
    L = sum(round(v * math.log(v), 12) for v in vals)
    t_ref = L / A - math.log(A / len(vals))
    assert row["theil_total"] == pytest.approx(t_ref, abs=1e-6)
    # mixed: decomposition must ADD UP
    mix = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 30.0), ("b", 20.0)],
        "g string, v double",
    )
    row = _one(theil_decomposition(mix, "v", "g"))
    assert row["theil_between"] + row["theil_within"] == pytest.approx(
        row["theil_total"], abs=1e-5
    )
    assert row["theil_total"] > row["theil_between"] > 0


def test_theil_filters_nonpositive(spark):
    from pydala2_spark.functions.skew import theil_decomposition

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 0.0), ("a", -2.0), ("a", None), ("b", 4.0)],
        "g string, v double",
    )
    row = _one(theil_decomposition(df, "v", "g"))
    assert row["n_rows"] == 2 and row["n_groups"] == 2


# -- freshness -------------------------------------------------------------


def test_freshness_flags_stale_feed(spark):
    from pydala2_spark.functions.dq import freshness_report

    rows = []
    # live feed: daily events up to day 28
    for d in range(1, 29):
        rows.append(("live", f"2024-03-{d:02d} 12:00:00"))
    # dead feed: stopped at day 10
    for d in range(1, 11):
        rows.append(("dead", f"2024-03-{d:02d} 06:00:00"))
    df = spark.createDataFrame(rows, ["src", "ts"]).select(
        "src", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {r["src"]: r for r in freshness_report(df, "src", "ts").collect()}
    assert out["live"]["lag_hours"] == 0.0
    # dead: last seen 03-10 06:00, frontier 03-28 12:00 -> 438 h
    assert out["dead"]["lag_hours"] == pytest.approx(438.0, abs=1e-9)
    # live had 7 events in the trailing window and 7 before -> ratio 1
    assert out["live"]["rate_ratio"] == 1.0
    # dead has nothing in either trailing window -> NULL ratio
    assert out["dead"]["n_last"] == 0 and out["dead"]["rate_ratio"] is None
    assert out["dead"]["last_seen"] == "2024-03-10 06:00:00"


# -- burstiness -------------------------------------------------------------


def test_burstiness_regular_vs_bursty(spark):
    from pydala2_spark.operators.events import burstiness

    rows = []
    # metronome: exactly hourly -> cv 0, B = -1
    for i in range(24):
        rows.append((i, f"2024-04-01 {i:02d}:00:00", "regular"))
    # bursty: clusters of 4 events 1 s apart, clusters 6 h apart
    eid = 100
    for c in range(4):
        for k in range(4):
            rows.append(
                (eid, f"2024-04-01 {c * 6:02d}:00:{k:02d}", "bursty")
            )
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"]).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    out = {r["event_type"]: r for r in burstiness(df).collect()}
    assert out["regular"]["cv"] == 0.0
    assert out["regular"]["burstiness"] == -1.0
    assert out["regular"]["n_gaps"] == 23
    # 12 one-second gaps + 3 ~six-hour gaps: cv ~= 2 -> B ~= 1/3
    assert out["bursty"]["burstiness"] > 0.3
    assert out["bursty"]["n_gaps"] == 15
    assert out["bursty"]["mean_gap_s"] == pytest.approx(
        (12 * 1 + 3 * 21597) / 15.0, abs=1e-6
    )


def test_burstiness_single_event_group_absent(spark):
    from pydala2_spark.operators.events import burstiness

    df = spark.createDataFrame(
        [(1, "2024-04-01 10:00:00", "solo"), (2, "2024-04-01 10:00:00", "pair"),
         (3, "2024-04-01 11:00:00", "pair")],
        ["event_id", "ts", "event_type"],
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    out = {r["event_type"]: r for r in burstiness(df).collect()}
    assert "solo" not in out and out["pair"]["n_gaps"] == 1


# -- power / MDE -------------------------------------------------------------


def test_power_mde_analytic(spark):
    from pydala2_spark.operators.events import (
        Z_ALPHA_025,
        Z_POWER_080,
        power_mde,
    )

    # four users with constant per-user means 10, 12, 14, 16:
    # mean 13, var 5 (population), n_arm = 2
    rows = []
    for u, v in ((1, 10.0), (2, 12.0), (3, 14.0), (4, 16.0)):
        rows += [(u, v), (u, v)]  # two identical events per user
    df = spark.createDataFrame(rows, "user_id bigint, value double")
    row = _one(power_mde(df, "value", "user_id", rel_effect=0.01))
    z = Z_ALPHA_025 + Z_POWER_080
    assert row["n_users"] == 4
    assert row["mean_metric"] == pytest.approx(13.0, abs=1e-9)
    assert row["sd_user"] == pytest.approx(math.sqrt(5.0), abs=1e-6)
    assert row["mde_abs"] == pytest.approx(z * math.sqrt(2 * 5.0 / 2), abs=1e-6)
    assert row["n_per_arm_for_target"] == math.ceil(
        2 * z * z * 5.0 / (0.01 * 13.0) ** 2
    )


def test_power_mde_degenerate_guards(spark):
    from pydala2_spark.operators.events import power_mde

    one = spark.createDataFrame([(1, 5.0)], "user_id bigint, value double")
    row = _one(power_mde(one, "value", "user_id"))
    assert row["n_users"] == 1 and row["mde_abs"] is None
    zero_mean = spark.createDataFrame(
        [(1, -2.0), (2, 2.0)], "user_id bigint, value double"
    )
    row = _one(power_mde(zero_mean, "value", "user_id"))
    assert row["mde_abs"] is not None  # variance exists
    assert row["mde_rel"] is None and row["n_per_arm_for_target"] is None


# -- rich club -------------------------------------------------------------


def test_rich_club_hand_graph(spark):
    from pydala2_spark.operators.graph import rich_club

    # star 0-(1..5) plus triangle 6-7-8: deg(0)=5, leaves 1, tri 2
    edges = [(0, i) for i in range(1, 6)] + [(6, 7), (7, 8), (6, 8)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = {r["k"]: r for r in rich_club(df, thresholds=(0, 1, 4)).collect()}
    # k=0: whole graph — 9 nodes, 8 edges
    assert out[0]["n_nodes"] == 9 and out[0]["n_edges"] == 8
    assert out[0]["phi"] == pytest.approx(2 * 8 / (9 * 8), abs=1e-6)  # round-6 output
    # k=1: center + triangle (deg>1) — star edges drop (leaf deg 1)
    assert out[1]["n_nodes"] == 4 and out[1]["n_edges"] == 3
    assert out[1]["phi"] == pytest.approx(0.5, abs=1e-9)
    # k=4: only the center clears — phi NULL below 2 nodes
    assert out[4]["n_nodes"] == 1 and out[4]["phi"] is None


# -- window-family additions ----------------------------------------------


def test_cumulative_users_monotone_and_total(spark, sf_dir):
    from pydala2_spark.queries import queries

    rows = (
        queries()["w_cumulative_users"](spark, sf_dir)
        .orderBy("day")
        .collect()
    )
    cums = [r["cum_users"] for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == sum(r["n_new"] for r in rows)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.filter(F.col("user_id").isNotNull()).select(
        "user_id"
    ).distinct().count()
    assert cums[-1] == n_users


def test_yoy_growth_join_semantics(spark, sf_dir):
    from pydala2_spark.queries import queries

    rows = {r["month"]: r for r in
            queries()["w_yoy_growth"](spark, sf_dir).collect()}
    # every month of the FIRST year has no prior year -> NULL pct
    first_year = min(m[:4] for m in rows)
    for m, r in rows.items():
        if m.startswith(first_year):
            assert r["prev_year_revenue"] is None and r["yoy_pct"] is None
    # a month with a prior year gets the exact ratio
    linked = [r for r in rows.values() if r["prev_year_revenue"] is not None]
    assert linked, "corpus spans multiple years"
    r = linked[0]
    expect = round(
        (r["revenue"] - r["prev_year_revenue"]) / r["prev_year_revenue"] * 100,
        4,
    )
    assert r["yoy_pct"] == pytest.approx(expect, abs=1e-9)


# -- multi-sum distributed_prefix ------------------------------------------


def test_distributed_prefix_multi_sum_matches_single(spark):
    from pydala2_spark.functions.skew import distributed_prefix

    rows = [(float(i % 23), i, float(i % 5), float(i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "v double, k bigint, a double, b double")
    df = df.selectExpr(
        "v", "k", "CAST(a AS DECIMAL(38,6)) a", "CAST(b AS DECIMAL(38,6)) b"
    )
    multi = distributed_prefix(
        df, ["v", "k"], sum_col=["a", "b"], cum_col=["ca", "cb"],
        rank_col="r",
    ).select("k", "r", "ca", "cb").collect()
    sa = distributed_prefix(
        df, ["v", "k"], sum_col="a", cum_col="ca", rank_col="r"
    ).select("k", "r", "ca").collect()
    sb = distributed_prefix(
        df, ["v", "k"], sum_col="b", cum_col="cb", rank_col="r"
    ).select("k", "cb").collect()
    m = {r["k"]: r for r in multi}
    for r in sa:
        assert m[r["k"]]["r"] == r["r"] and m[r["k"]]["ca"] == r["ca"]
    for r in sb:
        assert m[r["k"]]["cb"] == r["cb"]
    # exactness: the final cum equals the exact total
    import decimal

    tot_a = sum(decimal.Decimal(i % 5) for i in range(500))
    assert max(r["ca"] for r in multi) == tot_a


# -- retention half-life ------------------------------------------------------


def test_retention_halflife_recovers_planted_decay(spark):
    from pydala2_spark.operators.events import retention_halflife

    # 60 users in ONE cohort (day 0), exact exponential decay with
    # half-life 4 days: active count halves every 4 days over a
    # 14-day fully-observed window (plus padding days so the window
    # is complete).
    import math

    rows = []
    day0 = 1
    for u in range(60):
        rows.append((u, f"2024-07-{day0:02d} 10:00:00"))
    for d in range(1, 15):
        n_active = round(60 * math.exp(-math.log(2) / 4 * d))
        for u in range(n_active):
            rows.append((u, f"2024-07-{day0 + d:02d} 10:00:00"))
    # sentinel user keeps the corpus max day far enough out
    rows.append((999, f"2024-07-{day0:02d} 09:00:00"))
    rows.append((999, "2024-07-20 09:00:00"))
    df = spark.createDataFrame(rows, ["user_id", "ts"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    row = df and retention_halflife(df, max_offset=14).collect()[0]
    assert row["n_cohorts"] == 1 and row["cohort_users"] == 61
    # rounding the planted counts perturbs the fit slightly
    assert row["half_life_days"] == pytest.approx(4.0, rel=0.15)
    assert row["slope"] < 0
    assert row["rate_1"] == pytest.approx(round(60 * math.exp(-math.log(2) / 4)) / 61, abs=1e-6)


def test_retention_halflife_flat_retention_null(spark):
    from pydala2_spark.operators.events import retention_halflife

    # everyone active every day -> rate 1.0 at every offset -> slope 0
    # -> half-life NULL (not inf/NaN)
    rows = []
    for u in range(10):
        for d in range(1, 17):
            rows.append((u, f"2024-08-{d:02d} 12:00:00"))
    df = spark.createDataFrame(rows, ["user_id", "ts"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    row = retention_halflife(df, max_offset=14).collect()[0]
    assert row["slope"] == 0.0
    assert row["half_life_days"] is None
