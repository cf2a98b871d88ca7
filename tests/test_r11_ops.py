"""Round-11 operator contracts: Spearman, PSI, candidate keys, HITS,
periodogram, Granger lead-lag, seasonal decomposition, OOV rate,
negative sampling."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _one(df):
    rows = df.collect()
    assert len(rows) == 1, rows
    return rows[0]


# -- Spearman ------------------------------------------------------------


def _spearman_numpy(xs, ys):
    import numpy as np

    def avg_ranks(v):
        v = np.asarray(v, dtype=float)
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v))
        i = 0
        sv = v[order]
        while i < len(v):
            j = i
            while j < len(v) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0  # 1-based average rank
            i = j
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    rx, ry = rx - rx.mean(), ry - ry.mean()
    return float((rx * ry).sum() / math.sqrt((rx**2).sum() * (ry**2).sum()))


def test_spearman_matches_numpy_with_ties(spark):
    from pydala2_spark.functions.dq import spearman_corr

    xs = [1, 2, 2, 3, 3, 3, 10, 4, 5, 1]
    ys = [2.0, 1.0, 3.0, 3.0, 5.0, 4.0, 30.0, 4.0, 6.0, 0.5]
    df = spark.createDataFrame(pd.DataFrame({"x": xs, "y": ys}))
    row = _one(spearman_corr(df, "x", "y"))
    assert row["n_pairs"] == 10
    assert row["spearman_rho"] == pytest.approx(
        _spearman_numpy(xs, ys), abs=1e-6
    )


def test_spearman_stacked_path_matches_per_column_path(spark):
    # r14: same-dtype inputs take the single composite-prefix path;
    # mixed dtypes keep the per-column pipelines. Same data, same
    # answer — the int column cast to double flips the path taken.
    from pydala2_spark.functions.dq import spearman_corr

    xs = [1, 2, 2, 3, 3, 3, 10, 4, 5, 1]
    ys = [2.0, 1.0, 3.0, 3.0, 5.0, 4.0, 30.0, 4.0, 6.0, 0.5]
    mixed = spark.createDataFrame(pd.DataFrame({"x": xs, "y": ys}))
    same = spark.createDataFrame(
        pd.DataFrame({"x": [float(v) for v in xs], "y": ys})
    )
    assert dict(mixed.dtypes)["x"] != dict(mixed.dtypes)["y"]
    assert dict(same.dtypes)["x"] == dict(same.dtypes)["y"]
    a = _one(spearman_corr(mixed, "x", "y"))
    b = _one(spearman_corr(same, "x", "y"))
    assert a["n_pairs"] == b["n_pairs"] == 10
    assert a["spearman_rho"] == b["spearman_rho"]


def test_spearman_perfect_monotone(spark):
    from pydala2_spark.functions.dq import spearman_corr

    df = spark.createDataFrame(
        pd.DataFrame({"x": range(20), "y": [v**3 for v in range(20)]})
    )
    assert _one(spearman_corr(df, "x", "y"))["spearman_rho"] == 1.0


# -- PSI -----------------------------------------------------------------


def test_psi_zero_for_identical_cohorts(spark):
    from pydala2_spark.functions.dq import psi_report

    pdf = pd.DataFrame({"v": list(range(100)) * 2, "g": [0] * 100 + [1] * 100})
    df = spark.createDataFrame(pdf)
    row = _one(psi_report(df, "v", F.col("g") == 0, bin_width=10, max_bin=9))
    assert row["psi"] == 0.0 and row["n_a"] == row["n_b"] == 100


def test_psi_detects_shift(spark):
    from pydala2_spark.functions.dq import psi_report

    pdf = pd.DataFrame(
        {
            "v": list(range(100)) + [v + 50 for v in range(100)],
            "g": [0] * 100 + [1] * 100,
        }
    )
    df = spark.createDataFrame(pdf)
    row = _one(psi_report(df, "v", F.col("g") == 0, bin_width=10, max_bin=14))
    assert row["psi"] > 0.25  # a half-range shift is "broken" territory


# -- candidate keys ------------------------------------------------------


def test_candidate_keys_verdicts(spark):
    from pydala2_spark.functions.dq import candidate_keys

    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "dup": [1, 1, 2, 2],
            "nul": [1.0, 2.0, None, 4.0],
        }
    )
    out = {
        r["column"]: r
        for r in candidate_keys(
            spark.createDataFrame(pdf), ["id", "dup", "nul"]
        ).collect()
    }
    assert out["id"]["is_candidate_key"] is True
    assert out["dup"]["is_candidate_key"] is False
    assert out["nul"]["is_candidate_key"] is False  # null disqualifies
    assert out["dup"]["n_distinct"] == 2 and out["nul"]["n_nulls"] == 1


# -- HITS ----------------------------------------------------------------


def test_hits_star_graph(spark):
    """One hub pointing at 3 authorities + a 1-edge straggler: the
    star hub must out-score the straggler hub, the shared authorities
    tie, and each role's scores L1-sum to ~1."""
    from pydala2_spark.operators.graph import hits

    edges = spark.createDataFrame(
        pd.DataFrame(
            {"hub": [1, 1, 1, 2], "auth": [10, 11, 12, 10]}
        )
    )
    rows = hits(edges, iterations=4).collect()
    hubs = {r["node"]: r["score"] for r in rows if r["role"] == "hub"}
    auths = {r["node"]: r["score"] for r in rows if r["role"] == "authority"}
    assert hubs[1] > hubs[2]
    assert auths[11] == auths[12] and auths[10] > auths[11]
    assert sum(hubs.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(auths.values()) == pytest.approx(1.0, abs=1e-9)


# -- periodogram ---------------------------------------------------------


def test_periodogram_finds_planted_cycle(spark):
    """Events clustered every 8 hours: power at period 8 dominates the
    other candidates."""
    from pydala2_spark.operators.events import periodogram

    rows = []
    for t in range(24 * 14):  # 14 days of hours
        n = 5 + (4 if t % 8 == 0 else 0)
        for _ in range(n):
            rows.append(pd.Timestamp("2024-01-01") + pd.Timedelta(hours=t))
    df = spark.createDataFrame(pd.DataFrame({"ts": rows}))
    out = {r["period"]: r["power"] for r in periodogram(df, [5, 7, 8, 12]).collect()}
    assert out[8] > 5 * max(out[5], out[7], out[12])


# -- Granger -------------------------------------------------------------


def test_granger_detects_planted_lead(spark):
    """y_t == x_{t-1} by construction -> beta_xlag ~= 1 and a huge F."""
    from pydala2_spark.operators.events import granger_lag_f

    days = pd.date_range("2024-01-01", periods=40, freq="D")
    xs = [float((7 * i) % 13 + 1) for i in range(40)]
    recs = []
    for i, d in enumerate(days):
        recs.append((d + pd.Timedelta(hours=1), "x", xs[i]))
        if i > 0:
            # small deterministic wobble keeps RSS_full > 0 (an exact
            # fit is NULLed by the degenerate-model guard)
            recs.append(
                (d + pd.Timedelta(hours=2), "y", xs[i - 1] + 0.01 * ((3 * i) % 7))
            )
    df = spark.createDataFrame(
        pd.DataFrame(recs, columns=["ts", "event_type", "value"])
    )
    row = _one(granger_lag_f(df, "y", "x"))
    assert row["beta_xlag"] == pytest.approx(1.0, abs=0.05)
    assert row["f_stat"] > 1e3


# -- seasonal decomposition ----------------------------------------------


def test_seasonal_decompose_recovers_dow_bump(spark):
    """Flat daily traffic + a +70 bump every Sunday: the Sunday
    seasonal index is ~+60 (7-day MA absorbs 10), all others ~-10."""
    from pydala2_spark.operators.events import seasonal_decompose_dow

    days = pd.date_range("2024-01-01", periods=42, freq="D")
    recs = []
    for d in days:
        n = 30 + (70 if d.dayofweek == 6 else 0)  # pandas: 6 = Sunday
        for k in range(n):
            recs.append(d + pd.Timedelta(minutes=k))
    df = spark.createDataFrame(pd.DataFrame({"ts": recs}))
    out = {r["dow"]: r["seasonal"] for r in seasonal_decompose_dow(df).collect()}
    assert out[1] == pytest.approx(60.0, abs=1.0)  # Spark dow 1 = Sunday
    for dow in range(2, 8):
        assert out[dow] == pytest.approx(-10.0, abs=1.0)


# -- OOV rate ------------------------------------------------------------


def test_oov_rate_counts(spark):
    from pydala2_spark.operators.curate import oov_rate

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 2, 1, 3],
            "text": ["a b c", "a d", "a b x", "x y y"],
        }
    )
    row = _one(
        oov_rate(spark.createDataFrame(pdf), F.col("doc_id") % 2 == 0)
    )
    # eval half tokens: a b x x y y -> oov x,x,y,y (4/6); types a b x y
    assert row["n_tokens"] == 6 and row["n_oov_tokens"] == 4
    assert row["n_types"] == 4 and row["n_oov_types"] == 2
    assert row["token_oov_rate"] == pytest.approx(4 / 6, abs=1e-6)


# -- negative sampling ---------------------------------------------------


def test_negative_samples_hand_checked(spark):
    """Triangle 1-2-3 + pendant 3-4, ranks = ids, succ wraps 4->1.
    Corruptions: (1,succ(2))=(1,3) collides, (1,succ(3))=(1,4) kept,
    (2,succ(3))=(2,4) kept, (3,succ(4))=(1,3) collides -> negatives
    {(1,4),(2,4)}, each with exactly one common neighbor (node 3);
    positives average cn = (1+1+1+0)/4."""
    from pydala2_spark.operators.graph import negative_edge_samples

    edges = spark.createDataFrame(
        pd.DataFrame({"src": [1, 1, 2, 3], "dst": [2, 3, 3, 4]})
    )
    out = {r["label"]: r for r in negative_edge_samples(edges).collect()}
    assert out[1]["n_pairs"] == 4 and out[1]["avg_cn"] == 0.75
    assert out[0]["n_pairs"] == 2 and out[0]["avg_cn"] == 1.0
    assert out[0]["n_with_cn"] == 2 and out[1]["n_with_cn"] == 3


# -- weighted quantiles ---------------------------------------------------


def test_weighted_quantiles_hand_checked(spark):
    """Values 1..4 with weights 1,1,2,4 (W=8): q25 -> first cum>=2 is
    value 2 (cum 2), median -> value 3 (cum 4), q75 -> value 4."""
    from pydala2_spark.functions.skew import weighted_quantiles

    df = spark.createDataFrame(
        pd.DataFrame({"v": [1, 2, 3, 4], "w": [1, 1, 2, 4]})
    )
    out = {r["q"]: r["value"] for r in weighted_quantiles(df, "v", "w", [0.25, 0.5, 0.75]).collect()}
    assert out[0.25] == 2 and out[0.5] == 3 and out[0.75] == 4


def test_weighted_quantiles_unit_weights_match_unweighted_median(spark):
    from pydala2_spark.functions.skew import weighted_quantiles

    df = spark.createDataFrame(
        pd.DataFrame({"v": list(range(1, 102)), "w": [1] * 101})
    )
    out = _one(weighted_quantiles(df, "v", "w", [0.5]))
    assert out["value"] == 51 and out["total_weight"] == 101.0


# -- feature hashing ------------------------------------------------------


def test_feature_hash_audit_partitions_types(spark):
    from pydala2_spark.operators.curate import feature_hash_audit

    pdf = pd.DataFrame(
        {"text": ["a b c d", "a b", "e f g h i j k l m n o p"]}
    )
    rows = feature_hash_audit(spark.createDataFrame(pdf), n_buckets=4).collect()
    assert sum(r["n_types"] for r in rows) == 16  # every distinct token lands once
    assert sum(r["n_tokens"] for r in rows) == 18
    assert abs(sum(r["type_share"] for r in rows) - 1.0) < 1e-6


# -- multi-probe LSH ------------------------------------------------------


def test_multiprobe_recall_dominates_single(spark, sf_dir):
    """1-flip probing searches a superset of the single bucket, so per
    query hits_multi >= hits_single, and recall values are in [0,1]."""
    from pydala2_spark.queries import queries

    rows = queries()["emb_lsh_multiprobe"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["hits_multi"] >= r["hits_single"]
        assert 0.0 <= r["recall_single"] <= r["recall_multi"] <= 1.0


# -- seasonal anomaly screen ----------------------------------------------


def test_seasonal_anomaly_unflags_weekly_dip_flags_spike(spark):
    """Regular Sunday dips must NOT be anomalies once the dow index is
    removed; a one-off mid-week spike must be."""
    from pydala2_spark.operators.events import seasonal_anomaly_days

    days = pd.date_range("2024-01-01", periods=42, freq="D")
    recs = []
    for i, d in enumerate(days):
        # deterministic jitter keeps MAD > 0 (a perfectly regular
        # series has no scale and the screen NULLs every z)
        n = 100 - (60 if d.dayofweek == 6 else 0) + (i * 7) % 5
        if d == pd.Timestamp("2024-01-17"):  # a Wednesday
            n += 300
        for k in range(n):
            recs.append(d + pd.Timedelta(minutes=k % 1200))
    df = spark.createDataFrame(pd.DataFrame({"ts": recs}))
    out = {r["day"]: r for r in seasonal_anomaly_days(df).collect()}
    import datetime

    spike = out[datetime.date(2024, 1, 17)]
    assert spike["is_anomaly"] is True
    sundays = [
        r for d, r in out.items() if d.weekday() == 6  # python: 6 = Sunday
        and d != datetime.date(2024, 1, 17)
    ]
    assert sundays and all(not r["is_anomaly"] for r in sundays)


# -- column entropy -------------------------------------------------------


def test_column_entropy_orders_constant_vs_uniform(spark):
    import math

    from pydala2_spark.functions.dq import column_entropy

    pdf = pd.DataFrame(
        {
            "const": ["a"] * 64,
            "uniform": [str(i % 8) for i in range(64)],
            "nully": [None] * 63 + ["x"],
        }
    )
    out = {
        r["column"]: r
        for r in column_entropy(
            spark.createDataFrame(pdf), ["const", "uniform", "nully"]
        ).collect()
    }
    assert out["const"]["entropy"] == 0.0 and out["const"]["normalized"] == 0.0
    assert out["uniform"]["entropy"] == pytest.approx(math.log(8), abs=1e-6)
    assert out["uniform"]["normalized"] == pytest.approx(1.0, abs=1e-6)
    assert out["nully"]["ndv"] == 2 and out["nully"]["normalized"] < 0.2


# -- dimension truncation -------------------------------------------------


def test_dim_truncation_recall_bounds(spark, sf_dir):
    from pydala2_spark.queries import queries

    rows = queries()["emb_dim_truncation_eval"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["n_exact"] == 5 and 0.0 <= r["recall"] <= 1.0


# -- degree power law -----------------------------------------------------


def test_degree_powerlaw_mle_hand_checked(spark):
    """Star on 5 leaves + one extra edge: degrees {5:1, 1:4, 2:2}...
    build explicitly: hub 0 -> 1..5, plus 1-2. Degrees: 0:5, 1:2,
    2:2, 3:1, 4:1, 5:1. Tail (d>=2): {5,2,2}; alpha = 1 + 3/ln-sum."""
    import math

    from pydala2_spark.operators.graph import degree_powerlaw

    edges = spark.createDataFrame(
        pd.DataFrame({"src": [0, 0, 0, 0, 0, 1], "dst": [1, 2, 3, 4, 5, 2]})
    )
    row = _one(degree_powerlaw(edges, dmin=2))
    lnsum = sum(
        round(math.log(d / 1.5), 12) for d in (5, 2, 2)
    )
    assert row["n_nodes"] == 6 and row["n_tail"] == 3
    assert row["max_degree"] == 5
    assert row["alpha"] == pytest.approx(1 + 3 / lnsum, abs=1e-4)


# -- active streaks -------------------------------------------------------


def test_active_streaks_gaps_and_islands(spark):
    """User 1: days 1,2,3 then 5,6 -> max streak 3. User 2: days 1 and
    3 -> max streak 1. Histogram: {3:1, 1:1}."""
    from pydala2_spark.operators.events import active_streaks

    recs = []
    for day in [1, 2, 3, 5, 6]:
        recs.append((1, pd.Timestamp(f"2024-01-0{day} 10:00")))
    for day in [1, 3]:
        recs.append((2, pd.Timestamp(f"2024-01-0{day} 11:00")))
    recs.append((1, pd.Timestamp("2024-01-02 23:00")))  # dup day ignored
    df = spark.createDataFrame(pd.DataFrame(recs, columns=["user_id", "ts"]))
    out = {r["streak_len"]: r["n_users"] for r in active_streaks(df).collect()}
    assert out == {3: 1, 1: 1}


# -- DAU/WAU/MAU ----------------------------------------------------------


def test_dau_wau_mau_hand_checked(spark):
    """Users 1,2 daily; user 3 only on day 10: DAU=2 except day 10
    (3); WAU on day 10..16 includes user 3; stickiness = dau/mau."""
    from pydala2_spark.operators.events import dau_wau_mau

    recs = []
    for day in range(1, 21):
        for u in (1, 2):
            recs.append((u, pd.Timestamp(f"2024-01-{day:02d} 08:00")))
    recs.append((3, pd.Timestamp("2024-01-10 09:00")))
    df = spark.createDataFrame(pd.DataFrame(recs, columns=["user_id", "ts"]))
    out = {r["day"]: r for r in dau_wau_mau(df).collect()}
    import datetime

    d10 = out[datetime.date(2024, 1, 10)]
    d16 = out[datetime.date(2024, 1, 16)]
    d17 = out[datetime.date(2024, 1, 17)]
    assert d10["dau"] == 3 and d10["wau"] == 3 and d10["mau"] == 3
    assert d16["dau"] == 2 and d16["wau"] == 3  # day 10 still in the 7-window
    assert d17["wau"] == 2  # user 3 aged out
    assert d17["mau"] == 3  # still in the 30-window
    assert d17["stickiness"] == pytest.approx(2 / 3, abs=1e-4)
