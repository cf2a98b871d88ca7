"""Data-quality audit contracts: FK orphans and Benford conformance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pydala2_spark.functions.dq import benford_report, fk_orphan_report


def test_fk_orphan_report_counts_and_null_exemption(spark):
    """Orphans are non-null FKs missing from the dim; NULL FKs are not
    orphans; multiple relations stack; the dim side broadcasts."""
    fact = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None), (5, 98)], "id long, fk long"
    )
    dim = spark.createDataFrame([(10,), (20,)], "pk long")
    out = fk_orphan_report(
        [("f->d", fact, "fk", dim, "pk"), ("f->d2", fact, "fk", dim, "pk")]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    rows = {r["relation"]: r.asDict() for r in out.collect()}
    assert rows["f->d"]["n_rows"] == 5
    assert rows["f->d"]["n_orphans"] == 2  # 99 and 98; NULL exempt
    assert rows["f->d"]["orphan_pct"] == 40.0
    assert rows["f->d2"]["n_orphans"] == 2

    with pytest.raises(ValueError, match="non-empty"):
        fk_orphan_report([])


def test_benford_report_digits_expectations_chi2(spark):
    """First significant digits count correctly (leading zeros and
    signs skipped); expectations follow n*log10(1+1/d); a perfectly
    Benford-ish vs uniform-digit column orders by chi2."""
    vals = [1.5, 12.0, 0.19, -140.0, 2.5, 29.0, 0.031, 9.9, 91.0]
    #  d:   1    1     1      1      2    2     3      9    9
    df = spark.createDataFrame([(v,) for v in vals] + [(None,), (0.0,)],
                               "v double")
    out = {r["digit"]: r.asDict() for r in benford_report(df, "v").collect()}
    assert {d: out[d]["n_obs"] for d in out} == {1: 4, 2: 2, 3: 1, 9: 2}
    n = 9
    assert out[1]["expected_n"] == round(n * math.log10(2.0), 2)
    # chi2 identical on every row and equals the hand fold
    terms = []
    obs = {1: 4, 2: 2, 3: 1, 9: 2}
    for d, o in obs.items():
        e = n * math.log10(1.0 + 1.0 / d)
        terms.append(round((o - e) ** 2 / e, 6))
    assert out[1]["chi2"] == round(sum(terms), 4)
    assert len({r["chi2"] for r in out.values()}) == 1

    # a uniform-digit column (violates Benford) scores higher chi2
    uni = spark.createDataFrame(
        [(float(d) * 10 + 1,) for d in range(1, 10) for _ in range(10)],
        "v double",
    )
    chi_uni = benford_report(uni, "v").first()["chi2"]
    assert chi_uni > out[1]["chi2"]


# -- declarative rulesets ----------------------------------------------


def test_validate_rules_planted_violations(spark):
    from pydala2_spark.functions.dq import validate_rules

    rows = [
        (1, "a", 10.0, "O"),
        (2, None, -5.0, "F"),
        (2, "b", 999.0, "X"),
        (None, "c", None, "O"),
        (3, "dd", 50.0, "P"),
    ]
    df = spark.createDataFrame(rows, "k long, s string, v double, st string")
    rules = [
        {"rule": "not_null", "col": "s"},
        {"rule": "unique", "cols": ["k"]},
        {"rule": "range", "col": "v", "min": 0, "max": 100},
        {"rule": "in_set", "col": "st", "values": ["O", "F", "P"]},
        {"rule": "regex", "col": "s", "pattern": "^[a-c]$"},
        {"rule": "expr", "name": "v_lt_k100", "predicate": "v < k * 100"},
    ]
    got = {
        r["rule"]: (r["n_rows"], r["n_violations"])
        for r in validate_rules(df, rules).collect()
    }
    assert got == {
        "not_null(s)": (5, 1),       # one NULL s
        "unique(k)": (5, 1),         # k=2 twice; NULL k not a duplicate
        "range(v)": (5, 2),          # -5 and 999; NULL v passes
        "in_set(st)": (5, 1),        # X
        "regex(s)": (5, 1),          # "dd"
        "v_lt_k100": (5, 2),         # 999 >= 200, and NULL k -> NOT TRUE
    }


def test_validate_rules_oracle_parity_and_one_scan(spark):
    import duckdb
    import pandas as pd

    from pydala2_spark.functions.dq import rules_oracle_sql, validate_rules

    rows = [(i, f"s{i % 3}", float(i * 7 % 40)) for i in range(50)]
    rows += [(5, "s0", 11.0), (None, None, None)]
    df = spark.createDataFrame(rows, "k long, s string, v double")
    rules = [
        {"rule": "unique", "cols": ["k"]},
        {"rule": "not_null", "col": "s"},
        {"rule": "range", "col": "v", "max": 30},
        {"rule": "regex", "col": "s", "pattern": "^s[01]$"},
    ]
    out = validate_rules(df, rules)
    got = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["k", "s", "v"]))
    want = sorted(
        tuple(r)
        for r in con.execute(rules_oracle_sql("SELECT * FROM t", rules)).fetchall()
    )
    assert got == want
    # one-pass contract: a single scan feeds the whole ruleset
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") <= 1  # createDataFrame: no file scan at all
    import pytest as _pytest

    with _pytest.raises(ValueError):
        validate_rules(df, [])
    with _pytest.raises(ValueError):
        validate_rules(df, [{"rule": "nope", "col": "k"}])
    with _pytest.raises(ValueError):
        validate_rules(df, [{"rule": "range", "col": "v"}])


def test_k_anonymity_report_hand_case(spark):
    from pydala2_spark.functions.dq import k_anonymity_report

    rows = [
        # class (a,1): 3 rows, sensitive {x, y} -> diverse
        ("a", 1, "x"), ("a", 1, "y"), ("a", 1, "x"),
        # class (a,2): 1 row -> below k AND below l
        ("a", 2, "x"),
        # class (b,1): 2 rows, sensitive {z} -> below k and below l
        ("b", 1, "z"), ("b", 1, "z"),
        # class (NULL, 1): NULLs form their own class
        (None, 1, "x"),
    ]
    df = spark.createDataFrame(rows, "q1 string, q2 int, s string")
    got = k_anonymity_report(
        df, ["q1", "q2"], k=3, sensitive_col="s", l=2
    ).collect()[0]
    assert got["n_rows"] == 7 and got["n_classes"] == 4
    assert got["min_class_size"] == 1
    assert got["n_classes_below_k"] == 3  # (a,2), (b,1), (NULL,1)
    assert got["n_rows_below_k"] == 4
    assert got["below_k_pct"] == round(4 * 100.0 / 7, 4)
    assert got["n_classes_below_l"] == 3  # all but (a,1)
    assert got["n_rows_below_l"] == 4
    # without a sensitive column, the l columns are absent
    cols = k_anonymity_report(df, ["q1"], k=3).columns
    assert "n_classes_below_l" not in cols
    import pytest as _pytest

    with _pytest.raises(ValueError):
        k_anonymity_report(df, [], k=3)
    with _pytest.raises(ValueError):
        k_anonymity_report(df, ["q1"], k=1)


def test_corr_matrix_matches_numpy(spark):
    """corr_matrix() vs numpy.corrcoef on a deterministic frame —
    every unordered pair present once, values equal at the rounding
    grain; constant columns yield NULL (0/0), not a crash."""
    import numpy as np

    from pydala2_spark.functions.dq import corr_matrix

    n = 200
    x = np.arange(n, dtype=float)
    data = {
        "a": x,
        "b": 3.0 * x + 1.0,                      # corr(a,b) = 1
        "c": -x + 0.25 * ((x * 7919) % 13),      # strong negative
        "d": ((x * 104729) % 17).astype(float),  # ~uncorrelated
    }
    rows = list(zip(*(data[c].tolist() for c in "abcd")))
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    got = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in corr_matrix(df, ["a", "b", "c", "d"]).collect()
    }
    assert len(got) == 6
    m = np.corrcoef(np.vstack([data[c] for c in "abcd"]))
    cols = "abcd"
    for i, a in enumerate(cols):
        for j in range(i + 1, 4):
            assert got[(a, cols[j])] == round(float(m[i, j]), 6), (a, cols[j])
    # constant column: zero variance -> NULL corr, no exception
    df2 = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 2.0), (3.0, 2.0)], "a double, k double"
    )
    [r] = corr_matrix(df2, ["a", "k"]).collect()
    assert r["corr"] is None


def test_corr_matrix_guards():
    import pytest

    from pydala2_spark.functions.dq import corr_matrix

    with pytest.raises(ValueError):
        corr_matrix(None, ["a"])


def test_categorical_mutual_info_exact(spark):
    """MI/entropies vs hand math on a frame with known structure:
    independent columns give MI ~ 0; a deterministic copy gives
    MI = H(x) = H(y) and mi_norm = 1."""
    import math

    from pydala2_spark.functions.dq import categorical_mutual_info

    # x uniform over 2, y uniform over 2, independent by construction
    rows = [(str(i % 2), str((i // 2) % 2)) for i in range(400)]
    df = spark.createDataFrame(rows, "x string, y string")
    [r] = categorical_mutual_info(df, "x", "y").collect()
    ln2 = round(math.log(2.0), 4)
    assert (r["n_rows"], r["h_x"], r["h_y"]) == (400, ln2, ln2)
    assert abs(r["mi"]) < 1e-9
    # y a bijection of x: MI = H
    rows2 = [(str(i % 3), str((i % 3) * 7)) for i in range(300)]
    df2 = spark.createDataFrame(rows2, "x string, y string")
    [r2] = categorical_mutual_info(df2, "x", "y").collect()
    ln3 = round(math.log(3.0), 4)
    assert (r2["h_x"], r2["h_y"], r2["mi"], r2["mi_norm"]) == (
        ln3, ln3, ln3, 1.0,
    )


def test_ks_two_sample_matches_manual(spark):
    """KS D statistic vs a hand-rolled ECDF computation (exact, with
    ties across samples); p vs the same Numerical-Recipes series in
    Python; disjoint samples give D = 1 and p ~ 0."""
    import math

    from pydala2_spark.functions.dq import ks_two_sample

    a = [float(((i * 31) % 17) - 8) / 4.0 for i in range(60)]
    b = [float(((i * 37) % 23) - 8) / 4.0 for i in range(45)]
    rows = [("a", v) for v in a] + [("b", v) for v in b] + [("c", 99.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    [r] = ks_two_sample(df, "v", "g", "a", "b").collect()
    assert (r["n_1"], r["n_2"]) == (60, 45)  # group c excluded
    n1, n2 = len(a), len(b)
    xs = sorted(set(a) | set(b))
    best = 0
    c1 = c2 = 0
    for x in xs:
        c1 += sum(1 for v in a if v == x)
        c2 += sum(1 for v in b if v == x)
        best = max(best, abs(c1 * n2 - c2 * n1))
    d = best / (n1 * n2)
    assert r["d_stat"] == round(d, 6)
    en = n1 * n2 / (n1 + n2)
    lam = (math.sqrt(en) + 0.12 + 0.11 / math.sqrt(en)) * d
    assert r["ks_lambda"] == round(lam, 4)
    p = 2.0 * sum(
        round((1.0 if j % 2 == 1 else -1.0)
              * math.exp(float(-2 * j * j) * (lam * lam)), 12)
        for j in range(1, 51)
    )
    assert r["p_value"] == round(min(1.0, max(0.0, p)), 6)
    # disjoint supports -> D = 1
    df2 = spark.createDataFrame(
        [("a", float(i)) for i in range(20)]
        + [("b", 100.0 + i) for i in range(20)],
        "g string, v double",
    )
    [r2] = ks_two_sample(df2, "v", "g", "a", "b").collect()
    assert r2["d_stat"] == 1.0 and r2["p_value"] < 1e-6


def test_chi2_independence_exact(spark):
    """Chi-square vs hand math: independent uniform columns give
    chi2 = 0 and V = 0; a bijection of x gives the maximal
    chi2 = N*(k-1) and Cramer's V = 1."""
    from pydala2_spark.functions.dq import chi2_independence

    rows = [(str(i % 2), str((i // 2) % 3)) for i in range(600)]
    df = spark.createDataFrame(rows, "x string, y string")
    [r] = chi2_independence(df, "x", "y").collect()
    assert (r["n_rows"], r["card_x"], r["card_y"], r["dof"]) == (600, 2, 3, 2)
    # round-12 term residue keeps chi2 at rounded 0.0; V may carry a
    # ~1e-6 sqrt-amplified echo of it
    assert r["chi2"] == 0.0 and r["cramers_v"] <= 1e-5
    # y = f(x) bijection: perfect association
    rows2 = [(str(i % 3), str((i % 3) * 7)) for i in range(300)]
    df2 = spark.createDataFrame(rows2, "x string, y string")
    [r2] = chi2_independence(df2, "x", "y").collect()
    assert (r2["dof"], r2["chi2"], r2["cramers_v"]) == (4, 600.0, 1.0)
    # 2x2 with known counts: chi2 by the textbook formula
    rows3 = [("a", "p")] * 30 + [("a", "q")] * 10 + [("b", "p")] * 20 + [("b", "q")] * 40
    df3 = spark.createDataFrame(rows3, "x string, y string")
    [r3] = chi2_independence(df3, "x", "y").collect()
    # chi2 = N (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d))
    n, a, b, c, d = 100, 30, 10, 20, 40
    exp = n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
    # output rounds chi2 to 4 digits, V to 6
    assert r3["chi2"] == round(exp, 4)
    assert abs(r3["cramers_v"] - (exp / n) ** 0.5) < 1e-6
