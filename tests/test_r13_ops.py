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
