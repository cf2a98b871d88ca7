"""HyperLogLog + Count-Min sketch contracts: accuracy envelopes,
exact-side correctness, guarantee directions, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pydala2_spark.functions.sketch import (
    cms_build,
    cms_estimate,
    hll_count_distinct,
)


def test_hll_estimate_accuracy_and_exact_side(spark):
    """5000 distinct values per group: the p=7 estimate lands inside
    the ~3 sigma envelope (sigma ~ 1.04/sqrt(128) ~ 9.2%), and the
    piggybacked exact count is exactly right."""
    df = spark.range(10000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") / 2).cast("long").alias("v"),  # 5000 distinct per group
    )
    out = {r["g"]: r.asDict() for r in
           hll_count_distinct(df, "g", "v", p=7).collect()}
    for g in ("0", "1"):
        assert out[g]["exact_distinct"] == 5000
        assert abs(out[g]["hll_estimate"] - 5000) / 5000 < 0.28
        assert out[g]["n_registers_hit"] == 128  # far past coupon collection


def test_hll_linear_counting_small_range(spark):
    """Tiny cardinality takes the linear-counting branch and is nearly
    exact there (classic HLL behavior below 2.5*m)."""
    df = spark.range(40).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    row = hll_count_distinct(df, "g", "v", p=7).collect()[0]
    assert row["exact_distinct"] == 40
    assert abs(row["hll_estimate"] - 40) <= 6

    with pytest.raises(ValueError, match="p must be"):
        hll_count_distinct(df, "g", "v", p=3)


def test_hll_plan_two_exchanges_no_join(spark):
    df = spark.range(100).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    plan = (
        hll_count_distinct(df, "g", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_cms_overestimates_never_under(spark):
    """est >= true for every probed item (the Count-Min guarantee is
    one-sided), and with width >> distinct items collisions are absent
    so est == true."""
    rows = [(v,) for v in [1] * 50 + [2] * 30 + [3] * 20 + list(range(10, 40))]
    df = spark.createDataFrame(rows, "user_id long")
    truth = {1: 50, 2: 30, 3: 20, **{v: 1 for v in range(10, 40)}}

    narrow = cms_build(df, "user_id", depth=3, width=8)
    items = spark.createDataFrame([(k,) for k in truth], "user_id long")
    est_n = {
        r["user_id"]: r["cms_estimate"]
        for r in cms_estimate(narrow, items, "user_id", width=8).collect()
    }
    assert all(est_n[k] >= v for k, v in truth.items())
    # total inserted mass bounds any single estimate
    n_total = sum(truth.values())
    assert all(est_n[k] <= n_total for k in truth)

    wide = cms_build(df, "user_id", depth=3, width=4096)
    est_w = {
        r["user_id"]: r["cms_estimate"]
        for r in cms_estimate(wide, items, "user_id", width=4096).collect()
    }
    assert est_w == truth  # no collisions at this width

    # unseen item estimates 0 (left-join coalesce path) unless it
    # collides; width 4096 with 33 occupied buckets makes 0 the
    # overwhelmingly likely outcome — assert the bound only
    ghost = spark.createDataFrame([(999999,)], "user_id long")
    g = cms_estimate(wide, ghost, "user_id", width=4096).collect()[0]
    assert 0 <= g["cms_estimate"] <= 1

    with pytest.raises(ValueError, match="depth"):
        cms_build(df, "user_id", depth=0)


def test_cms_counter_table_bounded_and_mergeable(spark):
    """The counter table never exceeds depth*width rows, and counters
    built on disjoint halves merge by addition into the full sketch."""
    df = spark.range(1000).select("id", (F.col("id") % 97).alias("user_id"))
    c = cms_build(df, "user_id", depth=3, width=16)
    assert c.count() <= 3 * 16

    h1 = cms_build(df.filter("id % 2 = 0"), "user_id", depth=3, width=16)
    h2 = cms_build(df.filter("id % 2 = 1"), "user_id", depth=3, width=16)
    merged = (
        h1.unionByName(h2)
        .groupBy("row_id", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = {(r["row_id"], r["bucket"]): r["cnt"] for r in c.collect()}
    got = {(r["row_id"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert got == full


def test_hll_registers_merge_and_estimate_equal_single_pass(spark):
    """Register frames from overlapping halves merge (groupBy max)
    into exactly the full-corpus state; the folded estimate equals
    hll_count_distinct bit-for-bit."""
    from pydala2_spark.functions.sketch import (
        hll_estimate_from_registers,
        hll_registers,
    )

    df = spark.range(4000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 1700).alias("v"),
    )
    h1 = hll_registers(df.filter("id < 2500"), "g", "v", p=7)   # overlap
    h2 = hll_registers(df.filter("id >= 1500"), "g", "v", p=7)  # with h1
    merged = (
        h1.unionByName(h2).groupBy("g", "idx").agg(F.max("r").alias("r"))
    )
    full = hll_registers(df, "g", "v", p=7)
    assert (
        {tuple(r) for r in merged.collect()} == {tuple(r) for r in full.collect()}
    )

    from pydala2_spark.functions.sketch import hll_count_distinct

    est_m = {r["g"]: r["hll_estimate"] for r in
             hll_estimate_from_registers(merged, "g", p=7).collect()}
    est_s = {r["g"]: r["hll_estimate"] for r in
             hll_count_distinct(df, "g", "v", p=7).collect()}
    assert est_m == est_s


def test_hash_split_matches_python_reference(spark):
    """The md5-derived 60-bit hash, register index, and rho chain agree
    with an independent pure-Python computation over random values —
    the cross-engine portability contract the oracles rest on."""
    import hashlib
    import random

    from pydala2_spark.functions.sketch import hash60, leading_zero_rank

    rng = random.Random(99)
    vals = [str(rng.randint(-10**12, 10**12)) for _ in range(300)]
    vals += ["", "0", "-1", "a" * 500, "é中"]

    p, m, bits = 7, 128, 53
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        r["v"]: (r["h"], r["idx"], r["rho"])
        for r in df.select(
            "v",
            hash60(F.col("v")).alias("h"),
            hash60(F.col("v")).bitwiseAND(m - 1).alias("idx"),
            leading_zero_rank(
                F.shiftright(hash60(F.col("v")), p), bits
            ).alias("rho"),
        ).collect()
    }
    for v in vals:
        h = int(hashlib.md5(v.encode("utf-8")).hexdigest()[:15], 16)
        rem = h >> p
        rho = (bits - rem.bit_length() + 1) if rem else bits + 1
        assert got[v] == (h, h & (m - 1), rho), v


def test_cms_bucket_matches_python_reference(spark):
    """cms_bucket's md5-salted bucket assignment agrees with the
    driver-side computation bm25/CMS probes rely on."""
    import hashlib
    import random

    from pydala2_spark.functions.sketch import cms_bucket

    rng = random.Random(5)
    vals = [rng.randint(-10**9, 10**9) for _ in range(200)]
    width = 512
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r["v"]: [r["b0"], r["b1"], r["b2"]]
        for r in df.select(
            "v",
            *[
                cms_bucket(F.lit(j), F.col("v"), width).alias(f"b{j}")
                for j in range(3)
            ],
        ).collect()
    }
    for v in vals:
        want = [
            int(hashlib.md5(f"cms{j}:{v}".encode()).hexdigest()[:8], 16) % width
            for j in range(3)
        ]
        assert got[v] == want, v
