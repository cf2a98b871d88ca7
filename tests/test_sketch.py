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


def test_hll_ignores_nulls_like_count_distinct(spark):
    """ADVICE r7: NULL values must not mint a NULL register row —
    estimates and exact counts over a frame WITH NULLs equal the
    NULL-free frame exactly (countDistinct semantics)."""
    from pydala2_spark.functions.sketch import hll_registers

    clean = spark.range(600).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") / 2).cast("long").alias("v"),
    )
    dirty = clean.unionAll(
        spark.range(40).select(
            (F.col("id") % 2).cast("string").alias("g"),
            F.lit(None).cast("long").alias("v"),
        )
    )
    a = {r["g"]: r.asDict() for r in hll_count_distinct(clean, "g", "v").collect()}
    b = {r["g"]: r.asDict() for r in hll_count_distinct(dirty, "g", "v").collect()}
    assert a == b
    ra = sorted(map(tuple, hll_registers(clean, "g", "v").collect()))
    rb = sorted(map(tuple, hll_registers(dirty, "g", "v").collect()))
    assert ra == rb and all(r[1] is not None for r in ra)


def test_cms_width_stamp_carried_and_validated(spark):
    """ADVICE r7: cms_build stamps its geometry into the counter
    frame; cms_estimate defaults to the stamp and REFUSES a
    conflicting explicit width (probing the wrong modulus can return
    estimates below the true count)."""
    df = spark.range(300).select((F.col("id") % 7).cast("string").alias("v"))
    counters = cms_build(df, "v", depth=3, width=32)
    md = counters.schema["bucket"].metadata
    assert md["cms_width"] == 32 and md["cms_depth"] == 3

    items = df.select("v").distinct()
    # stamped default: no width argument needed
    est = {r["v"]: r["cms_estimate"]
           for r in cms_estimate(counters, items, "v").collect()}
    truth = {r["v"]: r["n"]
             for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(est[v] >= truth[v] for v in truth)

    with pytest.raises(ValueError, match="width mismatch"):
        cms_estimate(counters, items, "v", width=64)

    # un-stamped counters (e.g. a raw state-store read) need an
    # explicit width; matching explicit width on stamped counters is fine
    bare = counters.select(F.col("row_id"), F.col("bucket").cast("long"), "cnt")
    with pytest.raises(ValueError, match="no cms_width stamp"):
        cms_estimate(bare.withColumn("bucket", F.col("bucket")), items, "v")
    ok = cms_estimate(counters, items, "v", width=32)
    assert ok.count() == len(truth)


def test_profile_dataframe_microsecond_timestamps(spark):
    """ADVICE r7: timestamps differing only sub-second must count as
    DISTINCT, and min/max keep the fraction (epoch seconds, µs-exact)."""
    from pydala2_spark.functions.schema_tools import profile_dataframe

    df = spark.sql(
        """SELECT * FROM VALUES
             (TIMESTAMP '2021-01-01 00:00:00.000001'),
             (TIMESTAMP '2021-01-01 00:00:00.000002'),
             (TIMESTAMP '2021-01-01 00:00:00.500000')
           AS t(ts)"""
    )
    row = profile_dataframe(df).collect()[0]
    assert row["n_distinct"] == 3  # was 1 under whole-second epochs
    assert row["min_num"] == 1609459200.000001
    assert row["max_num"] == 1609459200.5


def test_cms_estimate_requires_bucket_column(spark):
    """ADVICE r8: a frame without 'bucket' is not a counter table —
    refuse immediately with a clear error, never fall through to a
    later AnalysisException in the join."""
    df = spark.range(10).selectExpr("id AS user_id")
    not_counters = spark.range(3).selectExpr("id AS row_id", "id AS cnt")
    with pytest.raises(ValueError, match=r"lacks column\(s\) \['bucket'\]"):
        cms_estimate(not_counters, df, "user_id", width=16)


def test_cms_mixed_depth_merge_degrades_safely(spark):
    """ADVICE r8: the stamp rides the FIRST union child, so a mixed-
    depth merge carries a depth-2 stamp over 4 hash rows. The probe
    list is range(stamped_depth) by construction (row j's hash is
    depth-independent), so the deeper frame's extra rows are ignored
    and the Count-Min >= truth guarantee HOLDS on the merged counts:
    both sketches counted every row, so each estimate must be >= 2x
    the true per-value count."""
    df = spark.range(200).selectExpr("(id % 7) AS user_id")
    d2 = cms_build(df, "user_id", depth=2, width=16)
    d4 = cms_build(df, "user_id", depth=4, width=16)
    merged = (
        d2.unionByName(d4)
        .groupBy("row_id", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    items = df.distinct()
    true = {r["user_id"]: r["n"] for r in
            df.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    est = {r["user_id"]: r["cms_estimate"] for r in
           cms_estimate(merged, items, "user_id").collect()}
    assert set(est) == set(true)
    for u, n in true.items():
        assert est[u] >= 2 * n  # both sketches counted every row

    # an UNSTAMPED frame (metadata stripped by an expression select)
    # discovers its hash rows from data: all 4 rows probed, same bound
    bare = merged.selectExpr("row_id", "bucket", "cnt")
    est2 = {r["user_id"]: r["cms_estimate"] for r in
            cms_estimate(bare, items, "user_id", width=16).collect()}
    for u, n in true.items():
        assert est2[u] >= 2 * n


def test_kmv_mergeability_and_estimates(spark):
    """KMV contracts: (1) bottom-k of a union is recoverable from the
    per-set bottom-k states alone (the mergeability that makes stored
    day-sketches answer overlap questions); (2) the estimator is exact
    below k and within ~3/sqrt(k) relative error above it."""
    from pydala2_spark.functions.sketch import (
        hash60,
        kmv_bottom_k,
        kmv_estimate_expr,
    )

    a = spark.range(0, 3000).selectExpr("CAST(id AS STRING) AS v")
    b = spark.range(2000, 6000).selectExpr("CAST(id AS STRING) AS v")
    ha = a.select(hash60(F.col("v")).alias("h")).distinct()
    hb = b.select(hash60(F.col("v")).alias("h")).distinct()
    K = 64
    # mergeability: bottom-k(U) == bottom-k(bottom-k(A) ∪ bottom-k(B))
    full_u = kmv_bottom_k(ha.union(hb).distinct(), K).collect()
    merged = kmv_bottom_k(
        kmv_bottom_k(ha, K).union(kmv_bottom_k(hb, K)).distinct(), K
    ).collect()
    assert sorted(r["h"] for r in full_u) == sorted(r["h"] for r in merged)

    # estimator accuracy (6000 distinct in the union, k=64)
    state = kmv_bottom_k(ha.union(hb).distinct(), K)
    row = (
        state.agg(F.max("h").alias("hk"))
        .crossJoin(ha.union(hb).distinct().agg(F.count("*").alias("nd")))
        .select(kmv_estimate_expr("nd", "hk", K).alias("est"), "nd")
        .first()
    )
    assert abs(row["est"] - row["nd"]) / row["nd"] < 3 / (K ** 0.5)

    # exact-below-k branch
    tiny = spark.range(10).selectExpr("CAST(id AS STRING) AS v")
    ht = tiny.select(hash60(F.col("v")).alias("h")).distinct()
    r = (
        kmv_bottom_k(ht, K)
        .agg(F.max("h").alias("hk"))
        .crossJoin(ht.agg(F.count("*").alias("nd")))
        .select(kmv_estimate_expr("nd", "hk", K).alias("est"))
        .first()
    )
    assert r["est"] == 10.0

    with pytest.raises(ValueError, match="k must be"):
        kmv_bottom_k(ht, 1)


def test_cms_explicit_depth_for_unstamped_frames(spark):
    """An unstamped frame probed with an explicit depth gets the same
    zero-pass probe list as a stamped one; a depth that disagrees with
    an existing stamp refuses."""
    df = spark.range(300).selectExpr("(id % 11) AS user_id")
    c = cms_build(df, "user_id", depth=3, width=32)
    bare = c.selectExpr("row_id", "bucket", "cnt")  # stamp stripped
    items = df.distinct()
    true = {r["user_id"]: r["n"] for r in
            df.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    est = {r["user_id"]: r["cms_estimate"] for r in
           cms_estimate(bare, items, "user_id", width=32, depth=3).collect()}
    assert all(est[u] >= n for u, n in true.items())
    with pytest.raises(ValueError, match="depth mismatch"):
        cms_estimate(c, items, "user_id", depth=4)


def test_kmv_grouped_matches_ungrouped_per_group(spark):
    """The salted two-stage per-group bottom-k must return EXACTLY the
    per-group bottom-k (same rows as running kmv_bottom_k on each
    group separately), and the grouped estimates must be within
    ~3/sqrt(k) for large groups and exact for small ones."""
    from pydala2_spark.functions.sketch import (
        hash60,
        kmv_bottom_k,
        kmv_bottom_k_grouped,
        kmv_grouped_estimates,
    )

    # group 'big': 4000 distinct values; group 'small': 20
    rows = [("big", f"b{i}") for i in range(4000)] + [
        ("small", f"s{i}") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    hs = df.select("g", hash60(F.col("v")).alias("h")).distinct()
    K = 64
    states = kmv_bottom_k_grouped(hs, "g", k=K, salt=8)
    for g in ("big", "small"):
        expect = sorted(
            r["h"] for r in kmv_bottom_k(hs.filter(F.col("g") == g), K).collect()
        )
        got = sorted(
            r["h"] for r in states.filter(F.col("g") == g).collect()
        )
        assert got == expect, g
    exact = hs.groupBy("g").agg(F.count("*").alias("nd"))
    est = {r["g"]: r["kmv_estimate"] for r in
           kmv_grouped_estimates(states, exact, "g", k=K).collect()}
    assert est["small"] == 20.0
    assert abs(est["big"] - 4000) / 4000 < 3 / (K ** 0.5)

    with pytest.raises(ValueError, match="salt"):
        kmv_bottom_k_grouped(hs, "g", k=K, salt=0)


def test_sample_sketch_merge_equals_oneshot_and_quantiles(spark):
    """Uniform-sample quantile sketch contracts: (1) merging per-slice
    states (union + re-bottom-k) equals the one-shot sketch EXACTLY —
    the state is a pure function of the row set; (2) discrete quantiles
    off the sample track the true quantiles; (3) the discrete extractor
    is exactly right when the 'sample' is the whole group."""
    from pydala2_spark.functions.sketch import (
        discrete_quantiles,
        merge_sample_states,
        sample_bottom_k_grouped,
    )

    df = spark.range(4000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").alias("k_"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    one = sample_bottom_k_grouped(df, "g", "k_", "v", k=64)
    halves = [df.filter(F.col("id") < 2000), df.filter(F.col("id") >= 2000)]
    states = [sample_bottom_k_grouped(h, "g", "k_", "v", k=64) for h in halves]
    merged = merge_sample_states(states, "g", k=64)
    key = lambda r: (r["g"], r["h"], r["__key"])
    assert sorted(map(key, one.collect())) == sorted(map(key, merged.collect()))

    # sampled-quantile accuracy: values are uniform 0..999, so p50 ~ 500
    est = {
        r["g"]: r
        for r in discrete_quantiles(
            one, "g", "__val", "__key", {"p50": 0.5, "p90": 0.9}
        ).collect()
    }
    for g in ("0", "1"):
        assert est[g]["n"] == 64
        assert abs(est[g]["p50"] - 500) < 200  # ~1/sqrt(64) envelope
        assert abs(est[g]["p90"] - 900) < 200

    # exact extractor: full group, brute-force expectations
    full = discrete_quantiles(
        df.select("g", F.col("k_"), F.col("v")),
        "g",
        "v",
        "k_",
        {"p0": 0.0, "p50": 0.5, "p100": 1.0},
    ).collect()
    import math

    vals = {
        g: sorted(float((i * 2 + int(g)) % 1000) for i in range(2000))
        for g in ("0", "1")
    }
    for r in full:
        ref = vals[r["g"]]
        assert r["n"] == 2000
        for name, q in (("p0", 0.0), ("p50", 0.5), ("p100", 1.0)):
            assert r[name] == ref[math.floor((2000 - 1) * q)]


def test_sample_sketch_null_keys_dropped_and_guards(spark):
    from pydala2_spark.functions.sketch import (
        merge_sample_states,
        sample_bottom_k_grouped,
    )

    df = spark.createDataFrame(
        [("a", None, 1.0), ("a", 1, 2.0), ("a", 2, 3.0)],
        "g string, k_ long, v double",
    )
    out = sample_bottom_k_grouped(df, "g", "k_", "v", k=8).collect()
    assert len(out) == 2  # NULL-keyed row cannot be permuted -> dropped
    with pytest.raises(ValueError, match="k must be"):
        sample_bottom_k_grouped(df, "g", "k_", "v", k=1)
    with pytest.raises(ValueError, match="at least one state"):
        merge_sample_states([], "g", k=8)


def test_cms_inner_product_join_size(spark):
    """Inner-product estimator contracts: >= the true join size
    always; equals it exactly when the width is large enough that
    buckets don't collide; geometry guards refuse mismatched or
    unstamped frames."""
    from pydala2_spark.functions.sketch import cms_build, cms_inner_product

    # skewed frequencies: key k appears k times in A, (11-k) in B
    a = spark.createDataFrame(
        [(k,) for k in range(1, 11) for _ in range(k)], "v long"
    )
    b = spark.createDataFrame(
        [(k,) for k in range(1, 11) for _ in range(11 - k)], "v long"
    )
    true_ip = sum(k * (11 - k) for k in range(1, 11))
    assert a.join(b, "v").count() == true_ip

    est_wide = cms_inner_product(
        cms_build(a, "v", depth=3, width=4096),
        cms_build(b, "v", depth=3, width=4096),
    ).first()["inner_product_est"]
    assert est_wide == true_ip  # 10 keys, 4096 buckets: no collisions

    est_tight = cms_inner_product(
        cms_build(a, "v", depth=3, width=4),
        cms_build(b, "v", depth=3, width=4),
    ).first()["inner_product_est"]
    assert est_tight >= true_ip  # collisions only ADD

    with pytest.raises(ValueError, match="geometry mismatch"):
        cms_inner_product(
            cms_build(a, "v", depth=3, width=64),
            cms_build(b, "v", depth=3, width=128),
        )
    with pytest.raises(ValueError, match="disagrees with"):
        cms_inner_product(
            cms_build(a, "v", depth=3, width=64),
            cms_build(b, "v", depth=3, width=64),
            width=128,
        )
    # unstamped frames need an explicit width
    ca = cms_build(a, "v", depth=3, width=64).selectExpr(
        "row_id", "bucket + 0 AS bucket", "cnt"  # drops column metadata
    )
    with pytest.raises(ValueError, match="no width stamp"):
        cms_inner_product(ca, ca)
    r = cms_inner_product(ca, ca, width=64).first()["inner_product_est"]
    assert r >= sum(k * k for k in range(1, 11))
