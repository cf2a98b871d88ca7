"""SCD2 (history-keeping) merge: relational core invariants + the
file-selective storage form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pydala2_spark.operators.merge import merge_scd2, scd2_frames


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "k long, val string, valid_from long, valid_to long"
    )


def _src(spark, rows):
    return spark.createDataFrame(rows, "k long, val string")


def test_scd2_new_changed_unchanged(spark):
    h = _hist(spark, [(1, "a", 0, None), (2, "b", 0, None)])
    s = _src(spark, [(1, "a"), (2, "B"), (3, "c")])  # 1 same, 2 changed, 3 new
    out = scd2_frames(h, s, keys=["k"], ts=5).orderBy("k", "valid_from").collect()
    got = [(r["k"], r["val"], r["valid_from"], r["valid_to"]) for r in out]
    assert got == [
        (1, "a", 0, None),  # unchanged: untouched
        (2, "b", 0, 5),  # closed, historic value preserved
        (2, "B", 5, None),  # new version
        (3, "c", 5, None),  # new key
    ]


def test_scd2_invariants_after_two_batches(spark):
    h = _hist(spark, [(i, f"v{i}", 0, None) for i in range(20)])
    s1 = _src(spark, [(i, f"w{i}") for i in range(0, 20, 2)])  # evens change
    h1 = scd2_frames(h, s1, keys=["k"], ts=1)
    s2 = _src(spark, [(i, f"x{i}") for i in range(0, 20, 3)])  # thirds change
    h2 = scd2_frames(h1, s2, keys=["k"], ts=2).cache()
    try:
        # exactly one open row per key
        opens = (
            h2.filter(F.col("valid_to").isNull()).groupBy("k").count().collect()
        )
        assert all(r["count"] == 1 for r in opens)
        assert len(opens) == 20
        # validity intervals don't overlap per key: close ts == next open ts
        rows = h2.orderBy("k", "valid_from").collect()
        by_key: dict = {}
        for r in rows:
            by_key.setdefault(r["k"], []).append(r)
        for k, vs in by_key.items():
            for a, b in zip(vs, vs[1:]):
                assert a["valid_to"] == b["valid_from"]
            assert vs[-1]["valid_to"] is None
        # key 6 (changed in both batches) has 3 versions
        assert len(by_key[6]) == 3
        assert [v["val"] for v in by_key[6]] == ["v6", "w6", "x6"]
        # key 3 changed only in batch 2
        assert [v["val"] for v in by_key[3]] == ["v3", "x3"]
        # key 7 never changed
        assert [v["val"] for v in by_key[7]] == ["v7"]
    finally:
        h2.unpersist()


def test_scd2_null_safe_keys_and_values(spark):
    h = _hist(spark, [(None, "a", 0, None)])
    # same null key, same value → no change
    out = scd2_frames(h, _src(spark, [(None, "a")]), keys=["k"], ts=1).collect()
    assert len(out) == 1 and out[0]["valid_to"] is None
    # null key, changed value → close + reopen (null == null for identity)
    out2 = (
        scd2_frames(h, _src(spark, [(None, None)]), keys=["k"], ts=1)
        .orderBy("valid_from")
        .collect()
    )
    assert [(r["val"], r["valid_from"], r["valid_to"]) for r in out2] == [
        ("a", 0, 1),
        (None, 1, None),
    ]


def test_scd2_duplicate_source_keys_last_wins(spark):
    h = _hist(spark, [(1, "a", 0, None)])
    s = _src(spark, [(1, "first"), (1, "last")])
    out = scd2_frames(h, s, keys=["k"], ts=1).orderBy("valid_from").collect()
    assert [r["val"] for r in out] == ["a", "last"]


def test_merge_scd2_storage_form(spark, tmp_ds_path):
    # bootstrap on a missing target
    r0 = merge_scd2(
        spark, tmp_ds_path, _src(spark, [(1, "a"), (2, "b")]), ["k"], ts=0
    )
    assert r0.inserted == 2
    # batch: change key 2, add key 3
    r1 = merge_scd2(
        spark, tmp_ds_path, _src(spark, [(1, "a"), (2, "B"), (3, "c")]), ["k"], ts=1
    )
    got = (
        spark.read.parquet(tmp_ds_path)
        .orderBy("k", "valid_from")
        .collect()
    )
    assert [(r["k"], r["val"], r["valid_from"], r["valid_to"]) for r in got] == [
        (1, "a", 0, None),
        (2, "b", 0, 1),
        (2, "B", 1, None),
        (3, "c", 1, None),
    ]
    # the closed row is an update (rewrite), the two new versions inserts
    assert r1.updated == 1 and r1.inserted == 2


def test_merge_scd2_file_selective(spark, tmp_ds_path):
    # two files; only the one holding the changed key's open row rewrites
    h = spark.createDataFrame(
        [(1, "a", 0, None), (2, "b", 0, None)],
        "k long, val string, valid_from long, valid_to long",
    )
    h.repartition(2, "k").write.parquet(tmp_ds_path)
    from pydala2_spark.plans.fs import list_files

    before = set(list_files(spark, tmp_ds_path))
    assert len(before) == 2
    res = merge_scd2(spark, tmp_ds_path, _src(spark, [(2, "B")]), ["k"], ts=1)
    preserved = set(res.preserved_files)
    # at least one pre-existing file untouched (the one without key 2)
    assert preserved & before
    out = spark.read.parquet(tmp_ds_path).orderBy("k", "valid_from").collect()
    assert [(r["k"], r["val"], r["valid_to"]) for r in out] == [
        (1, "a", None),
        (2, "b", 1),
        (2, "B", None),
    ]


def test_scd2_rejects_bad_columns(spark):
    h = _hist(spark, [(1, "a", 0, None)])
    with pytest.raises(ValueError):
        scd2_frames(h, _src(spark, [(1, "a")]), keys=["missing"], ts=1)


# -- PCA (lives here to reuse the module session without a new file) --


def test_pca_matches_numpy(spark):
    import numpy as np

    from pydala2_spark.operators.similarity import pca_fit, pca_project

    rng = np.random.default_rng(11)
    # anisotropic cloud: two dominant directions in 8-d
    base = rng.normal(size=(300, 8))
    base[:, 0] *= 5.0
    base[:, 1] *= 2.5
    rows = [(i, [float(x) for x in base[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    model = pca_fit(df, k=3, dim=8)

    # numpy reference on the SAME float32-truncated data
    x = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    cov = np.cov(x, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    top = np.argsort(evals)[::-1][:3]
    np.testing.assert_allclose(
        model["explained_variance"], evals[top], rtol=1e-8
    )
    for c, idx in enumerate(top):
        got = np.array(model["components"][c])
        want = evecs[:, idx]
        # eigenvectors match up to sign
        assert min(np.abs(got - want).max(), np.abs(got + want).max()) < 1e-8

    # projection equals centered dot with the components
    proj = pca_project(df, model).select("vec_id", "pc1", "pc2", "pc3").collect()
    centered = x - x.mean(axis=0)
    want_proj = centered @ np.array(model["components"]).T
    got_proj = np.array(
        [[r["pc1"], r["pc2"], r["pc3"]] for r in sorted(proj, key=lambda r: r["vec_id"])]
    )
    np.testing.assert_allclose(got_proj, want_proj, atol=1e-8)
    # variance ordering: pc1 captures the planted dominant axis
    assert model["explained_variance"][0] > model["explained_variance"][1]


def test_pca_projection_stays_scan_stage(spark):
    from pydala2_spark.operators.similarity import pca_fit, pca_project

    df = spark.createDataFrame(
        [(i, [float(i), float(-i), 1.0, 0.0]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    model = pca_fit(df, k=2, dim=4)
    plan = pca_project(df, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # projection is shuffle-free
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pca_validates_inputs(spark):
    from pydala2_spark.operators.similarity import pca_fit

    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        pca_fit(df, k=3, dim=2)
    with pytest.raises(ValueError):
        pca_fit(df.limit(0), k=1, dim=2)


def test_scd2_explicit_tracked_carries_untracked_forward(spark):
    """tracked narrower than the history's attributes: untracked
    columns never trigger a change and carry forward into the new
    version (NULL for brand-new keys)."""
    h = spark.createDataFrame(
        [(1, "a", "m1", 0, None), (2, "b", "m2", 0, None)],
        "k long, val string, memo string, valid_from long, valid_to long",
    )
    s = _src(spark, [(1, "A"), (3, "c")])  # 1 changes, 3 new; 2 untouched
    out = (
        scd2_frames(h, s, keys=["k"], ts=1, tracked=["val"])
        .orderBy("k", "valid_from")
        .collect()
    )
    got = [(r["k"], r["val"], r["memo"], r["valid_from"], r["valid_to"]) for r in out]
    assert got == [
        (1, "a", "m1", 0, 1),
        (1, "A", "m1", 1, None),  # memo carried forward
        (2, "b", "m2", 0, None),
        (3, "c", None, 1, None),  # new key: no memo to inherit
    ]
