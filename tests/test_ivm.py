"""Incremental view maintenance: maintained state must equal the
from-scratch aggregation of the new table state, bit for bit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pydala2_spark.operators.ivm import apply_changes, rollup_state


def _rows(spark, data):
    return spark.createDataFrame(data, "id long, g string, x double")


def _feed(spark, data):
    return spark.createDataFrame(
        data, "id long, g string, x double, _change_type string"
    )


def _canon(df):
    return {
        tuple(r[c] for c in sorted(df.columns)): None for r in df.collect()
    }.keys()


def test_maintained_equals_recomputed(spark):
    v1 = [(1, "a", 1.5), (2, "a", 2.25), (3, "b", 4.0), (4, None, 8.0)]
    # delete 2; update 3 (b→b, x 4.0→6.0); insert 5 into new group c;
    # update 4 moves it from NULL group to group a
    v2 = [(1, "a", 1.5), (3, "b", 6.0), (4, "a", 8.0), (5, "c", 0.5)]
    feed = [
        (2, "a", 2.25, "delete"),
        (3, "b", 4.0, "update_preimage"),
        (3, "b", 6.0, "update_postimage"),
        (4, None, 8.0, "update_preimage"),
        (4, "a", 8.0, "update_postimage"),
        (5, "c", 0.5, "insert"),
    ]
    state = rollup_state(_rows(spark, v1), ["g"], ["x"])
    got = apply_changes(state, _feed(spark, feed), ["g"], ["x"])
    want = rollup_state(_rows(spark, v2), ["g"], ["x"])
    assert _canon(got) == _canon(want)
    # NULL group reached count 0 and disappeared
    assert not [r for r in got.collect() if r["g"] is None]


def test_groups_vanish_and_appear(spark):
    state = rollup_state(_rows(spark, [(1, "a", 1.0)]), ["g"], ["x"])
    feed = [(1, "a", 1.0, "delete"), (2, "z", 3.0, "insert")]
    got = apply_changes(state, _feed(spark, feed), ["g"], ["x"]).collect()
    assert [(r["g"], r["n"], float(r["sum_x"])) for r in got] == [("z", 1, 3.0)]


def test_bare_update_rows_rejected(spark):
    state = rollup_state(_rows(spark, [(1, "a", 1.0)]), ["g"], ["x"])
    feed = [(1, "a", 2.0, "update")]
    with pytest.raises(Exception, match="update images"):
        apply_changes(state, _feed(spark, feed), ["g"], ["x"]).collect()


def test_cdf_both_images_drives_ivm_end_to_end(spark, tmp_ds_path):
    """SnapshotDataset.changes(update_images='both') feeds
    apply_changes: the maintained rollup equals re-aggregating v2."""
    from pydala2_spark.plans.snapshots import SnapshotDataset

    ds = SnapshotDataset(spark, tmp_ds_path)
    v1 = spark.range(0, 20).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 1.5).alias("x"),
    )
    ds.commit(v1.repartition(3), mode="overwrite")
    v2 = (
        spark.range(5, 25)
        .select(
            F.col("id"),
            (F.col("id") % 3).cast("string").alias("g"),
            F.when(F.col("id") < 10, F.col("id") * 2.0)
            .otherwise(F.col("id") * 1.5)
            .alias("x"),
        )
    )
    ds.commit(v2.repartition(3), mode="overwrite")
    cdf = ds.changes(1, 2, key_cols=["id"], update_images="both")
    # the feed contains both images for ids 5..9 (x changed)
    kinds = {r["_change_type"] for r in cdf.collect()}
    assert {"update_preimage", "update_postimage", "insert", "delete"} <= kinds
    state = rollup_state(ds.read(1), ["g"], ["x"])
    got = apply_changes(state, cdf, ["g"], ["x"])
    want = rollup_state(ds.read(2), ["g"], ["x"])
    assert _canon(got) == _canon(want)


def test_join_rollup_maintenance_equals_recompute(spark):
    """ΔF ⋈ D routing: inserts, deletes, and both-image updates on the
    fact side land the maintained join rollup exactly on the full
    recompute; fact keys missing from the dim contribute nothing."""
    from pyspark.sql import functions as F

    from pydala2_spark.operators.ivm import (
        apply_fact_changes_through_join,
        join_rollup_state,
    )

    fact1 = spark.createDataFrame(
        [(1, 10, 100.0), (2, 10, 50.0), (3, 20, 70.0), (4, 99, 5.0)],
        "ok long, ck long, price double",
    )  # ck=99 has no dim row — excluded by the inner join
    dim = spark.createDataFrame(
        [(10, "A"), (20, "B")], "ck long, seg string"
    )
    state = join_rollup_state(fact1, dim, "ck", ["seg"], ["price"])

    changes = spark.createDataFrame(
        [
            ("insert", 5, 20, 30.0),         # new B fact
            ("delete", 2, 10, 50.0),         # remove an A fact
            ("update_preimage", 1, 10, 100.0),
            ("update_postimage", 1, 10, 110.0),
            ("insert", 6, 98, 1000.0),       # orphan key: no effect
        ],
        "_change_type string, ok long, ck long, price double",
    )
    out = {
        r["seg"]: (r["n"], float(r["sum_price"]))
        for r in apply_fact_changes_through_join(
            state, changes, dim, "ck", ["seg"], ["price"]
        ).collect()
    }
    fact2 = spark.createDataFrame(
        [(1, 10, 110.0), (3, 20, 70.0), (5, 20, 30.0), (6, 98, 1000.0)],
        "ok long, ck long, price double",
    )
    want = {
        r["seg"]: (r["n"], float(r["sum_price"]))
        for r in join_rollup_state(fact2, dim, "ck", ["seg"], ["price"]).collect()
    }
    assert out == want == {"A": (1, 110.0), "B": (2, 100.0)}
