"""as-of join contracts (operators/asof.py)."""

from __future__ import annotations

import pytest

from pydala2_spark.operators.asof import asof_join


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [(1, 10, "l10"), (1, 20, "l20"), (2, 15, "l15"), (3, 5, "l5")],
        "k long, t long, lval string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 18, "r18"), (2, 30, "r30")],
        "k long, t long, rval string",
    )
    return left, right


def test_backward_inclusive(spark, sides):
    left, right = sides
    out = {r["lval"]: (r["t_right"], r["rval_right"])
           for r in asof_join(left, right, on="t", by="k").collect()}
    assert out["l10"] == (10, "r10")   # tie matches (inclusive)
    assert out["l20"] == (18, "r18")   # most recent prior
    assert out["l15"] == (None, None)  # right row is later -> no match
    assert out["l5"] == (None, None)   # no right rows for k=3


def test_forward(spark, sides):
    left, right = sides
    out = {r["lval"]: (r["t_right"], r["rval_right"])
           for r in asof_join(left, right, on="t", by="k", direction="forward").collect()}
    assert out["l10"] == (10, "r10")   # inclusive tie
    assert out["l20"] == (None, None)  # nothing after 20
    assert out["l15"] == (30, "r30")   # next following


def test_no_by_key(spark):
    left = spark.createDataFrame([(100, "a"), (200, "b")], "t long, lval string")
    right = spark.createDataFrame([(150, "x")], "t long, rval string")
    out = {r["lval"]: r["rval_right"] for r in asof_join(left, right, on="t").collect()}
    assert out == {"a": None, "b": "x"}


def test_rejects_bad_args(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="t", direction="nearest")
    with pytest.raises(ValueError, match="must exist"):
        asof_join(left, right.drop("t"), on="t")
