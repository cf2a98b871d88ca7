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
        asof_join(left, right, on="t", direction="sideways")
    with pytest.raises(ValueError, match="must exist"):
        asof_join(left, right.drop("t"), on="t")


def test_nearest_and_tolerance(spark, sides):
    left, right = sides
    # nearest: l20 is 2 from r18 (backward) and absent forward -> r18;
    # l15 is 30-15=15 forward only -> r30; l5 has no k=3 rows -> null
    out = {r["lval"]: (r["t_right"], r["rval_right"])
           for r in asof_join(left, right, on="t", by="k",
                              direction="nearest").collect()}
    assert out["l10"] == (10, "r10")
    assert out["l20"] == (18, "r18")
    assert out["l15"] == (30, "r30")
    assert out["l5"] == (None, None)
    # equidistant resolves BACKWARD (deterministic rule)
    l2 = spark.createDataFrame([(1, 20, "mid")], "k long, t long, lval string")
    r2 = spark.createDataFrame(
        [(1, 15, "lo"), (1, 25, "hi")], "k long, t long, rval string"
    )
    row = asof_join(l2, r2, on="t", by="k", direction="nearest").collect()[0]
    assert (row["t_right"], row["rval_right"]) == (15, "lo")
    # tolerance: l15's only match is 15 away; tolerance 10 nulls it,
    # 15 keeps it (inclusive bound), and backward matches null too
    out = {r["lval"]: r["rval_right"]
           for r in asof_join(left, right, on="t", by="k",
                              direction="nearest", tolerance=10).collect()}
    assert out["l15"] is None and out["l20"] == "r18"
    out = {r["lval"]: r["rval_right"]
           for r in asof_join(left, right, on="t", by="k",
                              direction="nearest", tolerance=15).collect()}
    assert out["l15"] == "r30"
    out = {r["lval"]: r["rval_right"]
           for r in asof_join(left, right, on="t", by="k",
                              direction="backward", tolerance=1).collect()}
    assert out == {"l10": "r10", "l20": None, "l15": None, "l5": None}


def test_nearest_matches_bruteforce(spark):
    """Random frames: nearest/tolerance agree with an O(n*m) python
    reference under the documented tie rule (equidistant -> backward),
    and the plan carries exactly ONE shuffle exchange (the second
    window ordering reuses the hash partitioning)."""
    import random

    rng = random.Random(42)
    lrows = [(rng.randrange(3), rng.randrange(100), f"l{i}") for i in range(60)]
    rrows = [(rng.randrange(3), rng.randrange(100), f"r{i}") for i in range(40)]
    # de-dup right (k, t) so the match target is unique per instant
    seen = {}
    for k, t, v in rrows:
        seen[(k, t)] = v
    rrows = [(k, t, v) for (k, t), v in sorted(seen.items())]
    left = spark.createDataFrame(lrows, "k long, t long, lval string")
    right = spark.createDataFrame(rrows, "k long, t long, rval string")

    def brute(tol):
        exp = {}
        for k, t, v in lrows:
            cands = [(rt, rv) for rk, rt, rv in rrows if rk == k
                     and (tol is None or abs(rt - t) <= tol)]
            if not cands:
                exp[v] = None
                continue
            best = min(cands, key=lambda c: (abs(c[0] - t), c[0] > t))
            exp[v] = best[1]
        return exp

    for tol in (None, 7, 0):
        got = {r["lval"]: r["rval_right"]
               for r in asof_join(left, right, on="t", by="k",
                                  direction="nearest", tolerance=tol).collect()}
        assert got == brute(tol), tol
    plan = asof_join(left, right, on="t", by="k", direction="nearest")._jdf.queryExecution().executedPlan().toString()
    import re as _re
    n_exchanges = len(_re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchanges <= 2  # one per input union branch, same key
