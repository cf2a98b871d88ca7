"""Distributed logistic regression vs a from-scratch numpy reference
(same full-batch GD, same iterations — results must agree closely) and
separation/scoring contracts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pydala2_spark.operators.classify import logreg_fit, logreg_score


def _cloud(seed=3, n=400, d=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    true_w = np.array([2.0, -1.5, 0.5])
    z = x @ true_w + 0.3
    p = 1 / (1 + np.exp(-z))
    y = (rng.random(n) < p).astype(float)
    return x, y


def _numpy_fit(x, y, iters, lr, standardize=True):
    n, d = x.shape
    if standardize:
        m, s = x.mean(axis=0), x.std(axis=0)
        s[s == 0] = 1.0
        xs = (x - m) / s
    else:
        m, s = np.zeros(d), np.ones(d)
        xs = x
    w, b = np.zeros(d), 0.0
    for _ in range(iters):
        r = 1 / (1 + np.exp(-(xs @ w + b))) - y
        gw = xs.T @ r / n
        gb = r.mean()
        w -= lr * gw
        b -= lr * gb
    return w / s, b - float((w * m / s).sum())


def test_logreg_matches_numpy_reference(spark):
    x, y = _cloud()
    rows = [tuple(map(float, x[i])) + (float(y[i]),) for i in range(len(y))]
    df = spark.createDataFrame(rows, "f1 double, f2 double, f3 double, y double")

    model = logreg_fit(df, ["f1", "f2", "f3"], "y", iters=15, lr=0.5)
    w_ref, b_ref = _numpy_fit(x, y, iters=15, lr=0.5)

    np.testing.assert_allclose(model["weights"], w_ref, rtol=1e-6, atol=1e-8)
    assert abs(model["bias"] - b_ref) < 1e-6

    # probabilities equal the numpy model's
    scored = logreg_score(df, model).select("f1", "f2", "f3", "score").collect()
    for r in scored[:50]:
        z = np.dot([r["f1"], r["f2"], r["f3"]], w_ref) + b_ref
        assert abs(r["score"] - 1 / (1 + np.exp(-z))) < 1e-6


def test_logreg_separates_planted_classes(spark):
    # cleanly separable: positives have feature >> negatives
    rows = [(float(i % 7) + 10.0, 1.0) for i in range(100)] + [
        (float(i % 7) - 10.0, 0.0) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "f double, y double")
    # 35 iters: margin 0.91/0.09 vs the 0.9/0.1 gates (numpy sweep
    # r15) — one Spark job per GD iteration, so fewer iters = faster
    # suite at identical contract strength
    model = logreg_fit(df, ["f"], "y", iters=35, lr=1.0)
    scored = logreg_score(df, model)
    pos = scored.filter(F.col("y") == 1.0).agg(F.min("score")).first()[0]
    neg = scored.filter(F.col("y") == 0.0).agg(F.max("score")).first()[0]
    assert pos > 0.9 and neg < 0.1


def test_logreg_score_plan_is_scan_stage(spark):
    df = spark.createDataFrame([(1.0, 0.0)], "f double, y double")
    model = logreg_fit(df.union(df.select(F.lit(2.0), F.lit(1.0))), ["f"], "y", iters=2)
    plan = logreg_score(df, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_logreg_validates(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "f double, y double")
    with pytest.raises(ValueError):
        logreg_fit(df, [], "y")
    with pytest.raises(ValueError):
        logreg_fit(df, ["f"], "y", iters=0)
    with pytest.raises(ValueError):
        logreg_fit(df.limit(0), ["f"], "y")


# -- text normalization (scan-stage expressions) ----------------------


def test_normalize_text_matches_python_reference(spark):
    import re

    from pydala2_spark.functions.text import normalize_text

    samples = [
        "Hello​ “world” — it’s\x07 fine…  ",
        "  multi   space\tand\nnewlines ",
        "plain ascii stays",
        "‘quoted’ – dashed − minus",
        "nbsp\u00a0and\u2009thin\u3000ideographic",  # unicode whitespace
    ]

    def ref(s):
        s = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F​‌‍﻿]", "", s)
        table = {"‘": "'", "’": "'", "‚": "'", "“": '"',
                 "”": '"', "„": '"', "–": "-", "—": "-",
                 "−": "-"}
        s = "".join(table.get(ch, ch) for ch in s)
        s = s.replace("…", "...")
        s = re.sub(r"\s+", " ", s).strip()
        return s

    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got = [r["n"] for r in df.select(normalize_text().alias("n")).collect()]
    assert got == [ref(s) for s in samples]


def test_normalize_text_is_scan_stage(spark):
    from pydala2_spark.functions.text import normalize_text

    df = spark.createDataFrame([("x",)], "text string")
    plan = (
        df.select(normalize_text(lowercase=True).alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_normalize_text_nfc_matches_unicodedata(spark):
    """nfc=True must equal unicodedata.normalize('NFC', …) composed
    with the expression steps — checked against decomposed accents,
    Hangul jamo, singleton mappings, and already-composed text."""
    import re
    import unicodedata

    from pydala2_spark.functions.text import normalize_text

    samples = [
        "cafe\u0301 o\u0308wns",  # e+combining-acute -> \u00e9, o+combining-diaeresis -> \u00f6
        "\u1100\u1161\u11a8",  # Hangul jamo -> \uac01
        "A\u030angstrom",  # A+combining-ring -> \u00c5
        "caf\u00e9 already composed",
        "\ufb01ligature stays",  # NFC does NOT decompose ligatures
        "mix \u201csmart\u201d \u2014 \u00e9\u0301",  # combining on composed + punct steps
        "",
    ]

    def ref(s):
        s = unicodedata.normalize("NFC", s)
        s = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F​‌‍﻿]", "", s)
        table = {"‘": "'", "’": "'", "‚": "'", "“": '"',
                 "”": '"', "„": '"', "–": "-", "—": "-",
                 "−": "-"}
        s = "".join(table.get(ch, ch) for ch in s)
        s = s.replace("…", "...")
        s = re.sub(r"\s+", " ", s).strip()
        return s

    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got = [r["n"] for r in df.select(normalize_text(nfc=True).alias("n")).collect()]
    assert got == [ref(s) for s in samples]
    # null passes through as null
    nrow = (
        spark.createDataFrame([(None,)], "text string")
        .select(normalize_text(nfc=True).alias("n"))
        .first()
    )
    assert nrow["n"] is None
    # and the DEFAULT path still carries no Python stage
    plan = (
        df.select(normalize_text().alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_normalize_text_nfc_fuzz_random_unicode(spark):
    """Fuzz: 300 random unicode strings (BMP letters, combining marks,
    Hangul jamo, punctuation, odd whitespace) through nfc=True must
    equal the python reference on every one — a single Spark job over
    the whole sample."""
    import random
    import re
    import unicodedata

    from pydala2_spark.functions.text import normalize_text

    rnd = random.Random(17)
    pools = [
        list(range(0x41, 0x7B)),  # ascii letters + some punct
        list(range(0xC0, 0x180)),  # latin-1/-A precomposed
        list(range(0x300, 0x370)),  # combining marks
        list(range(0x1100, 0x1160)) + list(range(0x1161, 0x11A8)),  # jamo
        [0x20, 0xA0, 0x2009, 0x3000, 0x200B],  # whitespace/zero-width
        [0x2018, 0x2019, 0x201C, 0x201D, 0x2013, 0x2014, 0x2026],
    ]
    samples = []
    for _ in range(300):
        n = rnd.randint(0, 24)
        s = "".join(
            chr(rnd.choice(rnd.choice(pools))) for _ in range(n)
        )
        samples.append(s)

    def ref(s):
        s = unicodedata.normalize("NFC", s)
        s = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F​‌‍﻿]", "", s)
        table = {"‘": "'", "’": "'", "‚": "'", "“": '"',
                 "”": '"', "„": '"', "–": "-", "—": "-",
                 "−": "-"}
        s = "".join(table.get(ch, ch) for ch in s)
        s = s.replace("…", "...")
        s = re.sub(r"\s+", " ", s).strip()
        return s

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, text string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_text(nfc=True).alias("n")).collect()
    }
    bad = [
        (samples[i], got[i], ref(samples[i]))
        for i in range(len(samples))
        if got[i] != ref(samples[i])
    ]
    assert not bad, bad[:3]
