"""The local oracle mirror must be strictly STRICTER than the driver.

Round 3 shipped two oracles whose DuckDB ``sum()``/``//`` widened to
HUGEINT; every value matched but the driver's type-sensitive hash
failed while the old stringify-only mirror passed. These tests pin the
mirror's new type checks so that class of green-local/red-driver gap
stays closed.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb

_SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
_spec = importlib.util.spec_from_file_location(
    "check_correctness", os.path.join(_SCRIPTS, "check_correctness.py")
)
cc = importlib.util.module_from_spec(_spec)
sys.modules["check_correctness"] = cc
_spec.loader.exec_module(cc)


def test_banned_types_flags_hugeint_decimal_timestamp():
    cols = ["a", "b", "c", "d"]
    types = ["BIGINT", "HUGEINT", "DECIMAL(38,2)", "TIMESTAMP"]
    bad = cc.banned_types(cols, types, cc._BANNED_DUCK)
    assert bad == ["b:HUGEINT", "c:DECIMAL(38,2)", "d:TIMESTAMP"]


def test_duckdb_integer_sum_widens_to_hugeint_and_is_banned():
    # the exact round-3 failure mechanism: sum() over integers
    con = duckdb.connect()
    rel = con.sql("SELECT sum(i) AS s, i // 3 AS q FROM range(10) t(i) GROUP BY q")
    types = [str(t) for t in rel.types]
    assert cc.banned_types(list(rel.columns), types, cc._BANNED_DUCK), types
    # and the documented fix clears it
    rel2 = con.sql(
        "SELECT CAST(sum(i) AS BIGINT) AS s, CAST(i // 3 AS BIGINT) AS q "
        "FROM range(10) t(i) GROUP BY q"
    )
    types2 = [str(t) for t in rel2.types]
    assert not cc.banned_types(list(rel2.columns), types2, cc._BANNED_DUCK), types2


def test_type_class_grain():
    assert cc.type_class("bigint") == cc.type_class("INTEGER") == "int"
    assert cc.type_class("double") == cc.type_class("FLOAT") == "float"
    assert cc.type_class("string") == cc.type_class("VARCHAR") == "str"
    assert cc.type_class("double") != cc.type_class("bigint")


def test_canon_floats_exact_not_6g():
    # %.6g would collapse these; exact repr must not
    a, b = 0.1234567890123, 0.1234567890999
    assert f"{a:.6g}" == f"{b:.6g}"
    assert cc.canon(a) != cc.canon(b)
    # integers-as-floats no longer collapse to int strings
    assert cc.canon(2.0) == "2.0"
    assert cc.canon(float("nan")) == "NaN"
    assert cc.canon(None) == "NULL"
    assert cc.canon(True) == "1"
