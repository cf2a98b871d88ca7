"""Input-hygiene helper contracts (no Spark session needed)."""

from __future__ import annotations

from datetime import date, datetime

import pytest

from pydala2_spark.functions.safety import (
    check_predicate,
    quote_identifier,
    safe_child_path,
    split_scheme,
    sql_literal,
    valid_partition_name,
    valid_partition_value,
)


def test_quote_identifier():
    assert quote_identifier("my_table") == "`my_table`"
    for bad in ("", "1abc", "a-b", "a b", "a;drop", "a`b"):
        with pytest.raises(ValueError):
            quote_identifier(bad)


def test_sql_literal():
    assert sql_literal(None) == "NULL"
    assert sql_literal(True) == "TRUE"
    assert sql_literal(7) == "7"
    assert sql_literal("o'brien") == "'o''brien'"
    assert sql_literal(date(2024, 1, 2)) == "DATE '2024-01-02'"
    assert sql_literal(datetime(2024, 1, 2, 3, 4, 5)) == "TIMESTAMP '2024-01-02 03:04:05'"


def test_check_predicate():
    assert check_predicate("a > 1 -- drop table x") == "a > 1"
    assert check_predicate("a > 1 /* hidden */ AND b = 2") == "a > 1 AND b = 2"
    assert check_predicate("name = 'o''brien'") == "name = 'o''brien'"
    with pytest.raises(ValueError):
        check_predicate("name = 'unterminated")


def test_partition_validators():
    assert valid_partition_name("year") and valid_partition_name("y-2024_a")
    assert not valid_partition_name("") and not valid_partition_name("a/b")
    assert valid_partition_value(2024) and valid_partition_value("2024-01")
    for bad in ("../x", "a/b", "a\\b", "a\nb"):
        assert not valid_partition_value(bad)


def test_safe_child_path():
    assert safe_child_path("/data/ds", "year=2024", "m=1") == "/data/ds/year=2024/m=1"
    assert safe_child_path("s3a://bkt/ds", "p=1") == "s3a://bkt/ds/p=1"
    assert safe_child_path("/data/ds") == "/data/ds"
    with pytest.raises(ValueError):
        safe_child_path("/data/ds", "../../etc/passwd")
    with pytest.raises(ValueError):
        safe_child_path("/data/ds", "/abs")
    assert split_scheme("hdfs://nn/a") == ("hdfs", "nn/a")
    assert split_scheme("/plain") == (None, "/plain")
