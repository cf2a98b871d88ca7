"""Bucketed-write co-location: joins on the bucket key need no shuffle."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    from pydala2_spark.sources.writer import write_bucketed

    base = tmp_path_factory.mktemp("bucketed")
    facts = spark.createDataFrame(
        pd.DataFrame({"k": [i % 97 for i in range(5000)], "v": range(5000)})
    )
    dims = spark.createDataFrame(
        pd.DataFrame({"k": list(range(97)), "name": [f"k{i}" for i in range(97)]})
    )
    write_bucketed(facts, "b_facts", "k", num_buckets=8, path=str(base / "facts"))
    write_bucketed(dims, "b_dims", "k", num_buckets=8, path=str(base / "dims"))
    yield "b_facts", "b_dims"
    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_dims")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ft, dt = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ft).join(spark.table(dt), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_has_no_exchange(spark, bucketed_pair):
    ft, _ = bucketed_pair
    agg = spark.table(ft).groupBy("k").agg(F.sum("v").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_join_result_matches_plain(spark, bucketed_pair):
    ft, dt = bucketed_pair
    bucketed = spark.table(ft).join(spark.table(dt), "k")
    plain = (
        spark.table(ft).withColumnRenamed("k", "k2").join(
            spark.table(dt), F.col("k2") == F.col("k")
        ).select("k", "v", "name")
    )
    assert sorted(map(tuple, bucketed.select("k", "v", "name").collect())) == sorted(
        map(tuple, plain.collect())
    )
