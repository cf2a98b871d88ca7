"""Dataset facade contracts (reference: tests/test_dataset_lifecycle.py,
tests/test_table.py — behavior parity, not a port)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from pydala2_spark import CSVDataset, Dataset, JSONDataset
from tests.conftest import make_simple_pdf


def test_write_read_roundtrip(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.write(make_simple_pdf(10))
    assert ds.count_rows() == 10
    assert set(ds.columns) == {"id", "name", "value", "timestamp"}


def test_append_accumulates(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.write(make_simple_pdf(10, seed=0))
    ds.write(make_simple_pdf(5, seed=10))
    assert ds.count_rows() == 15


def test_overwrite_replaces(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.write(make_simple_pdf(10))
    ds.write(make_simple_pdf(3), mode="overwrite")
    assert ds.count_rows() == 3


def test_filter_sql_string(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.write(make_simple_pdf(10))
    assert ds.filter("value > 5.0").count() == 6  # values 6,7.5,9,10.5,12,13.5
    assert ds.filter("id IN (1, 3)").count() == 2
    assert ds.filter("id > 0 AND name = 'row_3'").count() == 1


def test_partitioned_write_and_pruning(spark, tmp_ds_path):
    pdf = pd.DataFrame(
        {
            "id": range(100),
            "category": [["A", "B", "C"][i % 3] for i in range(100)],
            "value": [i * 2 for i in range(100)],
        }
    )
    ds = Dataset(tmp_ds_path, spark)
    ds.write(pdf, partition_by=["category"])
    assert ds.partition_names() == ["category"]
    assert ds.partitions().count() == 3
    out = ds.filter("category IN ('A','B') AND value > 50")
    assert out.count() == len(pdf[(pdf.category.isin(["A", "B"])) & (pdf.value > 50)])
    # partition pruning visible in the physical plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "category" in plan


def test_list_input_is_one_batch(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.write([make_simple_pdf(5, seed=0), pa.table(make_simple_pdf(5, seed=5))])
    assert ds.count_rows() == 10


def test_sort_and_distinct(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.write([make_simple_pdf(5), make_simple_pdf(5)])  # duplicated rows
    assert ds.distinct().count() == 5
    top = ds.sort("value desc").limit(1).collect()
    assert top[0]["value"] == 6.0


def test_unique_write_dedups(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.write([make_simple_pdf(5), make_simple_pdf(5)], unique=True)
    assert ds.count_rows() == 5


def test_datepart_partition_derivation(spark, tmp_ds_path):
    pdf = pd.DataFrame(
        {
            "event_ts": pd.to_datetime(["2024-01-05", "2024-02-10", "2024-03-15"]),
            "metric": [1.0, 2.0, 3.0],
        }
    )
    ds = Dataset(tmp_ds_path, spark)
    ds.write(pdf, partition_by=["year", "month"], timestamp_column="event_ts")
    assert sorted(ds.partition_names()) == ["month", "year"]
    assert ds.partitions().count() == 3
    assert ds.filter("month = 2").count() == 1


def test_sql_on_dataset(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark, name="simple")
    ds.write(make_simple_pdf(10))
    out = ds.sql("SELECT count(*) AS n FROM simple WHERE value > 5.0").collect()
    assert out[0]["n"] == 6


def test_exports(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.write(make_simple_pdf(5))
    assert len(ds.to_pandas()) == 5
    assert ds.to_arrow().num_rows == 5
    con = ds.to_duckdb()
    assert con.sql(f"SELECT count(*) FROM {ds.name}").fetchone()[0] == 5


def test_vacuum(spark, tmp_ds_path):
    ds = Dataset(tmp_ds_path, spark)
    ds.write(make_simple_pdf(5))
    ds.vacuum()
    assert not ds.exists


def test_csv_dataset(spark, tmp_path):
    p = str(tmp_path / "csv_ds")
    ds = CSVDataset(p, spark)
    ds.write(make_simple_pdf(5).drop(columns=["timestamp"]))
    ds.clear_cache()
    assert ds.count_rows() == 5
    assert ds.filter("value > 5.0").count() == 1


def test_json_dataset(spark, tmp_path):
    p = str(tmp_path / "json_ds")
    ds = JSONDataset(p, spark)
    ds.write(make_simple_pdf(5).drop(columns=["timestamp"]))
    ds.clear_cache()
    assert ds.count_rows() == 5


def test_orc_dataset_roundtrip_filter_partition(spark, tmp_path):
    """ORC is a built-in Spark source: the full Dataset surface —
    append, overwrite, SQL-string filter, hive partitioning — works
    through the same verbs as parquet."""
    from pydala2_spark import ORCDataset

    p = str(tmp_path / "orc_ds")
    ds = ORCDataset(p, spark)
    ds.write(make_simple_pdf(10, seed=0))
    ds.write(make_simple_pdf(5, seed=10))
    assert ds.count_rows() == 15
    assert ds.filter("value > 5.0 AND id < 10").count() == 6

    # partitioned overwrite + partition-column rehydration
    pdf = make_simple_pdf(12)
    pdf["bucket"] = [f"b{i % 3}" for i in range(12)]
    p2 = str(tmp_path / "orc_part")
    ds2 = ORCDataset(p2, spark, partitioning=["bucket"])
    ds2.write(pdf, mode="overwrite")
    got = ds2.filter("bucket = 'b1'")
    assert got.count() == 4
    assert "bucket" in got.columns


def test_avro_dataset_gated_by_classpath(spark, tmp_path):
    """Avro is an external Spark module; without the jar the dataset
    raises the actionable hint (not Spark's generic lookup error).
    With the jar present the same round-trip as CSV/JSON must work."""
    from pydala2_spark import AvroDataset

    p = str(tmp_path / "avro_ds")
    ds = AvroDataset(p, spark)
    if AvroDataset.available(spark):
        ds.write(make_simple_pdf(5).drop(columns=["timestamp"]))
        ds.clear_cache()
        assert ds.count_rows() == 5
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            ds.write(make_simple_pdf(5).drop(columns=["timestamp"]))
        with pytest.raises(RuntimeError, match="spark-avro"):
            ds.load()


def test_reference_dropin_surface(spark, tmp_ds_path):
    """Reference method-name parity: the verbs a pydala2 user calls by
    name resolve and behave (`pydala/dataset.py:420-777, 2193`)."""
    from pydala2_spark import Dataset

    ds = Dataset(tmp_ds_path, spark)
    assert ds.has_files is False and ds.is_loaded is False
    spark.createDataFrame(make_simple_pdf(12)).write.partitionBy().parquet(tmp_ds_path)
    ds = Dataset(tmp_ds_path, spark)
    assert ds.has_files is True
    assert ds.num_rows == 12
    assert ds.t.count() == 12 and ds.is_loaded
    assert ds.load_files() == ds.files()
    assert ds.partition_values == {}  # unpartitioned
    ds.register("dropin_t")
    assert "dropin_t" in ds.registered_tables()
    # specific-file delete removes exactly that file's rows
    victim = ds.files()[0]
    ds.delete_files(victim)
    assert ds.num_rows < 12 or len(ds.files()) < 1
