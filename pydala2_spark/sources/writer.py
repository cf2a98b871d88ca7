"""Writer — normalization pipeline + physical parquet/csv/json write.

Capability parity with the reference's ``Writer.prepare`` /
``Writer.write_to_dataset`` (`/root/reference/pydala/io.py:125-523,
533-664`): normalize the input family, cast to a target schema, sort,
dedup, derive date-part partition columns, then write hive-partitioned
zstd parquet with bounded file sizes.

Spark-first realization:
- input families → ``spark.createDataFrame`` (Arrow path) + ``unionByName``
  for list-of-batches;
- sort before write → ``sortWithinPartitions`` (no global shuffle; files
  are locally ordered, which is what row-group min/max pruning wants);
- ``max_rows_per_file`` → ``spark.sql.files.maxRecordsPerFile`` option;
- overwrite of partitioned data → dynamic partition overwrite (only the
  partitions present in the batch are replaced), the job-level analogue
  of the reference's write-new-then-delete-old (`pydala/dataset.py:995-1003`).

At 100 TB the same code holds: the write is a distributed job, file
sizing is per-task, and derived date-part partition columns give
partition pruning on every later time-ranged query.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pydala2_spark.functions.dateparts import DATEPART_EXPRS, with_datepart_columns
from pydala2_spark.functions.sortspec import SortSpec, to_sort_columns

DEFAULT_MAX_ROWS_PER_FILE = 10_000_000  # reference default, pydala/dataset.py:886
DEFAULT_COMPRESSION = "zstd"  # reference default, pydala/dataset.py:888


def to_spark_df(spark: SparkSession, data: Any) -> DataFrame:
    """Normalize the reference's accepted input families to a DataFrame.

    Accepted (`pydala/dataset.py:865-882`, `pydala/io.py:114-122`):
    Spark DataFrame, pandas DataFrame, pyarrow Table/RecordBatch/
    RecordBatchReader, list/tuple of any of those (= one logical batch).
    """
    import pandas as pd
    import pyarrow as pa

    if isinstance(data, DataFrame):
        return data
    if isinstance(data, (list, tuple)):
        parts = [to_spark_df(spark, d) for d in data]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out
    if isinstance(data, pa.RecordBatchReader):
        data = data.read_all()
    if isinstance(data, pa.RecordBatch):
        data = pa.Table.from_batches([data])
    if isinstance(data, pa.Table):
        # normalize large_string/large_binary like the reference
        # (`pydala/schema.py:14`, applied at io.py:344) — Spark's Arrow
        # schema conversion folds them; carrying the schema explicitly
        # also keeps empty batches typed (no inference on zero rows).
        from pyspark.sql.pandas.types import from_arrow_schema

        schema = from_arrow_schema(data.schema)
        return spark.createDataFrame(data.to_pandas(), schema=schema)
    if isinstance(data, pd.DataFrame):
        return spark.createDataFrame(data)
    for attr in ("to_arrow", "to_arrow_table", "arrow"):  # polars / duckdb relations
        if hasattr(data, attr):
            return to_spark_df(spark, getattr(data, attr)())
    if hasattr(data, "collect"):  # polars LazyFrame
        return to_spark_df(spark, data.collect())
    raise TypeError(f"unsupported input type: {type(data)!r}")


def cast_to_schema(
    df: DataFrame,
    target: T.StructType,
    alter_schema: bool = False,
) -> DataFrame:
    """Conform ``df`` to ``target``: missing columns become typed nulls,
    extra columns are dropped unless ``alter_schema``, matching columns
    are cast (`pydala/schema.py:230-293` semantics)."""
    existing = {f.name: f for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in existing:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    if alter_schema:
        for f in df.schema.fields:
            if f.name not in {t.name for t in target.fields}:
                cols.append(F.col(f.name))
    return df.select(*cols)


class Writer:
    def __init__(self, spark: SparkSession, path: str, format: str = "parquet") -> None:
        self.spark = spark
        self.path = str(path)
        self.format = format

    # -- prepare: the normalization pipeline -----------------------------

    def prepare(
        self,
        data: Any,
        schema: T.StructType | None = None,
        alter_schema: bool = False,
        sort_by: SortSpec = None,
        unique: bool | list[str] = False,
        partition_by: list[str] | None = None,
        timestamp_column: str | None = None,
        ts_unit: str | None = None,  # accepted for API parity; Spark is µs-native
    ) -> tuple[DataFrame, list[str] | None]:
        """Run the reference's prepare pipeline order
        (`pydala/io.py:381-437`): normalize → cast schema → derive
        date-part partition columns → dedup → (sort applied at write).
        Returns (df, partition_columns)."""
        df = to_spark_df(self.spark, data)

        if schema is not None:
            df = cast_to_schema(df, schema, alter_schema=alter_schema)

        partition_cols: list[str] | None = None
        if partition_by:
            partition_cols = list(partition_by)
            missing = [c for c in partition_cols if c not in df.columns]
            derivable = [c for c in missing if c in DATEPART_EXPRS]
            if derivable:
                if not timestamp_column:
                    ts_fields = [
                        f.name
                        for f in df.schema.fields
                        if f.dataType.typeName().startswith("timestamp")
                    ]
                    if not ts_fields:
                        raise ValueError(
                            f"cannot derive partition columns {derivable} without a timestamp column"
                        )
                    timestamp_column = ts_fields[0]
                df = with_datepart_columns(df, timestamp_column, derivable)
            still_missing = [c for c in partition_cols if c not in df.columns]
            if still_missing:
                raise ValueError(f"partition columns not in data: {still_missing}")

        if unique:
            subset = unique if isinstance(unique, list) else None
            df = df.dropDuplicates(subset) if subset else df.dropDuplicates()

        return df, partition_cols

    # -- execute: the physical write -------------------------------------

    def write(
        self,
        data: Any,
        mode: str = "append",
        schema: T.StructType | None = None,
        alter_schema: bool = False,
        sort_by: SortSpec = None,
        unique: bool | list[str] = False,
        partition_by: list[str] | None = None,
        timestamp_column: str | None = None,
        max_rows_per_file: int = DEFAULT_MAX_ROWS_PER_FILE,
        compression: str = DEFAULT_COMPRESSION,
        target_file_count: int | None = None,
        bloom_filter_columns: list[str] | None = None,
        bloom_filter_ndv: "int | dict[str, int] | None" = None,
        **_: Any,
    ) -> None:
        if mode not in ("append", "overwrite", "error", "ignore"):
            raise ValueError(f"invalid write mode {mode!r}")
        df, partition_cols = self.prepare(
            data,
            schema=schema,
            alter_schema=alter_schema,
            sort_by=sort_by,
            unique=unique,
            partition_by=partition_by,
            timestamp_column=timestamp_column,
        )
        if target_file_count:
            df = (
                df.repartition(target_file_count, *partition_cols)
                if partition_cols
                else df.repartition(target_file_count)
            )
        if sort_by:
            # local order inside each output file → tight row-group
            # min/max stats for later pruning; no global shuffle.
            df = df.sortWithinPartitions(*to_sort_columns(sort_by))

        def build(target_mode: str):
            w = (
                df.write.format(self.format)
                .mode(target_mode)
                .option("maxRecordsPerFile", str(max_rows_per_file))
            )
            if self.format == "parquet":
                w = w.option("compression", compression)
                # NATIVE parquet bloom filters: written into each
                # row group's metadata, so ANY parquet reader (Spark,
                # DuckDB, Trino) prunes row groups on point lookups —
                # the in-file complement to plans/bloom.py's per-FILE
                # sidecars (those skip whole files without opening
                # them; these skip row groups inside opened files).
                # expected.ndv sizes the filter (default 1M NDV writes
                # ~1 MiB per column per row group — pass the real
                # cardinality to shrink it ~NDV/1M-fold)
                for c in bloom_filter_columns or []:
                    w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
                    ndv = (
                        bloom_filter_ndv.get(c)
                        if isinstance(bloom_filter_ndv, dict)
                        else bloom_filter_ndv
                    )
                    if ndv:
                        w = w.option(
                            f"parquet.bloom.filter.expected.ndv#{c}", str(int(ndv))
                        )
            if self.format == "csv":
                w = w.option("header", "true")
            if partition_cols:
                w = w.partitionBy(*partition_cols)
            return w

        # Retry policy (reference retries dataset writes x2,
        # `pydala/io.py:624-664`), made IDEMPOTENT per mode:
        # - overwrite: re-running is a full replace → one retry;
        # - ignore: retried ONLY if the path pre-existed (then the
        #   retry's no-op is the correct outcome anyway). If the path
        #   did NOT pre-exist, the failed first attempt itself created
        #   it (the committer mkdirs the target), so SaveMode.Ignore
        #   would see "exists" and silently no-op — reporting success
        #   with no (or partial) data. Re-raise instead;
        # - error: never retried — after a failed first attempt the
        #   path may exist, and the retry would bury the real error
        #   under path-already-exists;
        # - append: staged (below) — a naive re-run after a partial
        #   commit would double-append.
        from pyspark.errors import AnalysisException

        from pydala2_spark.plans.fs import path_exists

        if mode != "append":
            pre_existing = mode == "ignore" and path_exists(self.spark, self.path)
            try:
                build(mode).save(self.path)
            except AnalysisException:
                raise  # deterministic (schema/path) — retrying can't help
            except Exception:
                if mode == "error":
                    raise
                if mode == "ignore" and not pre_existing:
                    raise
                build(mode).save(self.path)
            return

        self._append_staged(build)

    execute = write

    def _append_staged(self, build) -> None:
        """Append = write to a hidden staging dir, then publish by
        renaming files into place.

        The job commit and every publish step are rename-based, so a
        first attempt that dies mid-write leaves data only under
        ``_staging_*`` (readers skip ``_``-prefixed paths) and the
        retry re-runs against a clean slate — no double-append, the
        failure mode of the naive save-again retry. If the PUBLISH
        itself dies partway, PartialWriteError carries what moved and
        where the rest still lives (reference contract,
        `pydala/io.py:41-55`).
        """
        import uuid

        from pydala2_spark.errors import PartialWriteError
        from pydala2_spark.plans.fs import delete_paths, list_files, mkdirs, rename

        spark = self.spark
        token = uuid.uuid4().hex[:12]
        staging = f"{self.path.rstrip('/')}/_staging_{token}"
        for attempt in (1, 2):
            try:
                build("error").save(staging)
                break
            except Exception:
                delete_paths(spark, [staging])
                if attempt == 2:
                    raise
        published: list[str] = []
        sep = f"/_staging_{token}/"
        try:
            for f in list_files(spark, staging):
                rel = f.split(sep, 1)[1]
                dst = f"{self.path.rstrip('/')}/{rel}"
                if "/" in rel:
                    mkdirs(spark, dst.rsplit("/", 1)[0])
                if not rename(spark, f, dst):
                    raise IOError(f"rename failed: {f} -> {dst}")
                published.append(dst)
        except Exception as e:
            raise PartialWriteError(
                f"append to {self.path!r} failed during publish: {e}",
                files=published,
                staging_dir=staging,
            ) from e
        delete_paths(spark, [staging])


# -- bucketed write (co-located joins) --------------------------------


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str] | str,
    num_buckets: int = 32,
    path: str | None = None,
    sort_by: SortSpec = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) table so later
    equi-joins / aggregations on ``bucket_by`` skip their shuffle.

    The reference has no co-location concept — every pydala join pays
    DuckDB's hash repartition each run. Bucketing is the Spark-native
    amortization: pay one shuffle at write time, then every join
    between two tables bucketed on the same key with the same bucket
    count is exchange-free (and sort-free if ``sort_by`` covers the
    join key). At 100 TB this is the difference between re-shuffling
    the fact table per query and never shuffling it.

    Bucketing metadata lives in the session catalog, so reads must go
    through ``spark.table(table)`` — reading the parquet path directly
    loses the bucket spec. ``path`` makes it an external table (data
    survives catalog loss; re-register with the same spec to restore
    co-location).
    """
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.format(format).mode(mode).bucketBy(num_buckets, *cols)
    w = w.sortBy(*to_sort_columns_names(sort_by) if sort_by else cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def to_sort_columns_names(sort_by: SortSpec) -> list[str]:
    """Column names only (bucket sortBy takes names, not expressions)."""
    if isinstance(sort_by, str):
        return [s.strip().split()[0] for s in sort_by.split(",")]
    return [s if isinstance(s, str) else s[0] for s in sort_by]
