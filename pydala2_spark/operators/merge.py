"""Keyed merge (insert / update / upsert) for path-addressed Parquet datasets.

Capability parity with ``ParquetDataset.merge`` in the reference
(`/root/reference/pydala/dataset.py:1549-1777`; contract frozen by
`/root/reference/tests/test_dataset_merge.py`):

- strategies ``insert`` (new keys only), ``update`` (matched keys only),
  ``upsert`` (both); anything else → ``ValueError``;
- ``key_columns`` explicit, or inferred as the whole source row
  (all source∩target columns); explicitly empty → ``ValueError``;
- **null-safe key equality** (null == null for identity);
- duplicate source keys (within a batch or across a list of batches)
  resolve **last-row-wins**;
- a list input is ONE logical batch, not sequential merges;
- source cast to the target schema (extra source columns dropped unless
  ``alter_schema``); missing columns become typed nulls;
- empty source → typed no-op result;
- partition columns are immutable: an update that would move a key to a
  different partition raises ``ValueError`` before any write;
- selective rewrite: updates rewrite only the physical files holding
  matched keys; untouched files are preserved; inserts append new files.

Spark-first design (NOT the reference's pyarrow/duckdb transport): the
match is a null-safe join (`<=>`); matched-file discovery uses the
``_metadata.file_path`` hidden column so the "which files hold these
keys" probe is itself a distributed join; the rewrite job writes new
files then deletes replaced ones via the Hadoop FileSystem API — the
same code path works on file:// locally and s3a/hdfs on a cluster.
At 100 TB an update touching 0.1% of keys rewrites only the matched
files, not the dataset.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

VALID_STRATEGIES = ("insert", "update", "upsert")

_ORD = "__pydala_ord"
_BATCH = "__pydala_batch"
_FILE = "__pydala_file"

# Above this many matched files, an IN literal built on the driver
# stops being a filter and becomes a multi-megabyte plan string (a
# predicate touching ~10^5 files at 100 TB); switch to a broadcast
# file-list semi-join — same semantics, bounded plan size.
_FILE_LITERAL_LIMIT = 1_000


def _filter_to_files(tagged: DataFrame, files: list[str]) -> DataFrame:
    """Restrict the file-tagged target frame to rows from ``files``.
    Small sets inline as an IN literal (cheap, scan-evaluable); large
    sets join against a broadcast single-column DataFrame so the plan
    stays O(1) in the file count."""
    if len(files) <= _FILE_LITERAL_LIMIT:
        return tagged.filter(F.col(_FILE).isin(files))
    spark = tagged.sparkSession
    flist = spark.createDataFrame([(f,) for f in files], f"`{_FILE}` string")
    return tagged.join(F.broadcast(flist), on=[_FILE], how="left_semi")


@dataclass
class MergeResult:
    """Typed merge outcome (reference: fsspeckit ``MergeResult`` as pinned
    by `tests/test_dataset_merge.py:185-203`)."""

    strategy: str
    source_count: int = 0
    inserted: int = 0
    updated: int = 0
    deleted: int = 0
    target_count_before: int = 0
    target_count_after: int = 0
    rewritten_files: list[str] = field(default_factory=list)
    preserved_files: list[str] = field(default_factory=list)
    inserted_files: list[str] = field(default_factory=list)

    @property
    def files(self) -> list[str]:
        return sorted(set(self.rewritten_files) | set(self.inserted_files))

    @property
    def counts(self) -> dict[str, int]:
        return {
            "inserted": self.inserted,
            "updated": self.updated,
            "deleted": self.deleted,
            "source": self.source_count,
            "target_before": self.target_count_before,
            "target_after": self.target_count_after,
        }


def _normalize_source(spark: SparkSession, source: Any) -> DataFrame:
    """Input families → one DataFrame with a deterministic order column.

    ``_BATCH`` preserves list order; ``_ORD`` (monotonically increasing,
    assigned before any shuffle) preserves row order inside a batch —
    together they define "last row" for last-row-wins dedup.
    """
    from pydala2_spark.sources.writer import to_spark_df

    batches = source if isinstance(source, (list, tuple)) else [source]
    parts = []
    for i, b in enumerate(batches):
        df = to_spark_df(spark, b)
        parts.append(
            df.withColumn(_BATCH, F.lit(i)).withColumn(_ORD, F.monotonically_increasing_id())
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def _dedup_last_wins(source: DataFrame, keys: list[str]) -> DataFrame:
    """Window groups null keys together → dedup is null-safe for free."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(_BATCH).desc(), F.col(_ORD).desc()
    )
    return (
        source.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", _BATCH, _ORD)
    )


# Above this many source rows, skip the broadcast hint and let the
# planner pick a shuffle join: key tuples at ~50 B/row put 2M rows near
# 100 MB — about the largest broadcast a healthy driver should carry.
BROADCAST_ROW_LIMIT = 2_000_000


def _hint_small(df: DataFrame, n_rows: int) -> DataFrame:
    """Broadcast hint gated on a known row count (size-gate per the
    reference's large-batch behavior: small batches broadcast, backfill
    batches shuffle)."""
    return F.broadcast(df) if n_rows <= BROADCAST_ROW_LIMIT else df


def _null_safe_cond(left: DataFrame, right: DataFrame, keys: list[str]):
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else (cond & c)
    return cond


def merge_frames(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    strategy: str = "upsert",
) -> DataFrame:
    """Pure relational core of the merge: combine target and source by
    the reference's key semantics WITHOUT touching storage — null-safe
    key equality, last-row-wins source dedup
    (`pydala/dataset.py:1549-1777`). ``merge`` applies the same
    semantics file-selectively; this form is the oracle-checkable one.

    - ``insert``: target ∪ (source rows whose keys are absent);
    - ``update``: matched target rows replaced by source, unmatched kept;
    - ``upsert``: update + insert.
    """
    if strategy not in VALID_STRATEGIES:
        raise ValueError(f"invalid merge strategy {strategy!r}; choose from {VALID_STRATEGIES}")
    src = source.withColumn(_BATCH, F.lit(0)).withColumn(_ORD, F.monotonically_increasing_id())
    deduped = _dedup_last_wins(src, keys).select(*target.columns)
    if strategy == "insert":
        new_rows = deduped.join(target.select(*keys), on=_null_safe_cond(deduped, target, keys), how="left_anti")
        return target.unionByName(new_rows)
    survivors = target.join(
        deduped.select(*keys), on=_null_safe_cond(target, deduped, keys), how="left_anti"
    )
    if strategy == "update":
        replacements = deduped.join(
            target.select(*keys), on=_null_safe_cond(deduped, target, keys), how="left_semi"
        )
        return survivors.unionByName(replacements)
    return survivors.unionByName(deduped)  # upsert


def _scd2_delta(
    history: DataFrame,
    source: DataFrame,
    keys: list[str],
    ts,
    tracked: list[str],
    valid_from: str,
    valid_to: str,
) -> DataFrame:
    """The SCD2 change set for one batch: closed-out versions of open
    rows whose tracked attributes differ from the source, plus new
    current rows for changed or unseen keys. Unchanged keys produce
    nothing. Output columns = history columns: attributes OUTSIDE
    ``tracked`` never trigger a change and carry forward from the
    closed row into the new version (NULL for brand-new keys).

    One shuffle: source × current-rows join on the keys (source side
    broadcast-gated by the caller's join planner). The delta is
    batch-sized, never history-sized.
    """
    vf_type = dict(history.dtypes)[valid_from]
    vt_type = dict(history.dtypes)[valid_to]
    untracked = [
        c for c in history.columns
        if c not in (*keys, *tracked, valid_from, valid_to)
    ]

    src = source.withColumn(_BATCH, F.lit(0)).withColumn(_ORD, F.monotonically_increasing_id())
    src = _dedup_last_wins(src, keys).select(*keys, *tracked).alias("s")
    cur = (
        history.filter(F.col(valid_to).isNull())
        .select(*keys, *tracked, *untracked, valid_from, F.lit(True).alias("__has_cur"))
        .alias("c")
    )

    cond = None
    for k in keys:
        e = F.col(f"s.{k}").eqNullSafe(F.col(f"c.{k}"))
        cond = e if cond is None else (cond & e)
    diff = None
    for t in tracked:
        e = ~F.col(f"s.{t}").eqNullSafe(F.col(f"c.{t}"))
        diff = e if diff is None else (diff | e)

    affected = src.join(cur, on=cond, how="left").filter(
        F.col("c.__has_cur").isNull() | (diff if diff is not None else F.lit(False))
    )

    new_rows = affected.select(
        *[F.col(f"s.{k}").alias(k) for k in keys],
        *[F.col(f"s.{t}").alias(t) for t in tracked],
        # untracked attrs carry forward (left join → NULL for new keys)
        *[F.col(f"c.{u}").alias(u) for u in untracked],
        F.lit(ts).cast(vf_type).alias(valid_from),
        F.lit(None).cast(vt_type).alias(valid_to),
    )
    closed = affected.filter(F.col("c.__has_cur").isNotNull()).select(
        *[F.col(f"s.{k}").alias(k) for k in keys],
        *[F.col(f"c.{t}").alias(t) for t in tracked],  # historic values
        *[F.col(f"c.{u}").alias(u) for u in untracked],
        F.col(f"c.{valid_from}").alias(valid_from),
        F.lit(ts).cast(vt_type).alias(valid_to),
    )
    return closed.unionByName(new_rows).select(*history.columns)


def scd2_frames(
    history: DataFrame,
    source: DataFrame,
    keys: list[str],
    ts,
    tracked: list[str] | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Pure relational SCD2 (slowly-changing-dimension type 2) apply:
    given a history frame (``keys + tracked + valid_from + valid_to``,
    open rows have NULL ``valid_to``) and a source batch of current
    attribute values at time ``ts``, return the new history.

    Semantics (null-safe everywhere, like the keyed merge above):

    - key unseen in history        → new open row at ``ts``;
    - tracked attrs changed        → open row closed at ``ts`` (its
      historic values preserved) + new open row at ``ts``;
    - tracked attrs identical      → untouched;
    - keys absent from the source  → untouched (no implicit deletes).

    The reference's merge stops at upsert (`pydala/dataset.py:
    1549-1777`) — SCD2 is the history-keeping extension a training-
    data lineage store needs (which sample used which version of a
    document). Implemented BY the same upsert: the change set keys on
    ``(keys..., valid_from)``, so closing a row is an update and the
    new version is an insert — one machinery, audited once.
    """
    tracked = tracked or [
        c for c in history.columns if c not in (*keys, valid_from, valid_to)
    ]
    _validate_keys(keys, history.columns, "history")
    _validate_keys(tracked, source.columns, "source")
    # the delta is referenced twice by the upsert below (anti-join
    # probe + union); it is batch-sized, so materializing it once is
    # cheap at any scale and stops its source×current join from
    # running per branch. History itself stays lazy: at 100 TB a
    # second scan beats a full localCheckpoint copy, and chained
    # in-memory applies should checkpoint between batches themselves.
    delta = _scd2_delta(history, source, keys, ts, tracked, valid_from, valid_to)
    delta = delta.localCheckpoint(eager=False)
    return merge_frames(history, delta, keys=[*keys, valid_from], strategy="upsert")


def merge_scd2(
    spark: SparkSession,
    target_path: str,
    source: Any,
    key_columns: list[str],
    ts,
    tracked: list[str] | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    **merge_kwargs,
) -> MergeResult:
    """Storage form of :func:`scd2_frames`: applies one SCD2 batch to a
    path-addressed dataset via the file-selective keyed merge — only
    files holding a changed key's open row are rewritten; new versions
    append. On a missing/empty target every source row becomes an open
    row at ``ts``.

    ``ts`` must be strictly greater than any previously applied batch's
    (monotone batch clock); equal timestamps would collide on the
    ``(key, valid_from)`` upsert key.
    """
    from pydala2_spark.plans.fs import list_files, path_exists
    from pydala2_spark.sources.writer import to_spark_df

    src = to_spark_df(spark, source)
    exists = path_exists(spark, target_path) and bool(list_files(spark, target_path))
    if not exists:
        tracked = tracked or [c for c in src.columns if c not in key_columns]
        first = src.select(*key_columns, *tracked, F.lit(ts).alias(valid_from))
        # valid_to mirrors valid_from's type (whatever ts's literal is)
        vf_type = first.schema[valid_from].dataType.simpleString()
        first = first.withColumn(valid_to, F.lit(None).cast(vf_type))
        return merge(
            spark,
            target_path,
            first,
            "upsert",
            key_columns=[*key_columns, valid_from],
            **merge_kwargs,
        )

    history = spark.read.parquet(target_path)
    tracked = tracked or [
        c for c in history.columns if c not in (*key_columns, valid_from, valid_to)
    ]
    delta = _scd2_delta(history, src, key_columns, ts, tracked, valid_from, valid_to)
    return merge(
        spark,
        target_path,
        delta,
        "upsert",
        key_columns=[*key_columns, valid_from],
        **merge_kwargs,
    )


def merge(
    spark: SparkSession,
    target_path: str,
    source: Any,
    strategy: str = "upsert",
    key_columns: list[str] | None = None,
    partition_by: list[str] | None = None,
    alter_schema: bool = False,
    compression: str = "zstd",
    max_rows_per_file: int = 10_000_000,
) -> MergeResult:
    from pydala2_spark.plans.fs import delete_paths, list_files, path_exists
    from pydala2_spark.sources.writer import cast_to_schema

    if strategy not in VALID_STRATEGIES:
        raise ValueError(f"invalid merge strategy {strategy!r}; choose from {VALID_STRATEGIES}")
    if key_columns is not None and len(key_columns) == 0:
        raise ValueError("key_columns must be None (infer) or a non-empty list")

    src = _normalize_source(spark, source)
    src_cols = [c for c in src.columns if c not in (_BATCH, _ORD)]
    source_count = src.count()

    # one listing serves the existence check AND the pre-merge file
    # set below — nothing writes to the target in between (r15: each
    # Hadoop listing is ~0.1 s of driver fs round-trips; merge paid 6,
    # needs 3)
    files_at_entry = (
        list_files(spark, target_path) if path_exists(spark, target_path) else []
    )
    target_exists = bool(files_at_entry)

    # -- discover partitioning of an existing target (hive dirs) ---------
    if target_exists and not partition_by:
        partition_by = _discover_partitions(spark, target_path) or None

    # -- missing / empty target: every strategy but update inserts all ---
    if not target_exists:
        result = MergeResult(strategy=strategy, source_count=source_count)
        if strategy == "update" or source_count == 0:
            return result
        keys = key_columns or src_cols
        _validate_keys(keys, src_cols, "source")
        deduped = _dedup_last_wins(src, keys)
        result.inserted = deduped.count()
        _append(deduped, target_path, partition_by, compression, max_rows_per_file)
        result.inserted_files = list_files(spark, target_path)
        result.target_count_after = result.inserted
        return result

    target = spark.read.parquet(target_path)
    target_cols = target.columns
    target_count_before = target.count()
    result = MergeResult(
        strategy=strategy,
        source_count=source_count,
        target_count_before=target_count_before,
        target_count_after=target_count_before,
    )
    if source_count == 0:
        result.preserved_files = list_files(spark, target_path)
        return result

    keys = key_columns or [c for c in src_cols if c in target_cols]
    _validate_keys(keys, src_cols, "source")
    _validate_keys(keys, target_cols, "target")

    # -- conform source to the target schema -----------------------------
    # cast common columns to target types, add typed nulls for missing
    # ones, keep extra source columns only under alter_schema, and keep
    # the ordering columns through the cast.
    extra_cols = [c for c in src_cols if c not in target_cols] if alter_schema else []
    tgt_schema = target.schema
    src_conformed = cast_to_schema(src, tgt_schema, alter_schema=True).select(
        *target_cols, *extra_cols, _BATCH, _ORD
    )
    deduped = _dedup_last_wins(src_conformed, keys).cache()
    if extra_cols:
        target = target.select(
            "*", *[F.lit(None).cast(dict(deduped.dtypes)[c]).alias(c) for c in extra_cols]
        )
        target_cols = target.columns

    tagged = target.withColumn(_FILE, F.col("_metadata.file_path"))

    # matched target rows: null-safe equi-join with the broadcast ALWAYS
    # on the source side (merge batches are small relative to the target
    # at scale) — and size-gated, so a huge backfill batch degrades to a
    # shuffle join instead of OOMing the driver.
    src_keys = deduped.select(*keys)
    match_cond = _null_safe_cond(tagged, src_keys, keys)
    matched_target = tagged.join(
        _hint_small(src_keys, source_count), on=match_cond, how="left_semi"
    )

    if strategy in ("update", "upsert"):
        matched_files = [r[_FILE] for r in matched_target.select(_FILE).distinct().collect()]
    else:
        matched_files = []

    # matched/unmatched SOURCE rows split on the matched-target key set:
    # that set is bounded by the source batch (each key is a source
    # key), so the broadcast again stays on the small side — never on
    # the target, which can be arbitrarily large. localCheckpoint (not
    # cache) pins the PRE-append listing: the appends below trigger
    # refreshByPath, which would re-materialize a cached plan against
    # the new file list and leak just-inserted keys into the match set.
    matched_keys = matched_target.select(*keys).distinct().localCheckpoint(eager=True)
    inserts = (
        deduped.join(
            _hint_small(matched_keys, source_count),
            on=_null_safe_cond(deduped, matched_keys, keys),
            how="left_anti",
        )
        if strategy in ("insert", "upsert")
        else None
    )
    matched_source = (
        deduped.join(
            _hint_small(matched_keys, source_count),
            on=_null_safe_cond(deduped, matched_keys, keys),
            how="left_semi",
        )
        if strategy in ("update", "upsert")
        else None
    )

    # -- partition immutability guard ------------------------------------
    if partition_by and matched_source is not None and matched_files:
        moved = (
            matched_target.alias("t")
            .join(
                matched_source.alias("s"),
                on=_null_safe_cond(matched_target, matched_source, keys),
                how="inner",
            )
            .filter(
                ~_all_eq_null_safe("t", "s", partition_by)
            )
            .count()
        )
        if moved:
            raise ValueError(
                f"update would change partition column(s) {partition_by} for {moved} matched row(s); "
                "partition columns are immutable under merge"
            )

    # ONE flagged pass counts both splits (r15: two broadcast-join
    # count jobs → one aggregate; the values are identical — the
    # semi/anti frames partition `deduped` on the same matched-keys
    # set this left join flags, and matched_keys rows are distinct so
    # the 1:<=1 join preserves row multiplicity)
    if strategy == "upsert":
        mk_flagged = matched_keys.select(*keys, F.lit(1).alias("__matched"))
        flagged = deduped.join(
            _hint_small(mk_flagged, source_count),
            on=_null_safe_cond(deduped, mk_flagged, keys),
            how="left",
        )
        split_row = flagged.agg(
            F.count(F.when(F.col("__matched").isNotNull(), 1)).alias("u"),
            F.count(F.when(F.col("__matched").isNull(), 1)).alias("i"),
        ).first()
        updated, inserted = int(split_row["u"]), int(split_row["i"])
    else:
        updated = matched_source.count() if matched_source is not None else 0
        inserted = inserts.count() if inserts is not None else 0
    # the rewrite collapses every matched target row (duplicates
    # included — plain appends can leave several rows per key) into one
    # source row, so the post-merge count must subtract what matched
    matched_target_rows = matched_target.count() if updated else 0

    # the entry listing is still current: nothing has written to the
    # target between the existence check and here
    all_files_before = files_at_entry

    # Ordering matters: every plan below still READS the pre-merge file
    # set (the DataFrame's FileIndex was pinned at load), so all appends
    # happen first and the replaced files are deleted last. Any failure
    # after the first append surfaces as PartialMergeError carrying the
    # accumulated MergeResult + the not-yet-deleted files, so the caller
    # can finish (or undo) the mutation deliberately.
    try:
        files_after_inserts = all_files_before
        if inserted:
            _append(inserts.select(*target_cols), target_path, partition_by, compression, max_rows_per_file)
            before = set(all_files_before)
            files_after_inserts = list_files(spark, target_path)
            result.inserted_files = [
                f for f in files_after_inserts if f not in before
            ]

        # -- rewrite matched files: (their unmatched rows) ∪ (matched source)
        if updated and matched_files:
            survivors = (
                _filter_to_files(tagged, matched_files)
                .join(
                    _hint_small(src_keys, source_count), on=match_cond, how="left_anti"
                )
                .drop(_FILE)
            )
            replacement = survivors.unionByName(matched_source.select(*target_cols))
            _append(replacement, target_path, partition_by, compression, max_rows_per_file)
            pre_rewrite = set(files_after_inserts)
            result.rewritten_files = [
                f for f in list_files(spark, target_path) if f not in pre_rewrite
            ]
            # fs.delete returning False is a SILENT failure mode: the
            # replaced file would stay visible next to its replacement
            # (duplicate rows) with no error. Verify and raise into the
            # PartialMergeError contract with the precise leftover set.
            if delete_paths(spark, matched_files) != len(matched_files):
                still = [f for f in matched_files if path_exists(spark, f)]
                if still:
                    from pydala2_spark.errors import PartialMergeError

                    result.updated = updated
                    result.inserted = inserted
                    raise PartialMergeError(
                        f"merge rewrote {target_path!r} but {len(still)} replaced "
                        f"file(s) could not be deleted",
                        merge_result=result,
                        pending_deletes=still,
                    )
    except Exception as e:
        from pydala2_spark.errors import PartialMergeError

        if isinstance(e, PartialMergeError):
            raise
        result.updated = updated
        result.inserted = inserted
        # replacements fully written but originals not removed → the
        # recovery step is exactly "delete pending_deletes"; an earlier
        # failure leaves nothing pending (Spark's committer stages job
        # output in _temporary, so a failed append publishes no files)
        raise PartialMergeError(
            f"merge mutated {target_path!r} but failed before completing: {e}",
            merge_result=result,
            pending_deletes=matched_files if result.rewritten_files else [],
        ) from e
    finally:
        deduped.unpersist()

    result.updated = updated
    result.inserted = inserted
    matched_set = set(matched_files)
    result.preserved_files = [f for f in all_files_before if f not in matched_set]
    result.target_count_after = (
        target_count_before - matched_target_rows + updated + inserted
    )
    return result


def _all_eq_null_safe(left_alias: str, right_alias: str, cols: list[str]):
    cond = None
    for c in cols:
        e = F.col(f"{left_alias}.{c}").eqNullSafe(F.col(f"{right_alias}.{c}"))
        cond = e if cond is None else (cond & e)
    return cond


def _validate_keys(keys: list[str], cols: list[str], side: str) -> None:
    missing = [k for k in keys if k not in cols]
    if missing:
        raise ValueError(f"key column(s) {missing} not present in {side} columns {cols}")


def _append(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None,
    compression: str,
    max_rows_per_file: int,
) -> None:
    writer = (
        df.write.mode("append")
        .option("compression", compression)
        .option("maxRecordsPerFile", str(max_rows_per_file))
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def _discover_partitions(spark: SparkSession, path: str) -> list[str]:
    from pydala2_spark.plans.fs import list_files

    for f in list_files(spark, path):
        segs = f.split("/")[:-1]  # directory components only
        names = [s.split("=", 1)[0] for s in segs if "=" in s]
        if names:
            return names
    return []


def delete_where(
    spark: SparkSession,
    target_path: str,
    predicate: str | Column,
    partition_by: list[str] | None = None,
    compression: str = "zstd",
    max_rows_per_file: int = 10_000_000,
) -> dict:
    """Row-level predicate DELETE with file-selective rewrite — the
    managed-dataset counterpart of SQL ``DELETE FROM t WHERE p``.

    Semantics: rows where ``predicate`` is TRUE are removed; rows
    where it is FALSE **or NULL** survive (the SQL DELETE rule —
    three-valued logic never deletes on unknown). Only files that
    actually CONTAIN a matching row are rewritten; the predicate
    reaches the parquet scan, so min/max row-group pruning skips
    non-matching files without reading data. Untouched files keep
    their names — time travel over snapshots and downstream file-based
    caches stay valid for them.

    Failure contract: replacements append BEFORE originals delete
    (same ordering as :func:`merge`); a failure in the window raises
    :class:`~pydala2_spark.errors.PartialMergeError` whose
    ``pending_deletes`` completes the operation.

    Reference analogue: none — pydala2 deletes whole files/datasets
    (`pydala/dataset.py` vacuum/delete); row-level delete is part of
    the managed-table surface users expect from Delta/Iceberg.

    100 TB shape: one pushed-down scan finds touched files, one scan
    of ONLY those files writes replacements; cost scales with the data
    under the predicate, not the dataset. Returns a dict with
    ``deleted_rows``, ``rewritten_files``, ``preserved_files``,
    ``matched_files``.
    """
    from pydala2_spark.plans.fs import delete_paths, list_files, path_exists

    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    all_before = (
        list_files(spark, target_path) if path_exists(spark, target_path) else []
    )
    if not all_before:
        return {
            "deleted_rows": 0,
            "matched_files": [],
            "rewritten_files": [],
            "preserved_files": [],
        }
    if partition_by is None:
        partition_by = _discover_partitions(spark, target_path) or None

    target = spark.read.parquet(target_path)
    tagged = target.withColumn(_FILE, F.col("_metadata.file_path"))
    matched = _delete_discovery(tagged, pred)

    # ONE job yields both the touched-file set and the row count
    # (per-file partial counts collapse map-side; the predicate is
    # pushed to the scan, so min/max row-group pruning skips clean
    # files without reading data)
    per_file = matched.groupBy(_FILE).count().collect()
    matched_files = [r[_FILE] for r in per_file]
    deleted_rows = int(sum(r["count"] for r in per_file))
    if not matched_files:
        return {
            "deleted_rows": 0,
            "matched_files": [],
            "rewritten_files": [],
            "preserved_files": all_before,
        }

    appended = False
    try:
        hit = F.coalesce(pred, F.lit(False))
        survivors = _filter_to_files(tagged, matched_files).filter(
            ~hit
        ).drop(_FILE)
        _append(survivors, target_path, partition_by, compression, max_rows_per_file)
        appended = True
        before = set(all_before)
        rewritten = [f for f in list_files(spark, target_path) if f not in before]
        if delete_paths(spark, matched_files) != len(matched_files):
            still = [f for f in matched_files if path_exists(spark, f)]
            if still:
                from pydala2_spark.errors import PartialMergeError

                raise PartialMergeError(
                    f"delete_where rewrote {target_path!r} but {len(still)} "
                    f"replaced file(s) could not be deleted",
                    pending_deletes=still,
                )
    except Exception as e:
        from pydala2_spark.errors import PartialMergeError

        if isinstance(e, PartialMergeError):
            raise
        # replacements published → the recovery step is exactly
        # "delete pending_deletes" (same contract as merge); a failed
        # append publishes nothing (committer stages in _temporary),
        # so nothing is pending then
        raise PartialMergeError(
            f"delete_where mutated {target_path!r} but failed before "
            f"completing: {e}",
            pending_deletes=matched_files if appended else [],
        ) from e

    matched_set = set(matched_files)
    return {
        "deleted_rows": deleted_rows,
        "matched_files": matched_files,
        "rewritten_files": rewritten,
        "preserved_files": [f for f in all_before if f not in matched_set],
    }


def _delete_discovery(tagged: DataFrame, pred: Column) -> DataFrame:
    """The touched-row frame ``delete_where`` scans: TRUE-only match
    (coalesce keeps NULL-predicate rows alive) over the file-tagged
    target. Factored out so plan tests exercise the REAL discovery
    expression, not a re-implementation."""
    return tagged.filter(F.coalesce(pred, F.lit(False)))


def update_where(
    spark: SparkSession,
    target_path: str,
    predicate: str | Column,
    set: dict[str, "str | Column"],
    partition_by: list[str] | None = None,
    compression: str = "zstd",
    max_rows_per_file: int = 10_000_000,
) -> dict:
    """Row-level predicate UPDATE with file-selective rewrite — the
    managed-dataset counterpart of SQL ``UPDATE t SET c = e WHERE p``,
    and :func:`delete_where`'s sibling (same discovery, same failure
    contract, same file economics).

    Semantics: rows where ``predicate`` is TRUE take the ``set``
    assignments (expressions may reference the row's OLD values, all
    assignments evaluate against the pre-update row — SQL UPDATE
    rules); rows where it is FALSE **or NULL** are byte-preserved.
    Only files CONTAINING a matching row rewrite; untouched files keep
    their names, so snapshots and file-based caches stay valid.

    Failure contract: replacements append BEFORE originals delete; a
    failure in the window raises
    :class:`~pydala2_spark.errors.PartialMergeError` whose
    ``pending_deletes`` completes the operation.

    Reference analogue: none — pydala2 updates by whole-key merge
    (`pydala/dataset.py` upsert); predicate UPDATE is managed-table
    surface users expect from Delta/Iceberg.

    100 TB shape: identical to delete_where — one pushed-down
    discovery scan (min/max prunes clean files), one rewrite scan of
    ONLY the touched files; cost scales with data under the predicate.
    Returns ``updated_rows`` / ``matched_files`` / ``rewritten_files``
    / ``preserved_files``.
    """
    from pydala2_spark.plans.fs import delete_paths, list_files, path_exists

    if not set:
        raise ValueError("update_where needs at least one SET assignment")
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    all_before = (
        list_files(spark, target_path) if path_exists(spark, target_path) else []
    )
    if not all_before:
        return {
            "updated_rows": 0,
            "matched_files": [],
            "rewritten_files": [],
            "preserved_files": [],
        }
    if partition_by is None:
        partition_by = _discover_partitions(spark, target_path) or None

    target = spark.read.parquet(target_path)
    missing = [c for c in set if c not in target.columns]
    if missing:
        raise ValueError(f"SET columns not in target: {missing}")
    tagged = target.withColumn(_FILE, F.col("_metadata.file_path"))
    matched = _delete_discovery(tagged, pred)
    per_file = matched.groupBy(_FILE).count().collect()
    matched_files = [r[_FILE] for r in per_file]
    updated_rows = int(sum(r["count"] for r in per_file))
    if not matched_files:
        return {
            "updated_rows": 0,
            "matched_files": [],
            "rewritten_files": [],
            "preserved_files": all_before,
        }

    appended = False
    try:
        hit = F.coalesce(pred, F.lit(False))
        # all assignments evaluate against the PRE-update row: build
        # every new value from the original columns, then project —
        # a SET that swaps two columns stays correct
        assigns = {
            c: (F.expr(e) if isinstance(e, str) else e) for c, e in set.items()
        }
        cols = [
            (
                F.when(hit, assigns[c]).otherwise(F.col(c)).alias(c)
                if c in assigns
                else F.col(c)
            )
            for c in target.columns
        ]
        replacement = _filter_to_files(tagged, matched_files).select(*cols)
        _append(
            replacement, target_path, partition_by, compression, max_rows_per_file
        )
        appended = True
        before = frozenset(all_before)
        rewritten = [f for f in list_files(spark, target_path) if f not in before]
        if delete_paths(spark, matched_files) != len(matched_files):
            still = [f for f in matched_files if path_exists(spark, f)]
            if still:
                from pydala2_spark.errors import PartialMergeError

                raise PartialMergeError(
                    f"update_where rewrote {target_path!r} but {len(still)} "
                    f"replaced file(s) could not be deleted",
                    pending_deletes=still,
                )
    except Exception as e:
        from pydala2_spark.errors import PartialMergeError

        if isinstance(e, PartialMergeError):
            raise
        raise PartialMergeError(
            f"update_where mutated {target_path!r} but failed before "
            f"completing: {e}",
            pending_deletes=matched_files if appended else [],
        ) from e

    matched_set = frozenset(matched_files)
    return {
        "updated_rows": updated_rows,
        "matched_files": matched_files,
        "rewritten_files": rewritten,
        "preserved_files": [f for f in all_before if f not in matched_set],
    }
