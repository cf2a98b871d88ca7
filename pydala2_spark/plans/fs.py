"""Filesystem primitives via the Hadoop FileSystem API.

The reference reaches storage through fsspec (`/root/reference/pydala/
filesystem.py:179-227` — local / S3 / memory / bucket-scoped / cached).
On Spark the executor-visible storage layer IS Hadoop's FileSystem, so
these helpers go through the JVM gateway: one code path for ``file://``
in tests and ``s3a://`` / ``hdfs://`` on a cluster, with no extra
Python dependencies.

Only driver-side, small-metadata operations live here (list, delete,
rename, exists); data always moves through DataFrame jobs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

DATA_FILE_SUFFIXES = (".parquet", ".csv", ".json", ".orc", ".avro")


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return fs, hpath, jvm


def path_exists(spark: SparkSession, path: str) -> bool:
    fs, hpath, _ = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def iter_file_statuses(spark: SparkSession, path: str, hide: str = "segment"):
    """ONE recursive walk yielding ``(path, size_bytes, mtime_ms)`` per
    visible file — the shared substrate for list_files / file_sizes /
    file_mtimes, so the hidden-file rule lives in exactly one place.

    ``hide="segment"`` (Spark's data-visibility rule) hides a file when
    ANY path segment below the base starts with ``_``/``.``;
    ``hide="name"`` hides only by final name — the mirroring rule
    (LocalCache intentionally copies sidecar CONTENTS like
    ``_snapshots/v*.json`` whose own names are plain).
    """
    fs, hpath, _ = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return
    base = fs.makeQualified(hpath).toString()
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        status = it.next()
        p = status.getPath().toString()
        if hide == "name":
            hidden = p.rsplit("/", 1)[-1].startswith(("_", "."))
        else:
            rel = p[len(base):] if p.startswith(base) else p
            hidden = any(seg.startswith(("_", ".")) for seg in rel.split("/") if seg)
        if hidden:
            continue
        yield p, int(status.getLen()), int(status.getModificationTime())


def list_files(spark: SparkSession, path: str, suffixes=DATA_FILE_SUFFIXES) -> list[str]:
    """Recursive data-file listing (skips _SUCCESS / hidden files)."""
    return sorted(
        p
        for p, _, _ in iter_file_statuses(spark, path)
        if not suffixes or p.endswith(suffixes)
    )


def delete_paths(spark: SparkSession, paths: list[str]) -> int:
    n = 0
    for p in paths:
        fs, hpath, _ = _fs_and_path(spark, p)
        if fs.delete(hpath, True):
            n += 1
    return n


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, hsrc, jvm = _fs_and_path(spark, src)
    return bool(fs.rename(hsrc, jvm.org.apache.hadoop.fs.Path(dst)))


def mkdirs(spark: SparkSession, path: str) -> bool:
    fs, hpath, _ = _fs_and_path(spark, path)
    return bool(fs.mkdirs(hpath))


def qualified(spark: SparkSession, path: str) -> str:
    """Fully-qualified URI form of ``path`` on its filesystem."""
    fs, hpath, _ = _fs_and_path(spark, path)
    return fs.makeQualified(hpath).toString()


def read_text(spark: SparkSession, path: str) -> str:
    """Small-file text read through the Hadoop FS (manifests, configs).

    The byte shuttling stays JVM-side (commons-io ships with Hadoop):
    py4j passes byte[] by value, so Java reads into a Python buffer
    would silently return nothing.
    """
    fs, hpath, jvm = _fs_and_path(spark, path)
    stream = fs.open(hpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text(spark: SparkSession, path: str, content: str) -> None:
    """Small-file text write through the Hadoop FS (no overwrite races:
    callers publish via rename)."""
    fs, hpath, _ = _fs_and_path(spark, path)
    stream = fs.create(hpath, True)
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()


def copy_file(spark: SparkSession, src: str, dst: str) -> bool:
    """Cross-filesystem single-file copy (FileUtil) — e.g. s3a → file."""
    fs_src, hsrc, jvm = _fs_and_path(spark, src)
    fs_dst, hdst, _ = _fs_and_path(spark, dst)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    return bool(
        jvm.org.apache.hadoop.fs.FileUtil.copy(fs_src, hsrc, fs_dst, hdst, False, True, conf)
    )


def replace_dir(spark: SparkSession, staging: str, live: str) -> None:
    """Atomically swap a freshly-written staging dir into place over a
    (possibly existing) live dir: live → aside, staging → live, delete
    aside — with rollback if the publish rename fails, so a crash or
    failure can never leave NEITHER directory readable (the bare
    delete-then-rename sequence the sidecar builders used had exactly
    that window)."""
    import uuid as _uuid

    if not path_exists(spark, live):
        if not rename(spark, staging, live):
            raise IOError(f"could not publish {staging!r} to {live!r}")
        return
    aside = f"{live.rstrip('/')}__old_{_uuid.uuid4().hex[:8]}"
    if not rename(spark, live, aside):
        delete_paths(spark, [staging])
        raise IOError(f"could not move {live!r} aside for replacement")
    if not rename(spark, staging, live):
        if not rename(spark, aside, live):
            raise IOError(
                f"replace failed AND rollback failed: old at {aside!r}, "
                f"new at {staging!r}, nothing at {live!r}"
            )
        delete_paths(spark, [staging])
        raise IOError(f"could not publish {staging!r} to {live!r}")
    delete_paths(spark, [aside])


SCHEME_RE = r"^[A-Za-z0-9+.-]+:/+"


def uri_scheme(path: str) -> str | None:
    """Lower-cased URI scheme of ``path``, or None for scheme-less
    local paths (``file:`` spellings included — they ARE a scheme)."""
    import re

    m = re.match(r"^([A-Za-z0-9+.-]+):/", path)
    return m.group(1).lower() if m else None


def schemeless(path: str) -> str:
    """Scheme-free absolute form for path COMPARISONS: Hadoop
    qualifies local paths as ``file:/x`` while ``input_file_name()``
    yields ``file:///x`` — every sidecar/manifest comparison in the
    package goes through this one rule (and its Column twin
    ``schemeless_col``)."""
    import re

    return re.sub(SCHEME_RE, "/", path)


def schemeless_col(col):
    """Column form of :func:`schemeless` (e.g. over input_file_name)."""
    from pyspark.sql import functions as F

    return F.regexp_replace(col, SCHEME_RE, "/")


def file_mtimes(spark: SparkSession, path: str) -> dict[str, int]:
    """Modification time (epoch millis) per data file — recursive,
    hidden files skipped (same visibility rule as list_files)."""
    return {p: m for p, _, m in iter_file_statuses(spark, path)}


def file_sizes(spark: SparkSession, path: str) -> dict[str, int]:
    """Size per file, hiding only by final NAME — so a mirror sync
    copies sidecar contents (e.g. ``_snapshots/v*.json``)."""
    return {p: s for p, s, _ in iter_file_statuses(spark, path, hide="name")}
