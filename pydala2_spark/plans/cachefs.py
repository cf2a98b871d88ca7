"""Local cache for remote datasets.

Capability parity with the reference's cached fsspec filesystem
(`/root/reference/pydala/filesystem.py:179-227`): copy remote data
files to a local cache directory once, serve subsequent reads from the
copy, refresh incrementally, and invalidate explicitly.

Spark framing: on a CLUSTER the idiomatic "cache remote data" answer is
storage-level caching (``df.persist``) or just re-reading — executors
stream from object storage in parallel and a driver-local disk copy
would be a bottleneck at 100 TB. This class exists for the workflow
the reference actually serves: a single machine iterating against a
remote bucket, where paying the download once is the win. The copy
runs file-at-a-time through Hadoop's FileUtil, so the same code works
for ``s3a://``/``hdfs://`` sources without extra Python dependencies.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import SparkSession

from pydala2_spark.plans.fs import (
    copy_file,
    delete_paths,
    file_sizes,
    mkdirs,
    qualified,
)


class LocalCache:
    """Incrementally-synced local mirror of a remote dataset path.

    ``sync()`` copies only files that are missing locally or whose size
    changed (the reference cache's staleness rule); ``invalidate()``
    drops the mirror (reference `filesystem.py:219-227`).
    """

    def __init__(
        self,
        spark: SparkSession,
        remote_path: str,
        cache_dir: str | None = None,
    ) -> None:
        self.spark = spark
        self.remote_path = remote_path.rstrip("/")
        digest = hashlib.md5(self.remote_path.encode()).hexdigest()[:12]
        self.cache_dir = cache_dir or os.path.join(
            tempfile.gettempdir(), "pydala2_spark_cache", digest
        )

    def sync(self) -> list[str]:
        """Copy new/changed remote data files into the cache; returns
        the locally-copied file paths (empty = cache was fresh)."""
        base = qualified(self.spark, self.remote_path)
        remote = file_sizes(self.spark, self.remote_path)
        local = {
            p[len(qualified(self.spark, self.cache_dir)) :].lstrip("/"): s
            for p, s in file_sizes(self.spark, self.cache_dir).items()
        }
        copied: list[str] = []
        for uri, size in remote.items():
            rel = uri[len(base) :].lstrip("/")
            if local.get(rel) == size:
                continue
            dst = os.path.join(self.cache_dir, rel)
            mkdirs(self.spark, os.path.dirname(dst))
            if not copy_file(self.spark, uri, dst):
                raise IOError(f"cache copy failed: {uri} -> {dst}")
            copied.append(dst)
        return copied

    def dataset(self, **dataset_kwargs):
        """Sync, then open a Dataset over the local mirror."""
        from pydala2_spark.sources.dataset import Dataset

        self.sync()
        return Dataset(self.cache_dir, self.spark, **dataset_kwargs)

    def invalidate(self) -> None:
        """Drop the local mirror; the next sync re-downloads."""
        delete_paths(self.spark, [self.cache_dir])
