"""Typed partial-failure contracts.

Capability parity with the reference's recovery surface
(`/root/reference/pydala/io.py:41-64`, contract frozen by
`/root/reference/tests/test_dataset_merge.py:701-757`): when a
multi-file mutation fails partway, the exception CARRIES what already
happened so the caller can recover deliberately (re-publish, re-delete,
or roll back) instead of diffing the filesystem by hand.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pydala2_spark.operators.merge import MergeResult


class PartialWriteError(RuntimeError):
    """Data files were written but dataset completion failed.

    Attributes:
        files: files known to have been written before the failure —
            everything a cleanup/retry needs to inspect.
        staging_dir: when the write staged to a temp dir, its path (the
            data survives there; publish can be retried).
    """

    def __init__(
        self,
        message: str,
        files: list[str] | None = None,
        staging_dir: str | None = None,
    ):
        super().__init__(message)
        self.files = list(files or [])
        self.staging_dir = staging_dir


class PartialMergeError(RuntimeError):
    """A merge mutated storage but failed before completing.

    Attributes:
        merge_result: the :class:`MergeResult` accumulated up to the
            failure — counts plus the file lists already appended.
        pending_deletes: replaced files that were scheduled for removal
            but NOT yet (or not all) deleted; re-running
            ``delete_paths`` on these completes the merge.
    """

    def __init__(
        self,
        message: str,
        merge_result: "MergeResult | None" = None,
        pending_deletes: list[str] | None = None,
    ):
        super().__init__(message)
        self.merge_result = merge_result
        self.pending_deletes = list(pending_deletes or [])


class MissingFooterStatsWarning(RuntimeWarning):
    """A footer-stats-driven planner found candidate files WITHOUT
    min/max statistics for the column it plans on (e.g. INT96
    timestamps, which parquet stores stat-less) and fell back to a
    data scan to derive them.

    Emitted instead of silently skipping those files: a maintenance
    operator that quietly plans nothing while reporting success is an
    operational hazard at scale (unbounded small-file accumulation).
    """
