"""Driver-session parity harness (r13 verdict ask #2).

The driver boots its OWN bare SparkSession and applies only
``__spark_entry__._prepare``'s runtime confs — none of the builder
defaults from ``session.get_spark``. Any conf there that changes
ON-DISK layout or footer stats (parquet outputTimestampType,
compression codec, partitionOverwriteMode, ...) is a potential
mirror/driver divergence: the r13 driver red
(`m2_compact_timeperiod_roundtrip`) happened exactly because the bare
session wrote INT96 timestamps (no footer stats) while the builder
session wrote TIMESTAMP_MICROS.

This harness boots a bare session IN A SUBPROCESS (the pytest JVM
already holds a builder-configured session; ``getOrCreate`` would
reuse it and defeat the point) and runs every registry query that
writes-then-reads inside the gate. A query that asserts internally
(all the roundtrip queries do) or returns zero rows fails the harness
— in-house, before the driver sees it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The queries whose result depends on FOOTER STATS of files they write
# during the run — the only surface where a bare driver session's write
# defaults can diverge from the builder session's (the r13 red: INT96
# timestamps carry no footer min/max, so a stats-driven planner goes
# blind on bare-session output). Plain write-then-read-back roundtrips
# (m1/m3/m4/csv/json/orc/snapshot/ivm) read their own bytes back under
# the SAME session and consume no footer statistics, so they cannot
# diverge on a write conf — running all 15 blew the driver's pytest
# budget (r14 VERIFY tests_ok=false was a timeout) for zero extra
# coverage. Kept: every consumer of written footer stats.
WRITE_THEN_READ_QUERIES = [
    "m2_compact_timeperiod_roundtrip",   # compaction bucketed by ts footer min
    "p_zorder_pruned_scan",              # zorder bounds read from footers
    "p_bloom_pruned_scan",               # sidecar built from written files
    "s12_update_metadata_writethrough",  # StatsIndex write-through refresh
]

_SUBPROCESS_SCRIPT = r"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

# BARE session: local master + UI off only — no builder defaults.
spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver_parity_harness")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry  # applies _prepare() per query, like the driver

qs = entry.queries()
results = {{}}
for name in {names!r}:
    try:
        results[name] = {{"rows": qs[name](spark, {sf_dir!r}).count(), "err": None}}
    except Exception as exc:  # noqa: BLE001 — report, don't mask the rest
        results[name] = {{"rows": None, "err": f"{{type(exc).__name__}}: {{exc}}"}}
print("PARITY_JSON:" + json.dumps(results))
"""


def test_bare_session_runs_write_then_read_queries():
    # sf0.01 — the local-mirror SF: every listed query returns >0 rows
    # there (sf0.001 is too small: p_zorder's selective predicate
    # legitimately matches nothing, under EITHER session).
    script = _SUBPROCESS_SCRIPT.format(
        repo=REPO,
        names=WRITE_THEN_READ_QUERIES,
        sf_dir="/root/testdata/sf0.01",
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    marker = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("PARITY_JSON:")
    ]
    assert marker, (
        f"parity subprocess produced no result line\n"
        f"stdout tail: {proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-2000:]}"
    )
    results = json.loads(marker[-1][len("PARITY_JSON:"):])
    failures = {
        n: r for n, r in results.items() if r["err"] is not None or not r["rows"]
    }
    assert not failures, (
        "queries diverge under a driver-like bare session (conf missing "
        f"from __spark_entry__._prepare?): {json.dumps(failures, indent=2)}"
    )
