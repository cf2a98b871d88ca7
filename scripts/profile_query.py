"""Per-query phase profiler (optimization rounds).

For each named query: time fn(spark, sf_dir) — the CONSTRUCTION phase,
which includes any internal actions the operator runs (writes,
compactions, iterative loops, checkpoints) — separately from the final
computation, measured with the noop sink (guide §1.4: computes every
column of every row, no collect). Also prints the executed-plan
shuffle-Exchange count and (optionally) dumps .explain("formatted").

Usage:
    python scripts/profile_query.py [--explain-dir DIR] q1 q2 ...
Environment: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def main() -> None:
    from pydala2_spark.queries import queries
    from pydala2_spark.session import get_spark

    args = sys.argv[1:]
    explain_dir = None
    if args and args[0] == "--explain-dir":
        explain_dir = args[1]
        os.makedirs(explain_dir, exist_ok=True)
        args = args[2:]
    reps = 2
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]

    spark = get_spark(app_name="pydala2_spark_profile", cpus=CPUS)
    qs = queries()
    unknown = [a for a in args if a not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # warmup (codegen + file listing), same as bench
    qs["q6_forecast_revenue"](spark, SF_DIR).collect()

    for name in args:
        best = None
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"{name}: construct")
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name}: compute")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(None)
            row = (t1 - t0, t2 - t1, t2 - t0)
            if best is None or row[2] < best[2]:
                best = row
            if rep == 0:
                try:
                    plan = df._jdf.queryExecution().executedPlan().toString()
                    sh = (
                        plan.count("Exchange")
                        - plan.count("BroadcastExchange")
                        - plan.count("ReusedExchange")
                    )
                except Exception:
                    sh = -1
                if explain_dir:
                    with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                        f.write(df._sc._jvm.PythonSQLUtils.explainString(
                            df._jdf.queryExecution(), "formatted"))
        print(
            f"PROFILE {name}: construct={best[0]:.3f}s compute={best[1]:.3f}s "
            f"total={best[2]:.3f}s shuffles={sh}",
            flush=True,
        )


if __name__ == "__main__":
    main()
