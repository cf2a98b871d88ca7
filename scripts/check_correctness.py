"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 in Spark AND the
matching oracle_sql() in DuckDB, then compares row count, column-name
set, and order-insensitive values (columns sorted by name, rows sorted,
values canonicalized to strings).

Usage: python scripts/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonicalize -0.0 / ints-as-floats
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return sorted(cols), canon_rows


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from pydala2_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(spark_rows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = list(rel.columns)
            duck_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {e}")
            continue
        sc, sr = frame_sig(spark_cols, spark_rows)
        dc, dr = frame_sig(duck_cols, duck_rows)
        if sc != dc:
            failures.append(name)
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
            continue
        if len(sr) != len(dr):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(sr)} duck={len(dr)}")
            continue
        if sr != dr:
            failures.append(name)
            bad = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
            print(f"FAIL  {name}: {len([1 for a,b in zip(sr,dr) if a!=b])} rows differ; first diffs:")
            for i in bad:
                print(f"    spark {sr[i]}")
                print(f"    duck  {dr[i]}")
            continue
        print(f"OK    {name}: {len(sr)} rows")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
