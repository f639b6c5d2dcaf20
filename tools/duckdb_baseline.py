#!/usr/bin/env python
"""DuckDB baseline for the bench headline set: run each headline query's
ORACLE SQL (identical semantics to the Spark plans by construction — the
correctness gate enforces it) on the same parquet at the same SF, with
fetchall materialization, 32 threads, min-of-3 after warm-up — the same
methodology bench.py uses for Spark. Prints one JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    import bench
    from de4ml_spark.queries import catalog

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    oracles = catalog.oracle_sql()
    if os.environ.get("SPARK_GRAFT_BENCH_CATALOG") == "1":
        names, skipped = list(oracles), []
    else:
        names = [n for n in bench.HEADLINE if n in oracles]
        skipped = [n for n in bench.HEADLINE if n not in oracles]

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    from de4ml_spark.session import duckdb_view_sql

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            + duckdb_view_sql(t, f"{sf_dir}/{t}.parquet")
        )

    for name in names:  # warm-up (buffer cache, plan cache)
        con.sql(oracles[name]).fetchall()

    per: dict[str, float] = {}
    for name in names:
        ts = []
        for _ in range(reps):
            t0 = time.time()
            con.sql(oracles[name]).fetchall()
            ts.append(time.time() - t0)
        per[name] = round(min(ts), 3)
        print(f"# {name}: min {per[name]:.3f}s of {[round(t, 3) for t in ts]}",
              file=sys.stderr)

    print(json.dumps({
        "metric": "duckdb_headline_sequential",
        "value": round(sum(per.values()), 3),
        "unit": "sec",
        "queries": per,
        "skipped_no_oracle": skipped,
        "threads": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
