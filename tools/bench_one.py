#!/usr/bin/env python
"""Ad-hoc per-query micro-bench: Spark vs DuckDB at one SF.

Usage: python tools/bench_one.py <query_name> [sf_dir]
Min-of-3 after one warm-up, same methodology as bench.py/duckdb_baseline.py.
"""

from __future__ import annotations

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
    from de4ml_spark.queries import catalog
    from de4ml_spark.session import get_spark

    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    spark = get_spark("bench_one", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    fn = catalog.queries()[name]
    times = []
    for i in range(4):
        t0 = time.time()
        fn(spark, sf_dir).collect()
        times.append(time.time() - t0)
    print(f"spark  {name}: min {min(times[1:]):.3f}s  runs {[round(t,3) for t in times]}")

    sql = catalog.oracle_sql().get(name)
    if sql:
        con = duckdb.connect()
        con.execute("SET threads TO 32")
        from de4ml_spark.session import duckdb_view_sql

        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS " + duckdb_view_sql(t, p)
                )
        dtimes = []
        for i in range(4):
            t0 = time.time()
            con.execute(sql).fetchall()
            dtimes.append(time.time() - t0)
        print(
            f"duckdb {name}: min {min(dtimes[1:]):.3f}s  runs {[round(t,3) for t in dtimes]}"
        )


if __name__ == "__main__":
    main()
