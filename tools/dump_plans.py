#!/usr/bin/env python
"""Dump `.explain("formatted")` for named catalog queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX query [query ...]
Writes OUTDIR/<query>_<SUFFIX>.txt. Runs with no_release() so iterative
entries show their interior plans (same posture as tools/plan_report.py),
AQE off for deterministic initial plans.

Run from the tree whose plans you want (repo root goes on sys.path
first), e.g. the /tmp/repo_before snapshot for _before captures.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    from de4ml_spark.cache import no_release
    from de4ml_spark.queries import catalog
    from de4ml_spark.session import get_spark

    spark = get_spark("dump_plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    qs = catalog.queries()
    os.makedirs(outdir, exist_ok=True)
    with no_release():
        for name in names:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
