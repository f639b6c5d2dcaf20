from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from de4ml_spark.session import get_spark

    # r18 (VERDICT r17 #2 — the driver's pytest window): track the box
    # instead of pinning 8 cores. The suite is Spark-job-bound (the
    # degenerate parity sweep alone runs 27 shapes x 374 entries x 2
    # engines) and the driver runs it alone on the full machine, so a
    # local[8] session left 3/4 of a 32-core box idle for the whole
    # 40-64 min run. SPARK_GRAFT_CPUS still overrides for constrained
    # side-by-side dev runs.
    cpus = int(
        os.environ.get(
            "SPARK_GRAFT_CPUS", str(min(32, os.cpu_count() or 8))
        )
    )
    s = get_spark("tests", cpus=cpus)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
