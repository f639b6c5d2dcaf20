"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (CTR per user — the J2 join the
reference's contracts were designed for, logging-service/app/contracts.py:40-42)
at sf0.001. ``queries()`` / ``oracle_sql()`` expose the full catalog from
de4ml_spark.queries (one entry per implemented operator from SURVEY.md §2).

Cache contract: a few entries persist() a corpus-sized interior frame
and register it with ``de4ml_spark.cache.defer_release`` (the result is
itself corpus-sized, so the eager checkpoint-and-release path would
double-materialize). A long-lived consumer looping over ``queries()``
SHOULD call ``de4ml_spark.cache.drain_deferred()`` between entries
(bench.py / verify_oracle do); consumers that don't are still safe —
the deferred list is bounded (oldest registrations auto-unpersist on
overflow, ``cache.py``), so storage cannot grow without limit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to a driver-provided session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    except Exception:
        pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    from de4ml_spark.queries.relational import ctr_per_user

    return ctr_per_user(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from de4ml_spark.queries import catalog

    base = catalog.queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return run

    return {name: wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    from de4ml_spark.queries import catalog

    return catalog.oracle_sql()
