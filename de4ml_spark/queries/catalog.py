"""Central query catalog: merges per-module registries into the
``queries()`` / ``oracle_sql()`` surface consumed by __spark_entry__.py.

Each registry entry: name -> {"fn": (spark, sf_dir) -> DataFrame,
"sql": DuckDB-runnable ANSI SQL or None for non-SQL-expressible ops}.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registries() -> list[dict]:
    regs = []
    from de4ml_spark.queries import relational

    regs.append(relational.REGISTRY)
    for modname in (
        "relational2",
        "relational3",
        "etlq",
        "profileq",
        "profileq2",
        "streamq",
        "dedupq",
        "simq",
        "textq",
        "textq2",
        "textq3",
        "samplingq",
    ):
        try:
            mod = __import__(f"de4ml_spark.queries.{modname}", fromlist=["REGISTRY"])
            regs.append(mod.REGISTRY)
        except ImportError:
            pass
    return regs


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for reg in _registries():
        for name, spec in reg.items():
            out[name] = spec["fn"]
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for reg in _registries():
        for name, spec in reg.items():
            if spec.get("sql"):
                out[name] = spec["sql"]
    return out
