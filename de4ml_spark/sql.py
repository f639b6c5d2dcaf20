"""Pure-SQL surface: register the warehouse tables as temp views so users
can drive the engine with ``spark.sql(...)`` alone (the reference's users
interact through DuckDB SQL; this is the equivalent entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from de4ml_spark.session import TABLES, load_table


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create one temp view per testdata table (normalized types — events
    timestamps are already micros TIMESTAMP_NTZ). Returns the view names."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TABLES)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: register views and run a SQL query against them."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
