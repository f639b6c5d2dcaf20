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


def register_query_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[str]:
    """Expose catalog queries as temp views: ``spark.sql("SELECT * FROM
    vocab_top_terms")``. Views are lazy plan handles — nothing executes at
    registration; composing them in further SQL keeps one end-to-end
    Catalyst plan (filters/projections push INTO the registered plan).
    Returns the registered names."""
    from de4ml_spark.queries import catalog

    qs = catalog.queries()
    picked = names if names is not None else list(qs)
    out = []
    for name in picked:
        qs[name](spark, sf_dir).createOrReplaceTempView(name)
        out.append(name)
    return out
