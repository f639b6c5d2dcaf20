from de4ml_spark.queries.catalog import oracle_sql, queries

__all__ = ["queries", "oracle_sql"]
