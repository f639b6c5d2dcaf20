"""DDL generation from contracts (S10 parity).

Reference: dataops/app/api.py:24-33 builds ``CREATE TABLE agrawal(c DOUBLE
/ INT ...)`` from Pydantic field types (float -> DOUBLE else INT). Here the
contract is a StructType (possibly from JSON Schema) and the DDL is Spark
SQL; nested types serialize via the type's own DDL form.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def column_ddl(struct: T.StructType) -> str:
    return ", ".join(
        f"{f.name} {f.dataType.simpleString().upper()}"
        + ("" if f.nullable else " NOT NULL")
        for f in struct.fields
    )


def create_table_sql(
    name: str,
    struct: T.StructType,
    using: str = "PARQUET",
    location: str | None = None,
    partitioned_by: list[str] | None = None,
) -> str:
    sql = f"CREATE TABLE IF NOT EXISTS {name} ({column_ddl(struct)}) USING {using}"
    if partitioned_by:
        sql += f" PARTITIONED BY ({', '.join(partitioned_by)})"
    if location:
        sql += f" LOCATION '{location}'"
    return sql


def create_table(
    spark: SparkSession,
    name: str,
    struct: T.StructType,
    location: str | None = None,
    partitioned_by: list[str] | None = None,
) -> None:
    spark.sql(create_table_sql(name, struct, location=location, partitioned_by=partitioned_by))
