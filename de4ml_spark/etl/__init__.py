from de4ml_spark.etl.flatten import flatten, flatten_exprs
from de4ml_spark.etl.pipeline import (
    ingest_raw,
    parse_typed,
    read_warehouse,
    write_warehouse,
)

__all__ = [
    "flatten",
    "flatten_exprs",
    "ingest_raw",
    "parse_typed",
    "write_warehouse",
    "read_warehouse",
]
