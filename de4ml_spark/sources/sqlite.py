"""SQLite landing-table source (S3 parity).

Reference: logging-service/app/etl.py:22-27 attaches the SQLite event log
(``CALL sqlite_attach``) to read the ``(ts, data)`` landing table. Our
engine's primary landing format is JSON-lines/Parquet (SURVEY §7.5.5 — parity
at the data level), but this reader closes the driver-compat gap for real
SQLite files without a JDBC driver: stdlib ``sqlite3`` -> Arrow ->
DataFrame.

Scale note: a SQLite file is by definition single-node-local and bounded by
one ingest node's disk — reading it driver-side and immediately
repartitioning is the honest architecture; the distributed path starts at
the Parquet/JSON landing zone this table is ETL'd into.
"""

from __future__ import annotations

import sqlite3

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession


def read_sqlite_table(
    spark: SparkSession,
    db_path: str,
    table: str,
    batch_rows: int = 100_000,
    partitions: int | None = None,
) -> DataFrame:
    con = sqlite3.connect(db_path)
    try:
        cur = con.execute(f"SELECT * FROM {table}")  # noqa: S608 - local file
        cols = [d[0] for d in cur.description]
        batches: list[pa.RecordBatch] = []
        while True:
            rows = cur.fetchmany(batch_rows)
            if not rows:
                break
            arrays = [pa.array([r[i] for r in rows]) for i in range(len(cols))]
            batches.append(pa.RecordBatch.from_arrays(arrays, names=cols))
    finally:
        con.close()
    if not batches:
        raise ValueError(f"table {table} in {db_path} is empty")
    tbl = pa.Table.from_batches(batches)
    df = spark.createDataFrame(tbl.to_pandas())
    return df.repartition(partitions) if partitions else df
