"""File-format sources/sinks beyond Parquet: JSON-lines and CSV with
contract-driven schemas and explicit malformed-row policy.

The reference lands HTTP JSON into a row store and ETLs it onward
(logging-service/app/etl.py, lib/storage.py); at lake scale the landing
zone is files. These readers make the schema and the bad-record policy
explicit — never schema inference in production paths (inference is a full
extra pass over the data and can silently widen types between runs).

Scale notes:
- Uncompressed JSONL/CSV are line-splittable: Spark assigns file ranges to
  tasks, so a single huge file still parallelizes. gzip is NOT splittable
  (one task per file) — land .gz in many small-ish files or re-compress to
  zstd/bzip2 if splitting matters.
- Neither format supports predicate/column pushdown — a scan decodes every
  row. These are ingest formats: read once, validate, write Parquet
  (etl/pipeline.py), query the Parquet.
- PERMISSIVE mode keeps malformed rows in ``corrupt_col`` for audit (the
  reference's validation split keeps rejects too); DROPMALFORMED silently
  drops; FAILFAST aborts the job on first bad record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"
_MODES = ("PERMISSIVE", "DROPMALFORMED", "FAILFAST")


def _with_corrupt(schema: StructType, mode: str, corrupt_col: str) -> StructType:
    if mode == "PERMISSIVE" and corrupt_col not in schema.fieldNames():
        return schema.add(corrupt_col, StringType(), True)
    return schema


def _check_mode(mode: str) -> str:
    mode = mode.upper()
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}")
    return mode


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "PERMISSIVE",
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """JSON-lines reader with explicit schema and malformed-row policy.
    With PERMISSIVE, rows that fail to parse land whole in ``corrupt_col``
    (NULL for good rows) so ingest can split valid/reject exactly like
    contracts/validation.py does for semantic rules."""
    mode = _check_mode(mode)
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    schema = _with_corrupt(schema, mode, corrupt_col)
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    mode: str = "PERMISSIVE",
    corrupt_col: str = CORRUPT_COL,
    delimiter: str = ",",
) -> DataFrame:
    """CSV reader with explicit schema and malformed-row policy."""
    mode = _check_mode(mode)
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    schema = _with_corrupt(schema, mode, corrupt_col)
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("delimiter", delimiter)
        .csv(path)
    )


def split_corrupt(
    df: DataFrame, corrupt_col: str = CORRUPT_COL
) -> tuple[DataFrame, DataFrame]:
    """(valid, rejects) from a PERMISSIVE read. Rejects keep the FULL row
    (parsed-null fields + the raw line in ``corrupt_col``).

    The input is persist()ed here: Spark refuses plans whose pruned scan
    would reference ONLY the corrupt-record column of a raw JSON/CSV read
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the documented
    pattern is to cache the parsed result and query that. This is the
    ingest path: both sides get written out (Parquet + reject audit)
    immediately, after which the caller should ``df.unpersist()``."""
    if corrupt_col not in df.columns:
        return df, df.limit(0)
    df = df.persist()
    valid = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    rejects = df.filter(F.col(corrupt_col).isNotNull())
    return valid, rejects


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, compression: str | None = None
) -> None:
    w = df.write.mode("overwrite").option("header", str(header).lower())
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def write_orc(df: DataFrame, path: str, compression: str = "zlib") -> None:
    """ORC sink — the columnar alternative when the downstream stack is
    Hive/Trino-centric. Same predicate-pushdown/column-pruning story as
    parquet (ORC carries min/max/bloom indexes natively)."""
    df.write.mode("overwrite").option("compression", compression).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (schema from file metadata; filters and projections push
    down exactly as with parquet — asserted in tests/test_sources.py)."""
    return spark.read.orc(path)
