"""End-to-end batch ETL: raw event log -> typed parse -> flatten -> Parquet.

Parity targets (citations relative to /root/reference/):
- S2 append sink (``(ts, data)`` rows, server-assigned epoch-micros ts):
  logging-service/app/lib/storage.py:40-46. Our landing format is JSON-lines
  with the same two-column shape (SQLite driver parity is at the data level,
  SURVEY.md §7.5.5).
- S4 typed parse: logging-service/app/etl.py:30-38.
- S5/S6 Parquet sink/scan: logging-service/app/etl.py:67-71, app/pcat.py:13.
- Additive schema evolution on read: logging-service/app/migrate.py:59-72
  -> ``mergeSchema`` + manifest-aligned projection.

Scale design: the landing zone is append-only JSON-lines partitioned by
ingest date (``dt=YYYY-MM-DD``); ETL reads a partition, parses with
``from_json`` (JVM codegen), flattens with native column expressions, and
writes Parquet partitioned the same way. At 100 TB the per-partition ETL is
embarrassingly parallel and the Parquet writer scales with input splits;
there is no shuffle anywhere in this pipeline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from de4ml_spark.etl.flatten import flatten

RAW_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.LongType(), False),  # epoch micros, server-assigned
        T.StructField("data", T.StringType(), False),  # raw JSON event
    ]
)


def ingest_raw(df_events_json: DataFrame, path: str) -> None:
    """Append raw JSON events with a server-assigned epoch-micros timestamp —
    the S2 sink (storage.py:40-46). ``df_events_json`` has one STRING column
    ``data``.
    """
    (
        df_events_json.withColumn(
            "ts", F.unix_micros(F.current_timestamp())
        )
        .select("ts", "data")
        .write.mode("append")
        .json(path)
    )


def read_raw(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(RAW_SCHEMA).json(path)


def parse_typed(df_raw: DataFrame, struct: T.StructType) -> DataFrame:
    """S4: ``from_json`` with the contract-derived StructType (etl.py:30-38).
    Malformed rows yield a null struct (from_json PERMISSIVE) and are kept —
    the validation layer routes them to rejects.
    """
    return df_raw.select(
        F.col("ts"), F.from_json(F.col("data"), struct).alias("d")
    ).select("ts", "d.*")


def etl(
    spark: SparkSession,
    raw_path: str,
    struct: T.StructType,
    out_path: str,
    manifest: list[str] | None = None,
) -> DataFrame:
    """Full batch ETL: raw JSON-lines -> typed -> flattened -> Parquet.
    Returns the flattened DataFrame (already written)."""
    typed = parse_typed(read_raw(spark, raw_path), struct)
    flat = flatten(typed.drop("ts"), struct, manifest)
    flat.write.mode("overwrite").parquet(out_path)
    return flat


def write_warehouse(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_warehouse(
    spark: SparkSession, path: str, manifest: list[str] | None = None
) -> DataFrame:
    """S6 + schema evolution: ``mergeSchema`` unions all file schemas; the
    manifest projection null-fills columns absent from old files and pins
    column order — the additive-only evolution contract (migrate.py:59-72).
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if manifest:
        have = set(df.columns)
        df = df.select(
            *[
                F.col(c) if c in have else F.lit(None).alias(c)
                for c in manifest
            ]
        )
    return df


def null_safe_key_cond(left_alias: str, right_alias: str, keys):
    """AND-of-eqNullSafe join condition over aliased key columns — the
    MERGE key match where a NULL key is a real (matchable) value."""
    cond = None
    for k in keys:
        c = F.col(f"{left_alias}.{k}").eqNullSafe(
            F.col(f"{right_alias}.{k}")
        )
        cond = c if cond is None else cond & c
    return cond


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str | list[str],
) -> None:
    """Poor-man's MERGE for plain parquet (no table format): rows in
    ``updates`` replace existing rows with the same (composite) key; new
    keys append. Implemented as anti-join + union + rewrite (write to a
    temp dir, then swap). At 100 TB this is what a Delta/Iceberg MERGE does
    under the hood minus the transaction log — the repo standardizes on
    plain parquet because the driver environment has no table-format
    package; the call site is the seam where Delta's ``MERGE INTO`` slots
    in.

    The swap parks the old directory at ``<path>.bak`` before moving the
    new one in and deletes the backup last, so a crash mid-swap leaves
    either the old table (restorable from .bak) or the new one — never
    nothing. Stale ``.bak`` from a previous crash is cleared first.
    """
    import shutil
    import tempfile

    keys = [key] if isinstance(key, str) else list(key)
    current = spark.read.parquet(path)
    # NULL-SAFE key match: a groupBy-derived view legitimately carries a
    # NULL group key, and plain name-list equality would never match it —
    # the stale row would survive every upsert (duplicate NULL-key rows).
    merged = current.alias("c").join(
        updates.alias("u"),
        null_safe_key_cond("c", "u", keys),
        "left_anti",
    ).unionByName(updates)
    tmp = tempfile.mkdtemp(prefix="upsert_") + "/data"
    merged.write.mode("overwrite").parquet(tmp)
    # Swap: park old aside, move new in, delete backup last (crash-safe).
    bak = path.rstrip("/") + ".bak"
    if os.path.exists(bak):
        shutil.rmtree(bak)
    os.rename(path, bak)
    try:
        shutil.move(tmp, path)
    except BaseException:
        os.rename(bak, path)  # restore the old table on failure
        raise
    shutil.rmtree(bak)


def with_provenance(df: DataFrame) -> DataFrame:
    """Append lineage columns: ``__source_file`` (the parquet/json split
    the row came from, via input_file_name — resolved at scan time, so
    it survives joins/filters as long as the row maps to one scan) and
    ``__row_md5`` (md5 over the canonical JSON of all current columns —
    a content fingerprint for cross-snapshot diffing and audit trails).
    Both are map-only; the fingerprint intentionally excludes the
    provenance columns themselves so re-application is idempotent."""
    cols = [c for c in df.columns if not c.startswith("__")]
    return df.withColumn(
        "__source_file", F.input_file_name()
    ).withColumn(
        "__row_md5", F.md5(F.to_json(F.struct(*cols)))
    )
