"""Physical table layout for scale: bucketed/sorted warehouse tables.

At 100 TB the dominant cost of fact⋈fact joins and repeated same-key
aggregations is the shuffle. Bucketing pre-shuffles ONCE at write time:
`spark.table` then reports `HashPartitioning(key, n)` from the bucket spec,
and Catalyst's EnsureRequirements inserts no Exchange for joins/aggs keyed
on the bucket column when both sides agree on bucket count. This is the
standard warehouse layout for star-schema fact tables (reference analogue:
the at-rest Parquet produced by logging-service/app/etl.py:68-71, which has
no layout strategy at all — DuckDB re-hashes per query).

Plan contract (enforced in tests/test_plans.py): a self-join or fact⋈fact
join of two tables bucketed on the join key with equal bucket counts shows
ZERO `Exchange` operators on the bucketed sides.

Bucket-count sizing: target ≈ (table bytes / 256 MB) rounded to a power of
two, held constant across tables that join together (unequal counts fall
back to shuffling the smaller side in Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted-within-bucket) managed
    table. Sorting by the join/agg key additionally removes the Sort step
    of sort-merge joins on that key."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with its bucket spec (spark.table keeps the
    output partitioning; spark.read.parquet on the files would not)."""
    return spark.table(table)


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 256 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target_bytes) files. Streaming sinks and per-batch
    appends accumulate KB-sized files whose per-file open/footer cost
    dominates scans at scale; warehouse maintenance compacts them to
    scan-efficient sizes. Returns the output file count."""
    import math

    # real on-disk bytes via the Hadoop FS API (works for any scheme);
    # optimizer size ESTIMATES inflate compressed parquet and would
    # over-split
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    size = fs.getContentSummary(jpath).getLength()
    n = max(1, math.ceil(size / target_bytes))
    spark.read.parquet(path).repartition(n).write.mode("overwrite").parquet(
        out_path
    )
    return n
