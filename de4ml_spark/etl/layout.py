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


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Globally range-sorted parquet layout: repartitionByRange assigns
    contiguous key ranges to files, sortWithinPartitions orders inside.
    Each file then covers a narrow key range, so parquet row-group min/max
    stats prune scans for key predicates — the sorted-layout analog of
    partition pruning, without directory explosion for high-cardinality
    keys."""
    part = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    part.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def with_zorder(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16, out: str = "zkey"
) -> DataFrame:
    """Adds a Morton (Z-order) key interleaving two rank-normalized columns
    — cluster a table on TWO dimensions at once so parquet min/max stats
    prune on either. Columns are rank-normalized to [0, 2^bits) with
    percent_rank (arbitrary distributions interleave uniformly), then
    bit-interleaved (one F.expr — see SCALE.md on expression building).
    Write with ``write_sorted(df, path, ["zkey"])`` for the Delta
    OPTIMIZE ZORDER layout on plain parquet.

    Scale note: the rank windows here are global (single-partition sort) —
    fine for a layout/maintenance job; at 100 TB rank against a sampled
    quantile table (approxQuantile -> broadcast bucket lookup) instead.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def norm(c: str) -> "object":
        pr = F.percent_rank().over(Window.orderBy(F.col(c)))
        return (pr * ((1 << bits) - 1)).cast("long")

    interleaved = " | ".join(
        f"(shiftleft(shiftrightunsigned(__za, {i}) & 1, {2 * i + 1}) | "
        f"shiftleft(shiftrightunsigned(__zb, {i}) & 1, {2 * i}))"
        for i in range(bits)
    )
    return (
        df.withColumn("__za", norm(col_a))
        .withColumn("__zb", norm(col_b))
        .withColumn(out, F.expr(interleaved))
        .drop("__za", "__zb")
    )
