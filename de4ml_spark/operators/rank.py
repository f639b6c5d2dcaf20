"""Distributed exact global rank / NTILE — the shared operator behind
every total-order site in the catalog (quantile normalization's pooled
rank, RFM's three NTILEs, k-core's median pick).

Problem: ``Window.orderBy(...)`` with no ``partitionBy`` forces Spark
to move the ENTIRE frame to one partition ("Moving all data to a
single partition" in the logs) — at 100 TB that is one executor
sorting the corpus. The classic distributed recipe replaces it with:

1. ``repartitionByRange(n, *keys)`` — a sampled range partitioner
   spreads the frame across ``n`` partitions whose id order matches
   key order (RangePartitioner assigns partition *i* the *i*-th key
   range; its reservoir sample is seeded per-partition, so the
   boundaries are deterministic for a given input).
2. a per-partition ``row_number`` over ``Window.partitionBy(_pid)``
   — every window partition is one range partition, never the corpus.
3. per-partition counts (≤ *n* rows — a bounded model-fit collect,
   same class as the IVF centroid fit), cumulative offsets on the
   driver, broadcast back and added to the local row numbers.

Rank correctness does not depend on where the sampled boundaries land
— only on the keys being a total order (callers pass a tie-broken key
list, e.g. ``(n_chars, doc_id)``), because equal keys can never
straddle a range boundary when keys are unique.

NTILE is derived from the global rank with the standard SQL
allocation (first ``N mod k`` tiles get ``ceil(N/k)`` rows), matching
both Spark's and DuckDB's NTILE exactly.

Reference parity: the reference delegates ORDER BY / NTILE to DuckDB
(dataops/app/queries.py); this module is the Spark-native equivalent
that keeps the sort distributed.
"""

from __future__ import annotations

import decimal

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from de4ml_spark.cache import defer_release

_PID = "__rank_pid"
_OFF = "__rank_off"


def _persist_ranged(df: DataFrame) -> DataFrame:
    """Persist a range-partitioned intermediate and register it for
    deferred release (``cache.drain_deferred``) — the consuming result
    is corpus-sized, so ``release_after``'s eager checkpoint is not an
    option here (it would materialize the whole corpus twice)."""
    cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    defer_release(cached)
    return cached


def with_global_rank(
    df: DataFrame,
    keys: list,
    out_col: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append an exact 1-based global ``row_number`` over ``keys``
    without ever forming a single-partition sort.

    ``keys`` must be a total order (append a unique tie-break column).
    Accepts column names or Columns (e.g. ``F.col("x").desc()`` — for
    descending keys pass Columns; names sort ascending).

    The returned frame stays range-partitioned on ``keys`` — callers
    that follow with a window over the same order can reuse the
    partitioning. Cost: one range shuffle + one count job over the
    persisted ranged frame; no corpus-sized collect (the only collect
    is the ≤ num_partitions per-partition counts).
    """
    ranked, _total = global_rank_and_total(
        df, keys, out_col, num_partitions
    )
    return ranked


def global_rank_and_total(
    df: DataFrame,
    keys: list,
    out_col: str = "global_rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """``with_global_rank`` that also returns the frame's total row
    count (already known from the offset job — saves callers a
    second count scan when they need N alongside the rank)."""
    return _global_rank_with_total(df, keys, out_col, num_partitions)


def _global_rank_with_total(
    df: DataFrame,
    keys: list,
    out_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    ranged = _persist_ranged(
        df.repartitionByRange(n, *cols)
        .withColumn(_PID, F.spark_partition_id())
    )
    # bounded collect: one row per range partition
    counts = ranged.groupBy(_PID).count().collect()
    offsets = []
    acc = 0
    for row in sorted(counts, key=lambda r: r[_PID]):
        offsets.append((row[_PID], acc))
        acc += row["count"]
    off_df = F.broadcast(
        spark.createDataFrame(offsets, f"{_PID} int, {_OFF} long")
    )
    w = Window.partitionBy(_PID).orderBy(*cols)
    ranked = (
        ranged.join(off_df, _PID)
        .withColumn(out_col, F.row_number().over(w) + F.col(_OFF))
        .drop(_PID, _OFF)
    )
    return ranked, acc


def with_global_cumsum(
    df: DataFrame,
    keys: list,
    value_col: str,
    out_col: str = "global_cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append an exact running ``SUM(value_col) OVER (ORDER BY keys
    ROWS UNBOUNDED PRECEDING)`` without a single-partition sort —
    same range-partition recipe as the rank, with per-partition SUM
    offsets instead of counts (the collect is still ≤ one row per
    range partition). ``keys`` must be a total order; pass Columns
    for descending keys (e.g. a Pareto cumulative in revenue-DESC
    order)."""
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    ranged = _persist_ranged(
        df.repartitionByRange(n, *cols)
        .withColumn(_PID, F.spark_partition_id())
    )
    sums_df = ranged.groupBy(_PID).agg(F.sum(value_col).alias("_s"))
    # the offset column carries the SUM's native type (bigint for
    # integral inputs, double for float, decimal(38,s) for decimal) —
    # never truncated through Python int()
    stype = sums_df.schema["_s"].dataType.simpleString()
    if stype.startswith("decimal"):
        zero, conv = decimal.Decimal(0), decimal.Decimal
    elif stype in ("double", "float"):
        zero, conv = 0.0, float
    else:
        zero, conv = 0, int
    sums = sums_df.collect()
    offsets = []
    acc = zero
    for row in sorted(sums, key=lambda r: r[_PID]):
        offsets.append((row[_PID], conv(acc)))
        acc += row["_s"] if row["_s"] is not None else zero
    off_df = F.broadcast(
        spark.createDataFrame(offsets, f"{_PID} int, {_OFF} {stype}")
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.join(off_df, _PID)
        .withColumn(out_col, F.sum(value_col).over(w) + F.col(_OFF))
        .drop(_PID, _OFF)
    )


def with_grouped_rank(
    df: DataFrame,
    groups: list[str],
    keys: list,
    out_col: str = "group_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append an exact 1-based ``row_number`` over ``keys`` WITHIN
    each ``groups`` combination — the distributed replacement for
    ``Window.partitionBy(low_cardinality_group).orderBy(keys)``,
    which puts one whole group on one executor when the group count
    is small (e.g. a handful of document sources over a 100 TB
    corpus).

    Range-partitions on ``groups + keys`` (each group's rows are
    contiguous across ordered partitions), takes per-(partition,
    group) counts (bounded collect: ≤ partitions × groups rows),
    and offsets the per-(partition, group) local row numbers.
    """
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    gcols = [F.col(g) for g in groups]
    kcols = [F.col(k) if isinstance(k, str) else k for k in keys]
    ranged = _persist_ranged(
        df.repartitionByRange(n, *gcols, *kcols)
        .withColumn(_PID, F.spark_partition_id())
    )
    counts = ranged.groupBy(_PID, *groups).count().collect()
    # cumulative offset per group in pid order
    acc: dict[tuple, int] = {}
    offsets = []
    for row in sorted(counts, key=lambda r: r[_PID]):
        gkey = tuple(row[g] for g in groups)
        offsets.append((row[_PID], *gkey, acc.get(gkey, 0)))
        acc[gkey] = acc.get(gkey, 0) + row["count"]
    gtypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    # group columns are renamed in the offset frame so the join can be
    # null-safe on the originals — a plain `on=[_PID, *groups]` inner
    # join silently drops rows whose group key is NULL, which the
    # Window.partitionBy this operator replaces would have kept
    gschema = ", ".join(f"__off_{g} {gtypes[g]}" for g in groups)
    off_df = F.broadcast(
        spark.createDataFrame(
            offsets, f"{_PID} int, {gschema}, {_OFF} long"
        )
    )
    cond = ranged[_PID] == off_df[_PID]
    for g in groups:
        cond = cond & ranged[g].eqNullSafe(off_df[f"__off_{g}"])
    w = Window.partitionBy(_PID, *groups).orderBy(*kcols)
    return (
        ranged.join(off_df, cond)
        .drop(off_df[_PID])
        .drop(*[f"__off_{g}" for g in groups])
        .withColumn(out_col, F.row_number().over(w) + F.col(_OFF))
        .drop(_PID, _OFF)
    )


def ntile_from_rank(rank_col: str, total_col: str, k: int) -> Column:
    """Exact SQL NTILE(k) from a 1-based global rank column and the
    frame's total-row-count column: the first ``N mod k`` tiles take
    ``ceil(N/k)`` rows, the rest ``floor(N/k)``. Integer arithmetic
    only (DIV); matches Spark's and DuckDB's NTILE bit-for-bit,
    including the N < k case (each row its own tile).
    """
    q = f"({total_col} DIV {k})"
    m = f"({total_col} % {k})"
    big = f"({q} + 1)"
    boundary = f"({m} * {big})"
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= {boundary}"
        f" THEN ({rank_col} - 1) DIV {big} + 1"
        f" ELSE {m} + ({rank_col} - 1 - {boundary}) DIV {q} + 1"
        f" END AS INT)"
    )


def with_global_ntile(
    df: DataFrame,
    keys: list,
    k: int,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append an exact global ``NTILE(k) OVER (ORDER BY keys)``
    without a single-partition sort: distributed rank + the closed-
    form tile allocation. ``keys`` must be a total order.
    """
    ranked, total = _global_rank_with_total(
        df, keys, "__gnt_rank", num_partitions
    )
    return ranked.withColumn(
        out_col, ntile_from_rank("__gnt_rank", str(int(total)), k)
    ).drop("__gnt_rank")
