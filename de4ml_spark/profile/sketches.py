"""Mergeable distinct-count sketches (Apache DataSketches HLL, Spark
built-ins ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``).

The 100 TB pattern for distinct counts: computing exact COUNT(DISTINCT)
over a year of events rescans everything per question. Instead, materialize
ONE small binary sketch per (grain, group) — e.g. per day per event type —
then answer any coarser rollup (weekly/monthly/total, any group subset) by
merging sketches: bytes-sized reads, associative, re-aggregatable in a
streaming ``foreachBatch`` too. Standard error ~1.04/sqrt(2^lgK)
(~1.6% at the default lgK=12); estimates are deterministic functions of the
merged sketch, so rollup-then-estimate is reproducible run to run and
merge order does not matter.

All JVM-side Column expressions — no Python in the hot path; the sketch
column is a plain BINARY, so it persists through parquet (the sketch table
IS the incremental index)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    value_col: str,
    by: list[str],
    lgk: int = 12,
    out_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per ``by`` group.
    This is the materialization step — write the result to the warehouse at
    the finest grain you will ever query."""
    return df.groupBy(*by).agg(
        F.expr(f"hll_sketch_agg({value_col}, {lgk})").alias(out_col)
    )


def rollup_sketches(
    sketches: DataFrame,
    by: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge fine-grained sketches to a coarser grouping (``by`` may be a
    subset of the materialization keys, or empty for a grand total) —
    reads sketch bytes, never the raw data."""
    agg = F.expr(f"hll_union_agg({sketch_col})").alias(sketch_col)
    if by:
        return sketches.groupBy(*by).agg(agg)
    return sketches.agg(agg)


def with_estimate(
    sketches: DataFrame,
    sketch_col: str = "sketch",
    out_col: str = "n_distinct",
) -> DataFrame:
    """Append the distinct-count estimate and drop the binary column."""
    return sketches.withColumn(
        out_col, F.expr(f"hll_sketch_estimate({sketch_col})")
    ).drop(sketch_col)
