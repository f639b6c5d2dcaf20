"""Single-pass per-column statistical profile (the A1 operator).

Parity target: DuckDB ``SUMMARIZE`` as consumed by dataops/app/profile.py:44-48
(fields used downstream: column_name, column_type, min, max, null_percentage —
dataops/app/profile.py:26-34). We produce the full SUMMARIZE-shaped battery:
count, nulls, null_percentage, min, max, avg, std, distinct, q25/q50/q75.

Scale design: the default (approx) battery is ONE ``df.agg`` pass for every
column — a single scan + a single-row reduction, no per-column jobs, since
``approx_count_distinct`` is a plain HLL aggregate. min/max are emitted as
strings (heterogeneous column types in one profile table — same as
SUMMARIZE); numeric moments as doubles. Quantiles are ``percentile_approx``
(mergeable sketch) — the 100 TB path: single-pass, shuffle-free reductions.

``exact=True`` (oracle-reproducible: exact count_distinct / exact
percentile / decimal-exact mean) runs ONE NARROW AGGREGATE PER COLUMN and
unions the rows instead: multiple exact ``count_distinct`` columns in one
aggregate trigger Catalyst's Expand rewrite, which multiplies every OTHER
aggregate's input (the exact-percentile sort buffers included) by
n_distinct_aggs + 1 — measured 17 s vs 2.5 s for the 4-column lineitem
battery at sf0.1. Per-column jobs each scan ONE pruned parquet column
(same total I/O as the wide scan, columnar) with a single-distinct plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

PROFILE_COLUMNS = [
    "column_name", "column_type", "count", "nulls", "null_percentage",
    "min", "max", "avg", "std", "distinct", "q25", "q50", "q75", "is_numeric",
]


def _battery(field: T.StructField, exact: bool, with_distinct: bool = True) -> list[Column]:
    c = F.col(field.name)
    name = field.name
    numeric = isinstance(field.dataType, _NUMERIC)
    double_c = c.cast("double") if numeric else F.lit(None).cast("double")
    pcts = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    if not numeric:
        qs = F.lit(None).cast("array<double>")
    elif exact:
        qs = F.percentile(double_c, pcts)
    else:
        qs = F.percentile_approx(double_c, pcts)
    if exact and numeric:
        # decimal-exact mean: reproducible across engines/partition orders
        # for inputs with <= 6 decimal digits (cf. queries/relational.py note)
        avg = F.sum(c.cast("decimal(30,6)")).cast("double") / F.count(c)
    else:
        avg = F.avg(double_c)
    out = [
        F.count(c).alias(f"{name}__count"),
        F.count(F.when(c.isNull(), 1)).alias(f"{name}__nulls"),
        F.min(c).cast("string").alias(f"{name}__min"),
        F.max(c).cast("string").alias(f"{name}__max"),
        avg.alias(f"{name}__avg"),
        F.stddev_samp(double_c).alias(f"{name}__std"),
        qs.alias(f"{name}__qs"),
    ]
    if with_distinct:
        distinct = F.count_distinct(c) if exact else F.approx_count_distinct(c)
        out.append(distinct.alias(f"{name}__distinct"))
    return out


def _row_struct(f_: T.StructField) -> Column:
    n = f_.name
    numeric = isinstance(f_.dataType, _NUMERIC)
    return F.struct(
        F.lit(n).alias("column_name"),
        F.lit(f_.dataType.simpleString()).alias("column_type"),
        (F.col(f"{n}__count") + F.col(f"{n}__nulls")).alias("count"),
        F.col(f"{n}__nulls").alias("nulls"),
        (
            F.col(f"{n}__nulls")
            * F.lit(100.0)
            / (F.col(f"{n}__count") + F.col(f"{n}__nulls"))
        ).alias("null_percentage"),
        F.col(f"{n}__min").alias("min"),
        F.col(f"{n}__max").alias("max"),
        F.col(f"{n}__avg").alias("avg"),
        F.col(f"{n}__std").alias("std"),
        F.col(f"{n}__distinct").alias("distinct"),
        F.col(f"{n}__qs").getItem(0).alias("q25"),
        F.col(f"{n}__qs").getItem(1).alias("q50"),
        F.col(f"{n}__qs").getItem(2).alias("q75"),
        F.lit(numeric).alias("is_numeric"),
    )


def profile(df: DataFrame, columns: list[str] | None = None, exact: bool = False) -> DataFrame:
    """One row per column: the SUMMARIZE-shaped profile table."""
    fields = [f for f in df.schema.fields if columns is None or f.name in columns]
    if exact:
        # Per-column narrow plans (see module docstring). Even ONE exact
        # count_distinct mixed with other aggregates triggers the Expand
        # rewrite (2x input rows through every buffer, exact-percentile
        # sorts included), so the distinct count gets its own Expand-free
        # aggregate, cross-joined back (1 row x 1 row). All branches are
        # independent stages of one union job — they run concurrently.
        parts = []
        for f_ in fields:
            col_df = df.select(f_.name)
            stats = col_df.agg(*_battery(f_, exact, with_distinct=False))
            distinct = col_df.agg(
                F.count_distinct(F.col(f_.name)).alias(f"{f_.name}__distinct")
            )
            parts.append(
                stats.crossJoin(distinct).select(_row_struct(f_).alias("p"))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.select("p.*")

    aggs: list[Column] = []
    for f_ in fields:
        aggs.extend(_battery(f_, exact))
    wide = df.agg(*aggs)
    rows = [_row_struct(f_) for f_ in fields]
    return (
        wide.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
    )
