"""Single-pass per-column statistical profile (the A1 operator).

Parity target: DuckDB ``SUMMARIZE`` as consumed by dataops/app/profile.py:44-48
(fields used downstream: column_name, column_type, min, max, null_percentage —
dataops/app/profile.py:26-34). We produce the full SUMMARIZE-shaped battery:
count, nulls, null_percentage, min, max, avg, std, distinct, q25/q50/q75.

Scale design: ONE ``df.agg`` pass computes every statistic for every column —
a single scan + a single-row reduction, no per-column jobs. min/max are
emitted as strings (heterogeneous column types in one profile table — same as
SUMMARIZE); numeric moments as doubles. By default ``distinct`` is
HyperLogLog (``approx_count_distinct``) and quantiles are ``percentile_approx``
(mergeable sketch) — the 100 TB path: single-pass, shuffle-free reductions.
``exact=True`` switches to exact count_distinct / exact percentile / decimal-
exact mean for engine-reproducible oracle comparison at test scale.
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


def _battery(field: T.StructField, exact: bool) -> list[Column]:
    c = F.col(field.name)
    name = field.name
    numeric = isinstance(field.dataType, _NUMERIC)
    double_c = c.cast("double") if numeric else F.lit(None).cast("double")
    distinct = F.count_distinct(c) if exact else F.approx_count_distinct(c)
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
    return [
        F.count(c).alias(f"{name}__count"),
        F.count(F.when(c.isNull(), 1)).alias(f"{name}__nulls"),
        F.min(c).cast("string").alias(f"{name}__min"),
        F.max(c).cast("string").alias(f"{name}__max"),
        avg.alias(f"{name}__avg"),
        F.stddev_samp(double_c).alias(f"{name}__std"),
        distinct.alias(f"{name}__distinct"),
        qs.alias(f"{name}__qs"),
    ]


def profile(df: DataFrame, columns: list[str] | None = None, exact: bool = False) -> DataFrame:
    """One row per column: the SUMMARIZE-shaped profile table."""
    fields = [f for f in df.schema.fields if columns is None or f.name in columns]
    aggs: list[Column] = []
    for f_ in fields:
        aggs.extend(_battery(f_, exact))
    wide = df.agg(*aggs)

    rows = []
    for f_ in fields:
        n = f_.name
        numeric = isinstance(f_.dataType, _NUMERIC)
        rows.append(
            F.struct(
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
        )
    return (
        wide.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
    )
