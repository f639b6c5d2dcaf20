"""As-of (point-in-time) join: for each left row, the most recent right row
with right.ts <= left.ts, per key — the canonical feature-engineering join
(features as of decision time, no future leakage).

Spark has no native ASOF JOIN. The standard range-join formulation
(non-equi `r.ts <= l.ts` + window max) explodes to O(|L|*|R|) per key. This
implementation is the union + carry-forward shape instead:

1. tag right rows src=0, left rows src=1; union into one relation;
2. sort within each key by (ts, src) — a right row at the same instant
   sorts BEFORE the left row, matching `<=` semantics;
3. `last(right_payload, ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT
   carries the latest right payload forward;
4. keep left rows.

Cost: ONE shuffle of |L|+|R| rows on the key (the same partitioning a
shuffle join would need) and one within-partition sort — linear, skew-safe
(a hot key is one sorted run), and whole-stage codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Left as-of join. Right rows must be unique per (key, ts) — either
    dedupe upstream, or pass ``right_tiebreak`` columns: the carry-forward
    sort then orders equal-instant right rows by them and ``last`` picks
    the greatest (argmax-by-tiebreak semantics, e.g. ``["event_id"]`` for
    latest-writer-wins) WITHOUT a pre-aggregation — saving the dedupe's
    extra shuffle; the whole join stays ONE exchange on the key.
    Returns all left columns plus ``<c>_asof`` for each payload column and
    ``ts_asof`` (the matched right timestamp; null if no earlier right row).
    """
    payload = payload if payload is not None else [
        c for c in right.columns if c not in (on, right_ts)
    ]
    tiebreak = right_tiebreak or []
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__src"),
        *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(tiebreak)],
        F.struct(
            F.col(right_ts).alias("ts_asof"),
            *[F.col(c).alias(f"{c}_asof") for c in payload],
        ).alias("__p"),
    )
    l_cols = left.columns
    l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__src"),
        *[
            F.lit(None).cast(r.schema[f"__tb{i}"].dataType).alias(f"__tb{i}")
            for i in range(len(tiebreak))
        ],
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
    )
    # align schemas for the union: right side gets null left columns
    for c in l_cols:
        if c != on:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    tb_cols = [f"__tb{i}" for i in range(len(tiebreak))]
    proj = [on, "__t", "__src", *tb_cols, "__p", *[c for c in l_cols if c != on]]
    unioned = l.select(*proj).unionByName(r.select(*proj))
    # order: instant, then right-before-left (matches <=), then the right
    # tiebreak (left rows hold NULL there, which cannot reorder them past
    # the src separation)
    w = (
        Window.partitionBy(on)
        .orderBy("__t", "__src", *tb_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__match", F.last("__p", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("__src") == 1).select(
        *[F.col(c) for c in l_cols],
        F.col("__match.ts_asof").alias("ts_asof"),
        *[F.col(f"__match.{c}_asof").alias(f"{c}_asof") for c in payload],
    )
