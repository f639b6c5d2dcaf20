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


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    tolerance_us: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Left NEAREST-event join: for each left row, the right row with the
    smallest |ts delta| within ``tolerance_us`` microseconds, per key —
    the bidirectional generalization of the as-of join (feature nearest a
    label instant, either side). Ties (equidistant before/after) prefer
    the EARLIER right row; equal-instant right rows order by
    ``right_tiebreak`` and resolve to the greatest for the backward
    candidate and the smallest for the forward candidate (deterministic
    in both engines given a unique tiebreak).

    Same cost model as ``asof_join``: union both sides, ONE shuffle on
    the key, one per-key sort; the backward candidate is
    last(payload, ignoreNulls) over the preceding frame and the forward
    candidate first(payload, ignoreNulls) over the following frame — no
    range join, linear in |L|+|R| per key.

    Returns all left columns plus ``ts_near``/``<c>_near`` for the chosen
    row and ``dist_us`` (null when nothing is inside the tolerance).
    """
    payload = payload if payload is not None else [
        c for c in right.columns if c not in (on, right_ts)
    ]
    tiebreak = right_tiebreak or []
    r = right.select(
        F.col(on),
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("__t"),
        F.lit(0).alias("__src"),
        *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(tiebreak)],
        F.struct(
            F.unix_micros(F.col(right_ts).cast("timestamp")).alias("__rt"),
            *[F.col(c).alias(f"{c}_near") for c in payload],
        ).alias("__p"),
    )
    l_cols = left.columns
    l = left.select(
        "*",
        F.unix_micros(F.col(left_ts).cast("timestamp")).alias("__t"),
        F.lit(1).alias("__src"),
        *[
            F.lit(None).cast(r.schema[f"__tb{i}"].dataType).alias(f"__tb{i}")
            for i in range(len(tiebreak))
        ],
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
    )
    for c in l_cols:
        if c != on:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    tb_cols = [f"__tb{i}" for i in range(len(tiebreak))]
    proj = [on, "__t", "__src", *tb_cols, "__p", *[c for c in l_cols if c != on]]
    unioned = l.select(*proj).unionByName(r.select(*proj))
    base = Window.partitionBy(on).orderBy("__t", "__src", *tb_cols)
    prev = F.last("__p", ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, 0)
    )
    nxt = F.first("__p", ignorenulls=True).over(
        base.rowsBetween(0, Window.unboundedFollowing)
    )
    cand = unioned.select(
        *proj, prev.alias("__prev"), nxt.alias("__next")
    ).filter(F.col("__src") == 1)
    d_prev = F.col("__t") - F.col("__prev.__rt")
    d_next = F.col("__next.__rt") - F.col("__t")
    tol = F.lit(tolerance_us)
    prev_ok = F.col("__prev").isNotNull() & (d_prev <= tol)
    next_ok = F.col("__next").isNotNull() & (d_next <= tol)
    # prefer the earlier row on equidistant ties: prev wins at d_prev<=d_next
    use_prev = prev_ok & (~next_ok | (d_prev <= d_next))
    chosen = F.when(use_prev, F.col("__prev")).when(next_ok, F.col("__next"))
    dist = F.when(use_prev, d_prev).when(next_ok, d_next)
    return (
        cand.withColumn("__chosen", chosen)
        .withColumn("__dist", dist)
        .select(
            *[F.col(c) for c in l_cols],
            F.timestamp_micros(F.col("__chosen.__rt"))
            .cast("timestamp_ntz")
            .alias("ts_near"),
            *[F.col(f"__chosen.{c}_near").alias(f"{c}_near") for c in payload],
            F.col("__dist").alias("dist_us"),
        )
    )
