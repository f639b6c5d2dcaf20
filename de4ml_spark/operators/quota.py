"""Quota-capped admission: per (user, day), walk events in time order and
accept each iff the day's accepted total stays within the quota —
rejected events do NOT consume budget, which is what makes the running
total a recurrence (state = total of previously ACCEPTED values, not a
window sum): the third member of the repo's recursive per-key family
(trailing throttle = time recurrence, capped sessions = session-start
recurrence, quota admission = value recurrence).

Arithmetic is integer cents (CAST(ROUND(value*100) AS BIGINT)) so the
running compare is exact and engine-identical — a double accumulator
would drift between engines after a few thousand adds.

Execution: the sharded per-key Arrow scan (one batch per hash shard,
sort + boundary mask + linear pass — see operators/throttle.py for the
overhead measurements that motivated sharding). Oracle: a linear
recursive CTE that carries the accumulator through an rn+1 self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000


def quota_admission(
    df: DataFrame,
    quota_cents: int = 10_000,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    n_shards: int | None = None,
) -> DataFrame:
    """(key, day, n_accepted, n_rejected, consumed_c) per key-day under
    the admission recurrence; ties at equal timestamps resolve by id.
    ``n_shards`` defaults to the session's defaultParallelism (see
    operators/throttle.py)."""
    import pandas as pd

    if n_shards is None:
        n_shards = df.sparkSession.sparkContext.defaultParallelism or 32
    src = df.select(
        key_col,
        id_col,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__t"),
        F.round(F.col(value_col) * 100).cast("bigint").alias("__vc"),
        (F.abs(F.hash(key_col)) % n_shards).alias("__shard"),
    ).withColumn("__day", (F.col("__t") / US_PER_DAY).cast("bigint"))

    def scan_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from de4ml_spark.operators.throttle import partition_boundary_mask

        pdf = pdf.sort_values(
            [key_col, "__day", "__t", id_col], ignore_index=True
        )
        n = len(pdf)
        # boundary mask, not a keys[i] == k scan loop: a NaN key
        # (nullable int64 -> float64) makes that loop spin forever
        # (NaN == NaN is False so the inner while never advances); the
        # mask gives SQL PARTITION BY null semantics and cannot hang.
        new_grp = partition_boundary_mask(pdf, [key_col, "__day"])
        vcs = pdf["__vc"].to_numpy(dtype="float64")
        starts = np.flatnonzero(new_grp)
        n_grp = len(starts)
        sizes = np.diff(np.append(starts, n))
        acc_a = np.empty(n_grp, dtype=np.int64)
        rej_a = np.empty(n_grp, dtype=np.int64)
        tot_a = np.empty(n_grp, dtype=np.int64)
        if n:
            # fast path: a group whose values are all non-negative and
            # whose plain sum fits the quota accepts everything — no
            # walk needed (cents are exact in float64 far past 2^53/1e2,
            # and NaN values poison their own group's sum/min, routing
            # it to the walk). Only quota-crossing groups pay Python.
            gsum = np.add.reduceat(vcs, starts)
            gmin = np.minimum.reduceat(vcs, starts)
            with np.errstate(invalid="ignore"):
                fast = (gmin >= 0) & (gsum <= quota_cents)
            acc_a[fast] = sizes[fast]
            rej_a[fast] = 0
            tot_a[fast] = gsum[fast].astype(np.int64)
            for g in np.flatnonzero(~fast):
                total = 0
                acc = 0
                lo, hi = starts[g], starts[g] + sizes[g]
                for i in range(lo, hi):
                    v = vcs[i]
                    if total + v <= quota_cents:
                        total += v
                        acc += 1
                acc_a[g] = acc
                rej_a[g] = sizes[g] - acc
                tot_a[g] = int(total)
        return pd.DataFrame(
            {
                key_col: pdf[key_col]
                .iloc[starts]
                .reset_index(drop=True)
                .astype("Int64"),
                "day_num": pdf["__day"]
                .iloc[starts]
                .reset_index(drop=True)
                .astype("Int64"),
                "n_accepted": acc_a,
                "n_rejected": rej_a,
                "consumed_c": tot_a,
            }
        )

    scanned = (
        src.repartition(n_shards, "__shard")
        .groupBy("__shard")
        .applyInPandas(
            scan_shard,
            f"{key_col} BIGINT, day_num BIGINT, n_accepted BIGINT, "
            "n_rejected BIGINT, consumed_c BIGINT",
        )
    )
    return scanned.select(
        key_col,
        F.date_from_unix_date(F.col("day_num").cast("int")).alias("day"),
        "n_accepted",
        "n_rejected",
        "consumed_c",
    )


def quota_admission_oracle_sql(quota_cents: int = 10_000) -> str:
    """Linear recursive-CTE twin over ``events``: the accumulator rides
    the recursion through an rn+1 self-join (depth = max events per
    key-day)."""
    return f"""
WITH RECURSIVE ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(ROUND(value * 100) AS BIGINT) AS vc,
         ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
),
walk AS (
  SELECT user_id, day, rn,
         CASE WHEN vc <= {quota_cents} THEN vc ELSE CAST(0 AS BIGINT) END
           AS total,
         CASE WHEN vc <= {quota_cents} THEN 1 ELSE 0 END AS acc
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.day, e.rn,
         CASE WHEN w.total + e.vc <= {quota_cents}
              THEN w.total + e.vc ELSE w.total END,
         CASE WHEN w.total + e.vc <= {quota_cents} THEN 1 ELSE 0 END
  FROM walk w
  -- IS NOT DISTINCT FROM: the NULL-user group is ONE key on the Spark
  -- side (boundary mask); a plain equi-join drops its recursion
  JOIN ev e ON e.user_id IS NOT DISTINCT FROM w.user_id
           AND e.day = w.day AND e.rn = w.rn + 1
)
SELECT user_id, day,
       CAST(SUM(acc) AS BIGINT) AS n_accepted,
       CAST(COUNT(*) - SUM(acc) AS BIGINT) AS n_rejected,
       -- total at the LAST step, not MAX: with negative values
       -- (refunds) the accepted running total is non-monotone, so
       -- MAX(total) overshoots the final consumed budget (round-14
       -- negative-shard parity finding); identical to MAX on
       -- non-negative data
       arg_max(total, rn) AS consumed_c
FROM walk
GROUP BY user_id, day
"""


def streaming_quota_admission(
    events: DataFrame, quota_cents: int = 10_000
) -> DataFrame:
    """Streaming twin over the events shape via
    ``applyInPandasWithState`` keyed by user: cross-batch state is
    (current day, accepted total) — O(1) per key; a new day resets the
    budget. Emits one row PER EVENT with its admission decision (the
    streaming surface is the admit/reject signal itself; the batch twin
    aggregates per day). Contract: event-time-ordered arrival across
    batches, as with streaming_throttle."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__t"),
        F.round(F.col("value") * 100).cast("bigint").alias("__vc"),
    ).withColumn("__day", (F.col("__t") / US_PER_DAY).cast("bigint"))

    def fn(key, pdfs, state: "GroupState"):
        import pandas as pd

        day, total = state.get if state.exists else (None, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["__day", "__t", "event_id"])
        accepted = []
        for d, vc in zip(batch["__day"].to_numpy(), batch["__vc"].to_numpy()):
            if day is None or d != day:
                day, total = int(d), 0
            ok = total + vc <= quota_cents
            if ok:
                total += int(vc)
            accepted.append(ok)
        state.update((day, int(total)))
        out = batch[["user_id", "event_id"]].copy()
        out["accepted"] = accepted
        yield out

    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        "user_id BIGINT, event_id BIGINT, accepted BOOLEAN",
        "day BIGINT, total BIGINT",
        "append",
        GroupStateTimeout.NoTimeout,
    )
