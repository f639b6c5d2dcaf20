"""Sessionization over event streams (gap-based session windows).

Batch path uses ``F.session_window`` (native, codegen); the same expression
works in Structured Streaming with a watermark for state expiry. One shuffle
on the session key — the merge of overlapping windows happens inside the
aggregation, not as a separate pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """One row per (key, session): session_start, session_end (last event),
    n_events, total_value (decimal-exact sum of ``value``)."""
    return (
        df.groupBy(F.col(key), F.session_window(F.col(ts_col), gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            key,
            F.col("sw.start").cast("timestamp_ntz").alias("session_start"),
            "session_end",
            "n_events",
            "total_value",
        )
    )


def capped_sessions(
    df: "DataFrame",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_us: int = 86_400_000_000,
    max_len_us: int = 172_800_000_000,
    n_shards: int | None = None,
) -> "DataFrame":
    """Sessionization with BOTH an inactivity gap and a max-duration cap
    (the web-analytics visit definition: a session breaks after
    ``gap_us`` of silence OR once it has run ``max_len_us`` from its
    first event). The cap makes the split RECURSIVE — whether an event
    starts a session depends on the current session's start, not on any
    fixed window — so, like the trailing throttle, it is inexpressible
    in plain window functions; plain gap-only sessionization
    (``sessionize``) stays the one-window fast path.

    Execution: keys hash into ``n_shards`` shards, one Arrow batch per
    shard (per-key grouping pays an Arrow round trip per key — measured
    ~1.5 ms each); per shard, one sort + key-boundary mask + a single
    linear pass emits (key, session_start_us, session_end_us, n_events)
    per session. The oracle twin replays the recurrence as a recursive
    CTE (see ``capped_sessions_oracle_sql``). ``n_shards`` defaults to
    the session's defaultParallelism (see operators/throttle.py).
    """
    import pandas as pd

    if n_shards is None:
        n_shards = df.sparkSession.sparkContext.defaultParallelism or 32
    src = df.select(
        key_col,
        id_col,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__t"),
        (F.abs(F.hash(key_col)) % n_shards).alias("__shard"),
    )
    out_schema = (
        f"{key_col} BIGINT, session_start_us BIGINT, "
        "session_end_us BIGINT, n_events BIGINT"
    )

    def scan_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        from de4ml_spark.operators.throttle import partition_boundary_mask

        pdf = pdf.sort_values([key_col, "__t", id_col], ignore_index=True)
        # boundary mask, not a keys[i] == k scan: NaN keys (nullable
        # int64 -> float64) never compare equal, which would split every
        # null row into its own session; the mask gives SQL PARTITION BY
        # null semantics (all nulls = one key) and cannot hang.
        new_key = partition_boundary_mask(pdf, [key_col])
        ts = pdf["__t"].to_numpy()
        n = len(pdf)
        key_idx, out_s, out_e, out_c = [], [], [], []
        start = prev = 0
        count = 0
        cur = 0
        for i in range(n):
            t = ts[i]
            if new_key[i]:
                if count:
                    key_idx.append(cur)
                    out_s.append(start)
                    out_e.append(prev)
                    out_c.append(count)
                cur, start, prev, count = i, t, t, 1
            elif t - prev > gap_us or t - start > max_len_us:
                key_idx.append(cur)
                out_s.append(start)
                out_e.append(prev)
                out_c.append(count)
                cur, start, prev, count = i, t, t, 1
            else:
                prev = t
                count += 1
        if count:
            key_idx.append(cur)
            out_s.append(start)
            out_e.append(prev)
            out_c.append(count)
        return pd.DataFrame(
            {
                key_col: pdf[key_col]
                .iloc[key_idx]
                .reset_index(drop=True)
                .astype("Int64"),
                "session_start_us": pd.array(out_s, dtype="int64"),
                "session_end_us": pd.array(out_e, dtype="int64"),
                "n_events": pd.array(out_c, dtype="int64"),
            }
        )

    return (
        src.repartition(n_shards, "__shard")
        .groupBy("__shard")
        .applyInPandas(scan_shard, out_schema)
    )


def streaming_capped_sessions(
    events: "DataFrame",
    gap_us: int = 86_400_000_000,
    max_len_us: int = 172_800_000_000,
) -> "DataFrame":
    """Streaming twin of ``capped_sessions`` via
    ``applyInPandasWithState`` keyed by user: cross-batch state is the
    OPEN session's (start, prev, count) — O(1) per key, never a buffer.
    A gap or duration break emits the closed session and opens a new
    one; the final still-open session per key is emitted only when a
    later event closes it (append-mode semantics, like
    streaming_throttle's contract: event-time-ordered arrival across
    batches; the batch twin is the arbiter for out-of-order history).
    Completes the recursive-scan family's streaming coverage (throttle
    and quota already ship twins)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__t"),
    )

    def fn(key, pdfs, state: "GroupState"):
        import pandas as pd

        start, prev, count = state.get if state.exists else (None, None, 0)
        out_s, out_e, out_c = [], [], []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["__t", "event_id"])
        for t in batch["__t"].to_numpy():
            t = int(t)
            if start is None:
                start, prev, count = t, t, 1
            elif t - prev > gap_us or t - start > max_len_us:
                out_s.append(start)
                out_e.append(prev)
                out_c.append(count)
                start, prev, count = t, t, 1
            else:
                prev = t
                count += 1
        state.update((start, prev, int(count)))
        # nullable Int64: key[0] is None for the NULL-key group (the
        # same partition the batch twin handles), and int64 would raise
        yield pd.DataFrame(
            {
                "user_id": pd.array(
                    [key[0]] * len(out_s), dtype="Int64"
                ),
                "session_start_us": pd.array(out_s, dtype="int64"),
                "session_end_us": pd.array(out_e, dtype="int64"),
                "n_events": pd.array(out_c, dtype="int64"),
            }
        )

    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        "user_id BIGINT, session_start_us BIGINT, "
        "session_end_us BIGINT, n_events BIGINT",
        "start BIGINT, prev BIGINT, count BIGINT",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def capped_sessions_oracle_sql(
    gap_us: int = 86_400_000_000, max_len_us: int = 172_800_000_000
) -> str:
    """Recursive-CTE twin over ``events``: from each session start, the
    next start is the first later event breaking either rule relative to
    the current session."""
    return f"""
WITH RECURSIVE ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
  FROM events
),
starts AS (
  SELECT user_id, t, rn FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.t, e.rn
  FROM starts s
  -- IS NOT DISTINCT FROM: the NULL-user group is ONE key on the Spark
  -- side (boundary mask); a plain equi-join would silently drop its
  -- recursion (round-14 nullkeys parity sweep)
  JOIN ev e ON e.user_id IS NOT DISTINCT FROM s.user_id AND e.rn > s.rn
   AND (e.gap > {gap_us} OR e.t - s.t > {max_len_us})
   AND NOT EXISTS (
     SELECT 1 FROM ev e2
     WHERE e2.user_id IS NOT DISTINCT FROM s.user_id
       AND e2.rn > s.rn AND e2.rn < e.rn
       AND (e2.gap > {gap_us} OR e2.t - s.t > {max_len_us})
   )
),
bounded AS (
  SELECT user_id, t, rn,
         LEAD(rn) OVER (PARTITION BY user_id ORDER BY rn) AS next_rn
  FROM starts
)
SELECT b.user_id, b.t AS session_start_us,
       MAX(e.t) AS session_end_us,
       COUNT(*) AS n_events
FROM bounded b
JOIN ev e ON e.user_id IS NOT DISTINCT FROM b.user_id AND e.rn >= b.rn
         AND (b.next_rn IS NULL OR e.rn < b.next_rn)
GROUP BY b.user_id, b.t
"""
