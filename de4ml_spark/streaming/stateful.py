"""Stateful streaming variant of the delayed-emission join via
``applyInPandasWithState`` — SURVEY §4.3 option 2.

Use this instead of the native stream-stream join (delayed_join.py) when you
need (a) J4 single-row semantics *in streaming* (last reward per decision —
the built-in join cannot aggregate across matched rows before emission), or
(b) processing-time-timeout emission (closer to the reference's wall-clock
``mz_logical_timestamp() >= d.insert_ms + W`` trigger, main.py:93) instead of
watermark-driven emission.

Parity: join-service/app/main.py:81-96 with J4 collapse
(join-service/README.md:116-124) — one output row per decision, carrying the
latest in-window reward, emitted after the decision's window closes.

Scale design: state is keyed by the join key and partitioned across
executors by the normal groupBy shuffle; each key holds only its open
decisions + in-window rewards, and event-time timeout discards state as the
watermark advances — memory is O(traffic within W) per executor, identical
to the built-in join's state story. Arrow batches move rows; the Python
worker holds one key-group at a time, never a partition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "key STRING, context STRING, action STRING, probability DOUBLE, "
    "reward DOUBLE, decision_insert_ms DOUBLE, reward_delta_ms DOUBLE"
)
STATE_SCHEMA = (
    "decisions ARRAY<STRUCT<context: STRING, action: STRING, "
    "probability: DOUBLE, d_ms: DOUBLE>>, "
    "rewards ARRAY<STRUCT<reward: DOUBLE, r_ms: DOUBLE>>"
)


def _last_reward_fn(window_ms: int):
    def fn(
        key: tuple[str], pdfs: Iterator["pd.DataFrame"], state: GroupState  # noqa: F821
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        decisions: list[dict[str, Any]]
        rewards: list[dict[str, Any]]
        if state.exists:
            (dec_rows, rew_rows) = state.get
            decisions = [dict(r.asDict()) if hasattr(r, "asDict") else dict(r) for r in (dec_rows or [])]
            rewards = [dict(r.asDict()) if hasattr(r, "asDict") else dict(r) for r in (rew_rows or [])]
        else:
            decisions, rewards = [], []

        max_ms = 0.0
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                ms = float(row.event_ms)
                max_ms = max(max_ms, ms)
                if row.side == "d":
                    decisions.append(
                        {
                            "context": row.context,
                            "action": row.action,
                            "probability": float(row.probability),
                            "d_ms": ms,
                        }
                    )
                else:
                    rewards.append({"reward": float(row.reward), "r_ms": ms})

        out_rows = []
        if state.exists or decisions or rewards:
            # watermark (ms) drives both emission and state expiry
            wm = state.getCurrentWatermarkMs()
            still_open = []
            for d in decisions:
                if wm >= d["d_ms"] + window_ms:
                    matches = [
                        r
                        for r in rewards
                        if d["d_ms"] <= r["r_ms"] <= d["d_ms"] + window_ms
                    ]
                    if matches:
                        best = max(matches, key=lambda r: (r["r_ms"], r["reward"]))
                        out_rows.append(
                            (key[0], d["context"], d["action"], d["probability"],
                             best["reward"], d["d_ms"], best["r_ms"] - d["d_ms"])
                        )
                    else:
                        out_rows.append(
                            (key[0], d["context"], d["action"], d["probability"],
                             0.0, d["d_ms"], None)
                        )
                else:
                    still_open.append(d)
            # a reward is droppable once no open decision's window can reach it
            min_open = min((d["d_ms"] for d in still_open), default=None)
            still_rewards = (
                []
                if min_open is None
                else [r for r in rewards if r["r_ms"] >= min_open]
            )
            if still_open or still_rewards:
                state.update((still_open, still_rewards))
                state.setTimeoutTimestamp(
                    int(min(d["d_ms"] for d in still_open) + window_ms)
                    if still_open
                    else int(wm + window_ms)
                )
            elif state.exists:
                state.remove()

        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "key", "context", "action", "probability",
                    "reward", "decision_insert_ms", "reward_delta_ms",
                ],
            )

    return fn


def streaming_last_reward(
    decisions: DataFrame, rewards: DataFrame, window_ms: int = 10_000
) -> DataFrame:
    """Streaming J4: union the two inputs into one keyed stream (the state
    function needs both sides in one group), watermark on event time, then
    ``applyInPandasWithState`` keyed by ``key``.

    ``decisions``: key, context, action, probability, d_ts (timestamp)
    ``rewards``:   key, reward, r_ts (timestamp)
    Output: one row per decision once its window closes.
    """
    d = decisions.select(
        "key",
        F.lit("d").alias("side"),
        "context",
        "action",
        "probability",
        F.lit(None).cast("double").alias("reward"),
        F.col("d_ts").alias("event_ts"),
        (F.unix_micros(F.col("d_ts").cast("timestamp")) / 1000).alias("event_ms"),
    )
    r = rewards.select(
        "key",
        F.lit("r").alias("side"),
        F.lit(None).cast("string").alias("context"),
        F.lit(None).cast("string").alias("action"),
        F.lit(None).cast("double").alias("probability"),
        "reward",
        F.col("r_ts").alias("event_ts"),
        (F.unix_micros(F.col("r_ts").cast("timestamp")) / 1000).alias("event_ms"),
    )
    unioned = d.unionByName(r).withWatermark("event_ts", f"{window_ms} milliseconds")
    return unioned.groupBy("key").applyInPandasWithState(
        _last_reward_fn(window_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
