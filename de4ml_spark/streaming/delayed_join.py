"""The flagship streaming operator: event-time windowed LEFT OUTER equi-join
with delayed emission and default-value fill (J1), plus the J3/J4 variants.

Parity target (citations relative to /root/reference/):
- join-service/app/main.py:81-96 — ``decisions_window d LEFT JOIN
  rewards_window r ON d.key = r.key`` emitted once the logical clock passes
  ``d.insert_ms + W`` (main.py:93), unmatched ⇒ ``COALESCE(r.reward, 0.0)``
  (main.py:88), ``reward_delta_ms = r.insert_ms - d.insert_ms`` (main.py:90).
- Code-derived match window (SURVEY §4.3): a reward joins iff
  ``r_ts ∈ [d_ts, d_ts + W]`` on the same key. Multiple in-window rewards ⇒
  multiple output rows; the README's reward-before-decision reading
  (join-service/README.md:121-124) is a documented variant, not implemented.
- J3 override anti-join: join-service/README.md:108-115.
- J4 last-reward-per-decision: join-service/README.md:116-124.

Spark realization: the native stream-stream left outer join. Watermark W on
both inputs bounds join state exactly like Materialize's retention windows
(main.py:59-76); unmatched decisions emit once the watermark passes
``d_ts + W`` — the same "hold the decision for its window, then emit exactly
once" contract, driven by event flow instead of a wall clock (acceptable per
the consumer contract main.py:117-119, which only reads inserts).

Scale design: join state is partitioned by key across executors (state store
per shuffle partition); watermarks expire state so memory is O(traffic within
W), not O(history). The same builder works on batch DataFrames — that batch
twin is what the DuckDB oracle checks deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OUTPUT_COLUMNS = [
    "key",
    "context",
    "action",
    "probability",
    "reward",
    "decision_insert_ms",
    "reward_delta_ms",
]


def _join_cond(
    d: DataFrame,
    r: DataFrame,
    key: str,
    window_ms: int,
    include_earlier: bool = False,
) -> Column:
    w = F.expr(f"INTERVAL {window_ms} MILLISECONDS")
    lo = d["d_ts"] - w if include_earlier else d["d_ts"]
    return (
        (d["key"] == r["r_key"])
        & (r["r_ts"] >= lo)
        & (r["r_ts"] <= d["d_ts"] + w)
    )


def delayed_emission_join(
    decisions: DataFrame,
    rewards: DataFrame,
    window_ms: int = 10_000,
    default_reward: float = 0.0,
    include_earlier_rewards: bool = False,
) -> DataFrame:
    """J1. ``decisions``: key, context, action, probability, d_ts (timestamp).
    ``rewards``: key, reward, r_ts (timestamp). Works on streaming inputs
    (watermarks applied) and batch inputs (deterministic twin) alike.

    ``include_earlier_rewards`` selects the README's documented variant
    (join-service/README.md:121-124): a reward up to W BEFORE the decision
    also matches (``r_ts ∈ [d_ts - W, d_ts + W]``). Default pins the
    code-derived semantics (``r_ts ∈ [d_ts, d_ts + W]`` — SURVEY §4.3);
    the README itself asks whether the earlier-reward behavior is correct,
    so both are explicit here. Streaming note: the variant widens the
    rewards watermark to 2W so pre-decision rewards are still in state.

    Output schema mirrors join-service/app/main.py:83-96 with millisecond
    epoch columns derived from the event-time timestamps.
    """
    streaming = decisions.isStreaming or rewards.isStreaming
    wm = f"{window_ms} milliseconds"
    d = decisions
    r = rewards.select(
        F.col("key").alias("r_key"),
        F.col("reward").alias("r_reward"),
        F.col("r_ts"),
    )
    if streaming:
        d = d.withWatermark("d_ts", wm)
        r = r.withWatermark(
            "r_ts", f"{2 * window_ms} milliseconds" if include_earlier_rewards else wm
        )
    joined = d.join(
        r,
        _join_cond(d, r, "key", window_ms, include_earlier_rewards),
        "leftOuter",
    )
    ms = lambda c: (F.unix_micros(F.col(c).cast("timestamp")) / 1000).cast("double")  # noqa: E731
    return joined.select(
        d["key"],
        "context",
        "action",
        "probability",
        F.coalesce(r["r_reward"], F.lit(default_reward)).alias("reward"),
        ms("d_ts").alias("decision_insert_ms"),
        (ms("r_ts") - ms("d_ts")).alias("reward_delta_ms"),
    )


def override_anti_join(
    joined: DataFrame, overrides: DataFrame, key: str = "key"
) -> DataFrame:
    """J3 (join-service/README.md:108-115): drop joined rows whose key was
    overridden. Broadcast the (small) override set to avoid a shuffle."""
    return joined.join(F.broadcast(overrides.select(key).distinct()), key, "left_anti")


def last_reward_per_decision(
    decisions: DataFrame,
    rewards: DataFrame,
    window_ms: int = 10_000,
    default_reward: float = 0.0,
) -> DataFrame:
    """J4 (join-service/README.md:116-124): collapse J1 multiplicity to one
    row per decision, keeping the reward with the greatest ``r_ts``.

    Batch path: window row_number over (key, d_ts) — one shuffle on the
    partition key. (The streaming variant needs arbitrary stateful
    processing — applyInPandasWithState — because the built-in join cannot
    aggregate across matched rows; see streaming/stateful.py.)
    """
    from pyspark.sql import Window

    d = decisions
    r = rewards.select(
        F.col("key").alias("r_key"),
        F.col("reward").alias("r_reward"),
        F.col("r_ts"),
    )
    joined = d.join(r, _join_cond(d, r, "key", window_ms), "leftOuter")
    w = Window.partitionBy(d["key"], d["d_ts"]).orderBy(
        F.desc_nulls_last("r_ts"), F.desc_nulls_last("r_reward")
    )
    ms = lambda c: (F.unix_micros(F.col(c).cast("timestamp")) / 1000).cast("double")  # noqa: E731
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            d["key"],
            "context",
            "action",
            "probability",
            F.coalesce(F.col("r_reward"), F.lit(default_reward)).alias("reward"),
            ms("d_ts").alias("decision_insert_ms"),
            (ms("r_ts") - ms("d_ts")).alias("reward_delta_ms"),
        )
    )
