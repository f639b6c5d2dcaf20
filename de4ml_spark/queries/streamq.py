"""Batch twins of the streaming operators (J1/J3/J4) over the ``events``
table — the deterministic oracle surface for the delayed-emission join
semantics (SURVEY §4.3 option 3; FIXTURES.md §4 driver-testdata mapping:
``view`` events play decisions, ``click`` events play rewards, ``user_id``
is the key, W = 1 day so the sf-scaled data exercises all match cases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de4ml_spark.session import load_table
from de4ml_spark.streaming.delayed_join import (
    delayed_emission_join,
    last_reward_per_decision,
    override_anti_join,
)

W_MS = 86_400_000  # 1 day


def _decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("key"),
        F.col("props").alias("context"),
        F.col("event_type").alias("action"),
        F.col("value").alias("probability"),
        F.col("ts").alias("d_ts"),
    )


def _rewards(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("key"),
        F.col("value").alias("reward"),
        F.col("ts").alias("r_ts"),
    )


_CTE = """
WITH d AS (
  SELECT user_id AS key, props AS context, event_type AS action,
         value AS probability, ts AS d_ts
  FROM events WHERE event_type = 'view'
),
r AS (
  SELECT user_id AS key, value AS reward, ts AS r_ts
  FROM events WHERE event_type = 'click'
)
"""


def delayed_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return delayed_emission_join(
        _decisions(spark, sf_dir), _rewards(spark, sf_dir), window_ms=W_MS
    )


DELAYED_JOIN_SQL = _CTE + """
SELECT
  d.key, d.context, d.action, d.probability,
  COALESCE(r.reward, 0.0) AS reward,
  epoch_us(d.d_ts) / 1000 AS decision_insert_ms,
  epoch_us(r.r_ts) / 1000 - epoch_us(d.d_ts) / 1000 AS reward_delta_ms
FROM d LEFT JOIN r
  ON d.key = r.key
 AND r.r_ts >= d.d_ts
 AND r.r_ts <= d.d_ts + INTERVAL 1 DAY
"""


def last_reward_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return last_reward_per_decision(
        _decisions(spark, sf_dir), _rewards(spark, sf_dir), window_ms=W_MS
    )


LAST_REWARD_SQL = _CTE + """
SELECT key, context, action, probability, reward, decision_insert_ms,
       reward_delta_ms
FROM (
  SELECT
    d.key, d.context, d.action, d.probability,
    COALESCE(r.reward, 0.0) AS reward,
    epoch_us(d.d_ts) / 1000 AS decision_insert_ms,
    epoch_us(r.r_ts) / 1000 - epoch_us(d.d_ts) / 1000 AS reward_delta_ms,
    ROW_NUMBER() OVER (
      PARTITION BY d.key, d.d_ts
      ORDER BY r.r_ts DESC NULLS LAST, r.reward DESC NULLS LAST
    ) AS rn
  FROM d LEFT JOIN r
    ON d.key = r.key
   AND r.r_ts >= d.d_ts
   AND r.r_ts <= d.d_ts + INTERVAL 1 DAY
) WHERE rn = 1
"""


def override_anti_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: drop decisions whose key had an 'error' event on 2024-01-05."""
    ev = load_table(spark, sf_dir, "events")
    overrides = ev.filter(
        (F.col("event_type") == "error")
        & (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-06 00:00:00").cast("timestamp_ntz"))
    ).select(F.col("user_id").alias("key"))
    d = _decisions(spark, sf_dir).select(
        "key", "action", "probability", F.col("d_ts")
    )
    return override_anti_join(d, overrides).select(
        "key",
        "action",
        "probability",
        (F.unix_micros(F.col("d_ts").cast("timestamp")) / 1000).alias(
            "decision_insert_ms"
        ),
    )


OVERRIDE_ANTI_SQL = """
SELECT user_id AS key, event_type AS action, value AS probability,
       epoch_us(ts) / 1000 AS decision_insert_ms
FROM events d
WHERE event_type = 'view'
  AND NOT EXISTS (
    SELECT 1 FROM events o
    WHERE o.event_type = 'error'
      AND o.user_id = d.user_id
      AND o.ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND o.ts <  TIMESTAMP '2024-01-06 00:00:00'
  )
"""


REGISTRY: dict[str, dict] = {
    "delayed_join_events": {"fn": delayed_join_events, "sql": DELAYED_JOIN_SQL},
    "last_reward_events": {"fn": last_reward_events, "sql": LAST_REWARD_SQL},
    "override_anti_events": {"fn": override_anti_events, "sql": OVERRIDE_ANTI_SQL},
}
