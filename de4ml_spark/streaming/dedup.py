"""Streaming ingest deduplication: exactly-once semantics for at-least-once
sources (the ingest-side companion of the batch dedup family).

``dropDuplicatesWithinWatermark`` keeps per-key state only until the
watermark passes the first-seen event's time, so state is bounded by
(event rate x watermark horizon) — the standard recipe for deduping
retried HTTP posts / Kafka redeliveries at ingest (reference analogue:
the logging-service's at-least-once POST path,
logging-service/app/api.py:12-23, which has no dedup at all).

Plain ``dropDuplicates(keys)`` would only evict state if the event-time
column itself were among the dedup keys; on business keys like
``event_id`` its state grows without bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    event_time_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keep the first arrival per key; duplicates arriving within the
    watermark horizon are dropped, later ones age out of state."""
    return df.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
