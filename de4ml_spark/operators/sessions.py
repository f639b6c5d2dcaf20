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
