"""Second relational tier: pushdown-heavy filter aggregation (Q6 shape),
sliding event-time windows, per-type part stats, exact daily active users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de4ml_spark.session import load_table


def _dec(col: str, prec: int = 12, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


# --------------------------------------------------------------------------
# Q6 shape: pure filter + ungrouped aggregate — every predicate reaches the
# parquet scan (row-group skipping on l_shipdate/l_discount/l_quantity
# min/max stats); zero shuffle beyond the single-row reduction.
# --------------------------------------------------------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", 3, 2))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# Sliding event-time windows (§2.7): 10-minute windows sliding by 5 —
# each event lands in exactly two windows.
# --------------------------------------------------------------------------

def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


SLIDING_WINDOW_SQL = """
WITH starts AS (
  SELECT time_bucket(INTERVAL 5 MINUTES, ts) AS window_start, value FROM events
  WHERE event_type = 'purchase'
  UNION ALL
  SELECT time_bucket(INTERVAL 5 MINUTES, ts) - INTERVAL 5 MINUTES, value
  FROM events WHERE event_type = 'purchase'
)
SELECT window_start, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM starts
GROUP BY window_start
"""


# --------------------------------------------------------------------------
# Part catalog stats (uses the part dimension).
# --------------------------------------------------------------------------

def part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_type", "p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
            F.sum(_dec("p_retailprice")).cast("double").alias("total_price"),
        )
    )


PART_TYPE_SQL = """
SELECT p_type, p_brand, COUNT(*) AS n_parts,
       MIN(p_size) AS min_size, MAX(p_size) AS max_size,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM part
GROUP BY p_type, p_brand
"""


# --------------------------------------------------------------------------
# Exact daily active users (count distinct per day). At 100 TB the default
# would be approx_count_distinct (HLL, mergeable); exact here for the oracle.
# --------------------------------------------------------------------------

def events_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count_distinct("user_id").alias("dau"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


EVENTS_DAU_SQL = """
SELECT CAST(ts AS DATE) AS day,
       COUNT(DISTINCT user_id) AS dau,
       COUNT(*) AS n_events
FROM events
GROUP BY CAST(ts AS DATE)
"""


REGISTRY: dict[str, dict] = {
    "q6_forecast_revenue": {"fn": q6_forecast_revenue, "sql": Q6_SQL},
    "sliding_window_events": {"fn": sliding_window_events, "sql": SLIDING_WINDOW_SQL},
    "part_type_stats": {"fn": part_type_stats, "sql": PART_TYPE_SQL},
    "events_dau": {"fn": events_dau, "sql": EVENTS_DAU_SQL},
}
