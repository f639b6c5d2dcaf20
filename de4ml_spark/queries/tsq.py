"""Time-series analytics tier: interval-weighted averages and OHLC bars —
the TSDB operator shapes (TimescaleDB time_weight / candlestick rollups)
a metrics-on-events warehouse needs beyond plain windowed aggregates.

Both are exact and engine-portable: integer microsecond intervals, decimal
sums, and composite-key argmin/argmax tiebreaks (no float accumulation
order hazards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.operators.portable_hash import exact_round_div_sql
from de4ml_spark.session import load_table

REGISTRY: dict[str, dict] = {}


# --------------------------------------------------------------------------
# Time-weighted average (TWAP): per user, each value weighted by how long
# it was "current" (until the next event), left-closed step
# interpolation — TimescaleDB's time_weight('LOCF') shape. The last event
# of a user carries zero duration (no successor), matching the
# step-function integral over [first_ts, last_ts].
# Scale: one shuffle on user_id (LEAD window), rollup on the same
# partitioning; weights are exact integer microseconds and the weighted
# sum is DECIMAL — order-independent, engine-identical.
# --------------------------------------------------------------------------


def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    stepped = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
        us.alias("t"),
        (F.lead(us, 1).over(w) - us).alias("dur_us"),
    )
    agg = stepped.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("dur_us").isNotNull(), F.col("v") * F.col("dur_us")))
        .alias("__wsum"),
        F.sum("dur_us").alias("__span_us"),
    )
    return agg.select(
        "user_id",
        "n_events",
        F.col("__span_us").alias("span_us"),
        # exact half-up rounding of the rational (wsum is DECIMAL*BIGINT
        # with 2 fractional digits -> scale by 100 to an integer numerator)
        F.expr(
            exact_round_div_sql(
                "CAST(__wsum * 100 AS DECIMAL(38,0))",
                "CAST(__span_us AS DECIMAL(38,0)) * 100",
                "DIV",
            )
        ).alias("twap_r"),
    ).filter(F.col("span_us").isNotNull() & (F.col("span_us") > 0))


TWAP_SQL = f"""
WITH stepped AS (
  SELECT user_id,
         CAST(value AS DECIMAL(18,2)) AS v,
         epoch_us(ts) AS t,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id)
           - epoch_us(ts) AS dur_us
  FROM events
),
agg AS (
  SELECT user_id, COUNT(*) AS n_events,
         SUM(CASE WHEN dur_us IS NOT NULL THEN v * dur_us END) AS wsum,
         CAST(SUM(dur_us) AS BIGINT) AS span_us
  FROM stepped GROUP BY user_id
)
SELECT user_id, n_events, span_us,
       {exact_round_div_sql(
           'CAST(wsum * 100 AS HUGEINT)',
           'CAST(span_us AS HUGEINT) * 100', '//')} AS twap_r
FROM agg
WHERE span_us IS NOT NULL AND span_us > 0
"""

REGISTRY["twap_user_value"] = {"fn": twap_user_value, "sql": TWAP_SQL}


# --------------------------------------------------------------------------
# OHLC candlestick bars: per day, open/high/low/close of the event value
# stream. open/close are argmin/argmax over a single 128-bit composite
# key (epoch_us * 1e12 + event_id — DECIMAL(38,0)/HUGEINT, monotone for event ids up to 1e12, ordering
# identical to the (ts, event_id) tuple) so simultaneous events resolve
# deterministically in both engines.
# Scale: ONE groupBy on the day grain with map-side combine — min_by/
# max_by aggregate without any per-day sort or window.
# --------------------------------------------------------------------------


def ohlc_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    key = (
        F.unix_micros(F.col("ts").cast("timestamp")).cast("decimal(38,0)")
        * 1_000_000_000_000
        + F.col("event_id")
    )
    return (
        ev.withColumn("day", F.col("ts").cast("date"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min_by("value", key), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", key), 2).alias("close"),
        )
    )


OHLC_SQL = """
SELECT CAST(ts AS DATE) AS day,
       COUNT(*) AS n_events,
       ROUND(arg_min([value], CAST(epoch_us(ts) AS HUGEINT) * 1000000000000
                              + event_id)[1], 2) AS open,
       ROUND(MAX(value), 2) AS high,
       ROUND(MIN(value), 2) AS low,
       ROUND(arg_max([value], CAST(epoch_us(ts) AS HUGEINT) * 1000000000000
                              + event_id)[1], 2) AS close
FROM events
GROUP BY CAST(ts AS DATE)
"""

REGISTRY["ohlc_daily_value"] = {"fn": ohlc_daily_value, "sql": OHLC_SQL}
