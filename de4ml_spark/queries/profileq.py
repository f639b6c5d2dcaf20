"""Profiling + validation queries (SURVEY §2.4 A1-A3, §2.2 P9-P11).

The profile oracle restricts to numeric columns and compares min/max as
DOUBLE (string round-trip is lossless), std rounded to 4 decimals (the one
statistic whose floating-point reduction order differs across engines),
quantiles via exact linear interpolation rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de4ml_spark.contracts.validation import (
    Rule,
    violation_counts,
)
from de4ml_spark.profile.battery import profile
from de4ml_spark.session import load_table

_LI_NUM = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


# --------------------------------------------------------------------------
# A1: per-column profile battery over lineitem numerics (SUMMARIZE parity).
# --------------------------------------------------------------------------

def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = profile(li, columns=_LI_NUM, exact=True)
    return p.select(
        "column_name",
        "count",
        "nulls",
        "null_percentage",
        F.col("min").cast("double").alias("min_value"),
        F.col("max").cast("double").alias("max_value"),
        "avg",
        F.round("std", 4).alias("std_r"),
        "distinct",
        F.round("q25", 6).alias("q25_r"),
        F.round("q50", 6).alias("q50_r"),
        F.round("q75", 6).alias("q75_r"),
    )


def _profile_sql_one(col: str) -> str:
    return f"""
  SELECT
    '{col}' AS column_name,
    COUNT(*) AS count,
    COUNT(*) - COUNT({col}) AS nulls,
    (COUNT(*) - COUNT({col})) * 100.0 / COUNT(*) AS null_percentage,
    MIN({col}) AS min_value,
    MAX({col}) AS max_value,
    CAST(SUM(CAST({col} AS DECIMAL(30,6))) AS DOUBLE) / COUNT({col}) AS avg,
    ROUND(STDDEV_SAMP({col}), 4) AS std_r,
    COUNT(DISTINCT {col}) AS distinct,
    ROUND(QUANTILE_CONT({col}, 0.25), 6) AS q25_r,
    ROUND(QUANTILE_CONT({col}, 0.5), 6) AS q50_r,
    ROUND(QUANTILE_CONT({col}, 0.75), 6) AS q75_r
  FROM lineitem"""


PROFILE_LINEITEM_SQL = "\nUNION ALL\n".join(_profile_sql_one(c) for c in _LI_NUM)


# --------------------------------------------------------------------------
# A2/P10: labelled violation counts from declared rules.
# Counter parity: dataops/app/api.py:15-19, 65-67.
# --------------------------------------------------------------------------

def validation_counts_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rules = [
        Rule(loc="l_quantity", kind="bounds", lo=1.0, hi=30.0),
        Rule(loc="l_discount", kind="bounds", lo=0.0, hi=0.05),
        Rule(loc="l_returnflag", kind="required"),
    ]
    return violation_counts(li, rules)


VALIDATION_COUNTS_SQL = """
SELECT loc, type, n_violations FROM (
  SELECT 'l_quantity' AS loc, 'bounds' AS type,
         COUNT(*) FILTER (WHERE l_quantity IS NOT NULL
                          AND NOT (l_quantity >= 1.0 AND l_quantity <= 30.0))
           AS n_violations
  FROM lineitem
  UNION ALL
  SELECT 'l_discount', 'bounds',
         COUNT(*) FILTER (WHERE l_discount IS NOT NULL
                          AND NOT (l_discount >= 0.0 AND l_discount <= 0.05))
  FROM lineitem
  UNION ALL
  SELECT 'l_returnflag', 'required',
         COUNT(*) FILTER (WHERE l_returnflag IS NULL)
  FROM lineitem
) WHERE n_violations > 0
"""


# --------------------------------------------------------------------------
# P11 end-to-end: profile a training slice -> derive bounds/required rules ->
# count violations on the rest (the dataops feedback loop,
# dataops/app/profile.py:21-39 + api.py:54-76, as one batch query).
# Formulated as ONE lazy DAG: the training bounds/null-count are a
# single-row broadcast scalar frame joined into the serving scan, so the
# whole loop is one job with no driver round-trip. The materialized
# rules-as-data path (profile -> rules_from_profile -> violation_counts,
# the operational API) computes the identical result and is pinned
# equivalent by tests/test_dataops_loop.py + tests/test_profile.py; at
# 100 TB both shapes validate with a single pass over the serving data.
# --------------------------------------------------------------------------

def profile_to_rules_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-03 00:00:00").cast("timestamp_ntz")
    train = ev.filter(F.col("ts") < cutoff)
    bounds = train.agg(
        F.min("value").alias("_lo"),
        F.max("value").alias("_hi"),
        (F.count(F.lit(1)) - F.count("value")).alias("_train_nulls"),
    )
    serve = ev.filter(F.col("ts") >= cutoff).crossJoin(F.broadcast(bounds))
    v = F.col("value")
    viol = serve.agg(
        F.count(
            F.when(
                v.isNotNull() & ~((v >= F.col("_lo")) & (v <= F.col("_hi"))), 1
            )
        ).alias("_bounds_v"),
        F.count(
            F.when((F.col("_train_nulls") == 0) & v.isNull(), 1)
        ).alias("_required_v"),
    )
    return (
        viol.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("value").alias("loc"),
                        F.lit("bounds").alias("type"),
                        F.col("_bounds_v").alias("n_violations"),
                    ),
                    F.struct(
                        F.lit("value").alias("loc"),
                        F.lit("required").alias("type"),
                        F.col("_required_v").alias("n_violations"),
                    ),
                )
            ).alias("r")
        )
        .select("r.*")
        .filter(F.col("n_violations") > 0)
    )


PROFILE_TO_RULES_SQL = """
WITH bounds AS (
  SELECT MIN(value) AS lo, MAX(value) AS hi,
         (COUNT(*) - COUNT(value)) AS train_nulls
  FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
),
serve AS (SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-03 00:00:00')
SELECT loc, type, n_violations FROM (
  SELECT 'value' AS loc, 'bounds' AS type,
         (SELECT COUNT(*) FROM serve, bounds
          WHERE value IS NOT NULL AND NOT (value >= lo AND value <= hi))
           AS n_violations
  UNION ALL
  SELECT 'value', 'required',
         (SELECT CASE WHEN (SELECT train_nulls FROM bounds) = 0
                 THEN (SELECT COUNT(*) FROM serve WHERE value IS NULL)
                 ELSE 0 END)
) WHERE n_violations > 0
"""


# --------------------------------------------------------------------------
# A3 batch twin: per-minute violation-rate alert windows
# (PromQL increase(...[1m]) > 0, dataops/app/profile.py:61-75).
# --------------------------------------------------------------------------

def alert_windows_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value") > 100.0)
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "n_violations",
        )
    )


ALERT_WINDOWS_SQL = """
SELECT date_trunc('minute', ts) AS window_start, COUNT(*) AS n_violations
FROM events
WHERE value > 100.0
GROUP BY date_trunc('minute', ts)
"""


# --------------------------------------------------------------------------
# A3 adaptive variant: alert on minutes whose violation count exceeds the
# exact p95 of per-minute counts — the self-calibrating threshold that
# replaces the fixed `> 0` rule when baseline noise is nonzero (the
# PromQL-rule analog with a data-derived threshold).
# --------------------------------------------------------------------------


def adaptive_alert_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minutes whose violation count > exact p95 of all minute counts,
    with the threshold echoed (engine-identical interpolation).

    Scale: the per-minute counts (one windowed groupBy) feed the
    histogram quantile operator; the 1-row threshold broadcasts back."""
    from de4ml_spark.profile.battery import grouped_exact_quantiles

    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.filter(F.col("value") > 100.0)
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "n_violations",
        )
    )
    thr = grouped_exact_quantiles(
        counts.withColumn("__g", F.lit(1)), ["__g"], "n_violations", [0.95]
    ).select(F.col("q95").alias("__thr"))
    return (
        counts.crossJoin(F.broadcast(thr))
        .filter(F.col("n_violations") > F.col("__thr"))
        .select(
            "window_start",
            "n_violations",
            F.round("__thr", 6).alias("threshold_r"),
        )
    )


ADAPTIVE_ALERT_SQL = """
WITH counts AS (
  SELECT date_trunc('minute', ts) AS window_start, COUNT(*) AS n_violations
  FROM events WHERE value > 100.0
  GROUP BY 1
),
thr AS (SELECT quantile_cont(n_violations, 0.95) AS t FROM counts)
SELECT window_start, n_violations, ROUND(MIN(t), 6) AS threshold_r
FROM counts CROSS JOIN thr
WHERE n_violations > t
GROUP BY window_start, n_violations
"""


REGISTRY: dict[str, dict] = {
    "profile_lineitem": {"fn": profile_lineitem, "sql": PROFILE_LINEITEM_SQL},
    "adaptive_alert_windows": {
        "fn": adaptive_alert_windows,
        "sql": ADAPTIVE_ALERT_SQL,
    },
    "validation_counts_lineitem": {
        "fn": validation_counts_lineitem,
        "sql": VALIDATION_COUNTS_SQL,
    },
    "profile_to_rules_events": {
        "fn": profile_to_rules_events,
        "sql": PROFILE_TO_RULES_SQL,
    },
    "alert_windows_events": {"fn": alert_windows_events, "sql": ALERT_WINDOWS_SQL},
}
