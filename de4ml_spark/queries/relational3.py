"""Analytics tier: event funnels, retention cohorts, quantile binning —
the product-analytics battery over the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.session import load_table

# --------------------------------------------------------------------------
# Funnel: per user, ordered progression view -> click -> purchase (each
# stage's first occurrence must be at or after the previous stage's). One
# shuffle (groupBy user), conditional min aggregates, no self-joins.
# --------------------------------------------------------------------------

def funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    reached_view = F.col("t_view").isNotNull()
    reached_click = reached_view & F.col("t_click").isNotNull() & (
        F.col("t_click") >= F.col("t_view")
    )
    reached_purchase = reached_click & F.col("t_purchase").isNotNull() & (
        F.col("t_purchase") >= F.col("t_click")
    )
    return first.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(reached_view, 1)).alias("reached_view"),
        F.count(F.when(reached_click, 1)).alias("reached_click"),
        F.count(F.when(reached_purchase, 1)).alias("reached_purchase"),
    )


FUNNEL_SQL = """
WITH first AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS reached_view,
       COUNT(CASE WHEN t_view IS NOT NULL AND t_click >= t_view
                  THEN 1 END) AS reached_click,
       COUNT(CASE WHEN t_view IS NOT NULL AND t_click >= t_view
                   AND t_purchase >= t_click THEN 1 END) AS reached_purchase
FROM first
"""


# --------------------------------------------------------------------------
# Retention cohorts: users grouped by first-seen day; for each (cohort,
# day-offset) the count of distinct active users. Two shuffles (first-seen
# per user, then cohort cells) — the standard retention matrix.
# --------------------------------------------------------------------------

def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort"))
    return (
        ev.join(first_day, "user_id")
        .groupBy("cohort", F.datediff("day", "cohort").alias("day_offset"))
        .agg(F.count_distinct("user_id").alias("active_users"))
        .filter(F.col("day_offset") <= 7)
    )


RETENTION_SQL = """
WITH days AS (
  SELECT user_id, CAST(ts AS DATE) AS day FROM events
),
first_day AS (
  SELECT user_id, MIN(day) AS cohort FROM days GROUP BY user_id
)
SELECT f.cohort, datediff('day', f.cohort, d.day) AS day_offset,
       COUNT(DISTINCT d.user_id) AS active_users
FROM days d JOIN first_day f USING (user_id)
GROUP BY 1, 2
HAVING day_offset <= 7
"""


# --------------------------------------------------------------------------
# Quantile binning (feature discretization): NTILE(10) over order totals —
# the QuantileDiscretizer shape as a declarative window. Global NTILE needs
# a total order; at 100 TB use approxQuantile cut points broadcast as a
# bucket lookup instead (same output contract).
# --------------------------------------------------------------------------

def price_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


DECILE_SQL = """
WITH d AS (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS decile
  FROM orders
)
SELECT decile, COUNT(*) AS n_orders,
       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
FROM d GROUP BY decile
"""


REGISTRY: dict[str, dict] = {
    "funnel_events": {"fn": funnel_events, "sql": FUNNEL_SQL},
    "retention_cohorts": {"fn": retention_cohorts, "sql": RETENTION_SQL},
    "price_decile_stats": {"fn": price_decile_stats, "sql": DECILE_SQL},
}
