"""Analytics tier: event funnels, retention cohorts, quantile binning —
the product-analytics battery over the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.session import load_table
from de4ml_spark.operators.portable_hash import wide_to_double_sql as _w2d

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
# Timed funnel: stage transitions must happen within a conversion window
# (click within 1h of the first view, purchase within 1h of that click).
# Unlike the unconstrained funnel above, each stage's time depends on the
# PREVIOUS stage's aggregate, so the stages are stacked window aggregates
# over the same user partition — one shuffle, no self-joins, no sort
# (plain MIN-over-partition windows).
# --------------------------------------------------------------------------

CONVERT_WINDOW = "INTERVAL 1 HOUR"


def timed_funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    s1 = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.min(F.when(F.col("event_type") == "view", F.col("ts")))
        .over(w)
        .alias("t_view"),
    )
    s2 = s1.select(
        "*",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.col("t_view"))
                & (F.col("ts") <= F.col("t_view") + F.expr(CONVERT_WINDOW)),
                F.col("ts"),
            )
        )
        .over(w)
        .alias("t_click"),
    )
    s3 = s2.select(
        "user_id",
        "t_view",
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("t_click"))
                & (F.col("ts") <= F.col("t_click") + F.expr(CONVERT_WINDOW)),
                F.col("ts"),
            )
        )
        .over(w)
        .alias("t_purchase"),
    ).dropDuplicates(["user_id"])
    return s3.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("reached_view"),
        F.count(F.when(F.col("t_click").isNotNull(), 1)).alias(
            "converted_click_1h"
        ),
        F.count(F.when(F.col("t_purchase").isNotNull(), 1)).alias(
            "converted_purchase_1h"
        ),
    )


TIMED_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, event_type, ts,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t_view
  FROM events
),
s2 AS (
  SELECT *,
         MIN(CASE WHEN event_type = 'click' AND ts >= t_view
                   AND ts <= t_view + INTERVAL 1 HOUR THEN ts END)
           OVER (PARTITION BY user_id) AS t_click
  FROM s1
),
s3 AS (
  SELECT DISTINCT user_id, t_view, t_click,
         MIN(CASE WHEN event_type = 'purchase' AND ts >= t_click
                   AND ts <= t_click + INTERVAL 1 HOUR THEN ts END)
           OVER (PARTITION BY user_id) AS t_purchase
  FROM s2
)
SELECT COUNT(*) AS n_users,
       COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS reached_view,
       COUNT(CASE WHEN t_click IS NOT NULL THEN 1 END) AS converted_click_1h,
       COUNT(CASE WHEN t_purchase IS NOT NULL THEN 1 END)
         AS converted_purchase_1h
FROM s3
"""


def conversion_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of the view->click conversion latency (seconds,
    within the 1h window): converting-user count, exact median and p90 —
    the SLA readout on top of the timed funnel.

    Scale: the funnel window stages (one shuffle) + the histogram
    quantile operator over integer second latencies (no raw-row
    buffering)."""
    from pyspark.sql import Window

    from de4ml_spark.profile.battery import grouped_exact_quantiles

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    s1 = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.min(F.when(F.col("event_type") == "view", F.col("ts")))
        .over(w)
        .alias("t_view"),
    )
    s2 = (
        s1.select(
            "user_id",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("t_view"))
                    & (F.col("ts") <= F.col("t_view") + F.expr(CONVERT_WINDOW)),
                    F.col("ts"),
                )
            )
            .over(w)
            .alias("t_click"),
            "t_view",
        )
        .dropDuplicates(["user_id"])
        .filter(F.col("t_click").isNotNull())
        .select(
            (
                F.unix_timestamp("t_click") - F.unix_timestamp("t_view")
            ).alias("latency_s")
        )
        .withColumn("__g", F.lit(1))
    )
    q = grouped_exact_quantiles(s2, ["__g"], "latency_s", [0.5, 0.9])
    return q.select(
        F.col("n").alias("n_conversions"),
        F.round("q50", 6).alias("median_s_r"),
        F.round("q90", 6).alias("p90_s_r"),
    )


CONVERSION_LATENCY_SQL = """
WITH s1 AS (
  SELECT user_id, event_type, ts,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t_view
  FROM events
),
s2 AS (
  SELECT DISTINCT user_id, t_view,
         MIN(CASE WHEN event_type = 'click' AND ts >= t_view
                   AND ts <= t_view + INTERVAL 1 HOUR THEN ts END)
           OVER (PARTITION BY user_id) AS t_click
  FROM s1
),
lat AS (
  SELECT date_diff('second', t_view, t_click) AS latency_s
  FROM s2 WHERE t_click IS NOT NULL
)
SELECT COUNT(*) AS n_conversions,
       ROUND(quantile_cont(latency_s, 0.5), 6) AS median_s_r,
       ROUND(quantile_cont(latency_s, 0.9), 6) AS p90_s_r
FROM lat
HAVING COUNT(*) > 0
"""
# HAVING: empty-input parity — the Spark histogram-quantile path yields
# zero groups when no user converts, so the oracle must not emit its
# NULL-stat row there; a no-op whenever any conversion exists.


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
    # o_totalprice IS NOT NULL on both engines: a missing price cannot
    # be deciled, and a NULL in the NTILE order sorts FIRST on Spark
    # and LAST on DuckDB, shifting every bucket boundary (round-14
    # nulltpch parity sweep)
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
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
  FROM orders WHERE o_totalprice IS NOT NULL
)
SELECT decile, COUNT(*) AS n_orders,
       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
FROM d GROUP BY decile
"""


# --------------------------------------------------------------------------
# Q13 shape: distribution of orders-per-customer including zero — LEFT
# OUTER join + double aggregation (per-customer count, then histogram of
# counts). The zero bucket only exists because the join is outer.
# --------------------------------------------------------------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS n_customers FROM per_cust GROUP BY c_count
"""


# --------------------------------------------------------------------------
# Q18 shape: large-volume orders — HAVING over a fact aggregation, joined
# back to dimensions. The HAVING filter runs before the dimension joins so
# only qualifying orders (a tiny set) join.
# --------------------------------------------------------------------------

QTY_THRESHOLD = 300


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec2("l_quantity")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > QTY_THRESHOLD)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "total_qty"
        )
    )


Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING total_qty > {QTY_THRESHOLD}
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --------------------------------------------------------------------------
# Q19 shape: disjunctive multi-range predicates across a join — the
# pushdown stress case (each OR branch mixes part and lineitem columns, so
# only the common-column residue can push to either scan).
# --------------------------------------------------------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc_price = _dec2("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("l_quantity").between(1, 11)
        & (F.col("p_size") <= 5)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("l_quantity").between(10, 20)
        & (F.col("p_size") <= 10)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.sum(disc_price).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10)
"""


def _dec2(col: str):
    return F.col(col).cast("decimal(12,2)")


REGISTRY: dict[str, dict] = {
    "funnel_events": {"fn": funnel_events, "sql": FUNNEL_SQL},
    "retention_cohorts": {"fn": retention_cohorts, "sql": RETENTION_SQL},
    "price_decile_stats": {"fn": price_decile_stats, "sql": DECILE_SQL},
    "q13_customer_distribution": {
        "fn": q13_customer_distribution,
        "sql": Q13_SQL,
    },
    "q18_large_orders": {"fn": q18_large_orders, "sql": Q18_SQL},
    "q19_disjunctive_revenue": {"fn": q19_disjunctive_revenue, "sql": Q19_SQL},
    "timed_funnel_events": {"fn": timed_funnel_events, "sql": TIMED_FUNNEL_SQL},
    "conversion_latency_stats": {
        "fn": conversion_latency_stats,
        "sql": CONVERSION_LATENCY_SQL,
    },
}


# --------------------------------------------------------------------------
# Reconciliation: FULL OUTER join of decision keys vs reward keys from the
# events stream — the match-status audit (both / decision-only /
# reward-only) every pipeline handoff needs.
# --------------------------------------------------------------------------

def reconcile_decisions_rewards(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("d_key"))
        .agg(F.count(F.lit(1)).alias("n_decisions"))
    )
    r = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("r_key"))
        .agg(F.count(F.lit(1)).alias("n_rewards"))
    )
    status = (
        F.when(F.col("d_key").isNotNull() & F.col("r_key").isNotNull(), "both")
        .when(F.col("d_key").isNotNull(), "decision_only")
        .otherwise("reward_only")
    )
    return (
        d.join(r, F.col("d_key") == F.col("r_key"), "full_outer")
        .select(
            status.alias("status"),
            F.coalesce("n_decisions", F.lit(0)).alias("n_decisions"),
            F.coalesce("n_rewards", F.lit(0)).alias("n_rewards"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n_decisions").alias("total_decisions"),
            F.sum("n_rewards").alias("total_rewards"),
        )
    )


RECONCILE_SQL = """
WITH d AS (
  SELECT user_id AS d_key, COUNT(*) AS n_decisions FROM events
  WHERE event_type = 'click' GROUP BY 1
),
r AS (
  SELECT user_id AS r_key, COUNT(*) AS n_rewards FROM events
  WHERE event_type = 'purchase' GROUP BY 1
),
j AS (
  SELECT CASE WHEN d_key IS NOT NULL AND r_key IS NOT NULL THEN 'both'
              WHEN d_key IS NOT NULL THEN 'decision_only'
              ELSE 'reward_only' END AS status,
         COALESCE(n_decisions, 0) AS n_decisions,
         COALESCE(n_rewards, 0) AS n_rewards
  FROM d FULL OUTER JOIN r ON d_key = r_key
)
SELECT status, COUNT(*) AS n_keys,
       CAST(SUM(n_decisions) AS BIGINT) AS total_decisions,
       CAST(SUM(n_rewards) AS BIGINT) AS total_rewards
FROM j GROUP BY status
"""


# --------------------------------------------------------------------------
# Set operation (EXCEPT): day-over-day purchaser churn — users active on
# day 1 who did not return on day 2. subtract() is Spark's EXCEPT
# DISTINCT; at sf0.01 this selects 40 of 150 users (non-vacuous).
# --------------------------------------------------------------------------

def churned_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    day = F.col("ts").cast("date")
    d1 = ev.filter(day == F.lit("2024-01-01").cast("date")).select("user_id").distinct()
    d2 = ev.filter(day == F.lit("2024-01-02").cast("date")).select("user_id").distinct()
    return d1.subtract(d2)


CHURNED_SQL = """
SELECT DISTINCT user_id FROM events
WHERE event_type = 'purchase' AND CAST(ts AS DATE) = DATE '2024-01-01'
EXCEPT
SELECT DISTINCT user_id FROM events
WHERE event_type = 'purchase' AND CAST(ts AS DATE) = DATE '2024-01-02'
"""


REGISTRY["reconcile_decisions_rewards"] = {
    "fn": reconcile_decisions_rewards,
    "sql": RECONCILE_SQL,
}
REGISTRY["churned_purchasers"] = {
    "fn": churned_purchasers,
    "sql": CHURNED_SQL,
}


# --------------------------------------------------------------------------
# Hour-of-day seasonality: event volume and value by hour x type — the
# time-dimension profile (date_part extraction + two-key aggregate).
# --------------------------------------------------------------------------

def hourly_seasonality_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.hour("ts").alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
    )


HOURLY_SQL = """
SELECT EXTRACT(hour FROM ts) AS hour, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


REGISTRY["hourly_seasonality_events"] = {
    "fn": hourly_seasonality_events,
    "sql": HOURLY_SQL,
}


# --------------------------------------------------------------------------
# Global-sort band (keyset pagination shape): rows 1001-1020 of the full
# price ordering. Exercises range-partitioned global sort + row_number
# banding — at scale, prefer keyset predicates (WHERE price < last_seen)
# over OFFSET, which this banding emulates deterministically.
# --------------------------------------------------------------------------

def orders_price_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn").between(1001, 1020))
        .select("rn", "o_orderkey", "o_totalprice")
    )


PRICE_PAGE_SQL = """
WITH r AS (
  SELECT o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
SELECT rn, o_orderkey, o_totalprice FROM r WHERE rn BETWEEN 1001 AND 1020
"""


REGISTRY["orders_price_page"] = {
    "fn": orders_price_page,
    "sql": PRICE_PAGE_SQL,
}


# --------------------------------------------------------------------------
# Monthly revenue with a 3-month trailing moving average — the rolling
# window-frame aggregate (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) over a
# tiny monthly series; the heavy lifting is the month aggregation.
# --------------------------------------------------------------------------

def monthly_revenue_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("month").rowsBetween(-2, 0)
    return monthly.select(
        "month",
        "revenue",
        F.round(F.avg("revenue").over(w), 6).alias("ma3"),
    )


MONTHLY_MA_SQL = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT month, revenue,
       ROUND(AVG(revenue) OVER (ORDER BY month
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3
FROM monthly
"""


REGISTRY["monthly_revenue_ma"] = {
    "fn": monthly_revenue_ma,
    "sql": MONTHLY_MA_SQL,
}


# --------------------------------------------------------------------------
# CDC latest-snapshot: the most recent event per user via max_by with a
# COMPOSITE ordering key (ts, event_id) — one aggregate pass, no window
# sort; per-column arg_max with a tie-broken key keeps all output columns
# from the SAME row.
# --------------------------------------------------------------------------

def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic under ts TIES (same-microsecond events are routine
    # at scale; the round-14 constant-shard parity sweep caught Spark
    # max_by and DuckDB arg_max breaking ties differently): the ordering
    # key composes (ts, event_id) into ONE 128-bit integer — DuckDB's
    # arg_max does not accept struct keys, so a scalar key is the only
    # portable shape. micros < 2^63 and event_id < 10^19 keep the
    # composition exact in DECIMAL(38,0)/HUGEINT.
    ev = load_table(spark, sf_dir, "events")
    # timestampdiff is NTZ-native (unix_micros demands TIMESTAMP and a
    # session-tz cast could collapse distinct NTZ values in a DST hour)
    key = (
        "CAST(timestampdiff(MICROSECOND,"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS DECIMAL(38,0))"
        " * 10000000000000000000 + event_id"
    )
    return ev.groupBy("user_id").agg(
        F.expr(f"max_by(event_id, {key})").alias("last_event_id"),
        F.expr(f"max_by(event_type, {key})").alias("last_type"),
        F.expr(f"max_by(value, {key})").alias("last_value"),
        F.max("ts").alias("last_ts"),
    )


# Oracle nullable-payload convention: DuckDB's arg_max(x, k) SKIPS rows
# where x is NULL (returning x from a DIFFERENT row than k), while Spark's
# max_by is row-faithful — so every nullable payload is packed in a
# one-element list, arg_max([x], k)[1], which DuckDB never skips. Found by
# the round-14 nonfinite parity sweep (a NULLed value on the latest row
# made the oracle report an older row's value under the newest ts).
LATEST_EVENT_SQL = """
SELECT user_id,
       arg_max(event_id, k) AS last_event_id,
       arg_max([event_type], k)[1] AS last_type,
       arg_max([value], k)[1] AS last_value,
       MAX(ts) AS last_ts
FROM (
  SELECT *, CAST(epoch_us(ts) AS HUGEINT)
            * 10000000000000000000 + event_id AS k
  FROM events
)
GROUP BY user_id
"""


REGISTRY["latest_event_per_user"] = {
    "fn": latest_event_per_user,
    "sql": LATEST_EVENT_SQL,
}


# --------------------------------------------------------------------------
# SCD2 interval build: compress a keyed event stream into type-2 dimension
# rows — one row per run of consecutive equal attribute values, with
# [valid_from, valid_to) validity and is_current. The standard warehouse
# dimension-history operator (gaps-and-islands via window functions).
# Scale/fusion: ONE shuffle and TWO WindowExec passes total. Pass 1
# computes lag + row_number + partition count in a single WindowExec
# (identical partition/order spec, so Catalyst groups all three frames
# into one operator); run-start rows are then filtered — the second
# lead() pass runs over only the (much smaller) start-row set, and its
# Sort/Exchange are elided because the filter preserves the pass-1
# partitioning and ordering. n_events falls out of row_number deltas,
# replacing the groupBy aggregate entirely.
# --------------------------------------------------------------------------

def scd2_user_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from de4ml_spark.session import spread

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wp = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # spread: the window pass is the whole cost of this query — widen the
    # key exchange to full parallelism when a small-file scan would
    # otherwise leave most cores idle (no-op on naturally-split scans)
    marked = spread(
        ev.select("user_id", "event_type", "ts", "event_id"), "user_id"
    ).select(
        "user_id",
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n_rows"),
    )
    starts = marked.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "rn")
    return starts.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
        (F.coalesce(F.lead("rn").over(w2), F.col("n_rows") + F.lit(1)) - F.col("rn"))
        .cast("bigint")
        .alias("n_events"),
    )


SCD2_SQL = """
WITH marked AS (
  SELECT user_id, event_type, ts,
         LAG(event_type) OVER w AS prev_type,
         ROW_NUMBER() OVER w AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_rows
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
starts AS (
  SELECT * FROM marked
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type, ts AS valid_from,
       LEAD(ts) OVER w2 AS valid_to,
       LEAD(ts) OVER w2 IS NULL AS is_current,
       CAST(COALESCE(LEAD(rn) OVER w2, n_rows + 1) - rn AS BIGINT) AS n_events
FROM starts
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, rn)
"""


REGISTRY["scd2_user_event_type"] = {
    "fn": scd2_user_event_type,
    "sql": SCD2_SQL,
}


# --------------------------------------------------------------------------
# CUBE grouping-sets: event volume/value over every combination of
# (event_type, day) including marginals and the grand total — one pass,
# partial-aggregated per grouping set. GROUPING() markers disambiguate
# rolled-up NULLs (matches ANSI semantics in both engines).
# --------------------------------------------------------------------------

def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    return (
        ev.cube("event_type", "day")
        .agg(
            # grouping() must be computed IN the cube aggregate (the
            # grouping metadata does not survive into later projections)
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("day").cast("int").alias("g_day"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select("event_type", "day", "g_type", "g_day", "n", "total_value")
    )


EVENTS_CUBE_SQL = """
SELECT event_type, CAST(ts AS DATE) AS day,
       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
       CAST(GROUPING(CAST(ts AS DATE)) AS INTEGER) AS g_day,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY CUBE(event_type, CAST(ts AS DATE))
HAVING COUNT(*) > 0
"""
# HAVING: empty-input parity — Spark's Expand-based CUBE emits zero
# rows on a zero-row shard (no grand-total row); every real cube cell
# has COUNT >= 1, so this is a no-op on any non-empty input (see
# ORDERS_ROLLUP_SQL in relational2.py).


REGISTRY["events_cube"] = {"fn": events_cube, "sql": EVENTS_CUBE_SQL}


# --------------------------------------------------------------------------
# UNPIVOT (melt) + robust stats: lineitem's measure columns to long form
# (measure, value), then per-measure median/min/max/avg. The standard
# wide->long reshape for metric tables; unpivot is a zero-shuffle
# projection (each row emits |measures| rows), stats are one groupBy over
# a 4-value key. Median = exact percentile_cont 0.5 (matches DuckDB
# MEDIAN on DOUBLE).
# --------------------------------------------------------------------------

def lineitem_measure_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.profile.battery import grouped_exact_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    ).select("measure", F.col("value").cast("double").alias("value"))
    # r17 (guide §5 — per-task state): percentile_cont buffered all
    # 4x|lineitem| raw doubles in one aggregation buffer per measure
    # (1.05 s at sf0.1, and an unbounded-memory hazard at 100 TB);
    # the histogram-based grouped_exact_quantiles computes the SAME
    # interpolated order statistic (identical v_lo + frac*(v_hi-v_lo)
    # double arithmetic — the cross-engine-verified battery.py path)
    # from a map-side-combined (measure, value) count. 1.05 -> ~0.2 s,
    # bounded state.
    med = grouped_exact_quantiles(long, ["measure"], "value", [0.5])
    base = long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
        # engine-exact mean: the measures sit on coarse decimal grids, so
        # ROUND(sum/count, 6) on the double quotient hits exact half
        # boundaries at material rates — integer micros, half-up divide
        F.expr(
            "CAST((CAST(SUM(CAST(value AS DECIMAL(24,6))) * 1000000 AS"
            " BIGINT) * 2 + COUNT(*)) DIV (2 * COUNT(*)) AS DOUBLE)"
            " / 1000000.0"
        ).alias("mean"),
    )
    return base.join(
        F.broadcast(
            med.select("measure", F.round(F.col("q50"), 6).alias("median"))
        ),
        "measure",
    ).select("measure", "n", "median", "lo", "hi", "mean")


MEASURE_STATS_SQL = """
WITH long AS (
  SELECT measure, CAST(value AS DOUBLE) AS value
  FROM (
    SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
    UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL SELECT 'l_discount', l_discount FROM lineitem
    UNION ALL SELECT 'l_tax', l_tax FROM lineitem
  )
)
SELECT measure, COUNT(*) AS n,
       ROUND(MEDIAN(value), 6) AS median,
       ROUND(MIN(value), 6) AS lo,
       ROUND(MAX(value), 6) AS hi,
       ((CAST(SUM(CAST(value AS DECIMAL(24,6))) * 1000000 AS BIGINT)
         * 2 + COUNT(*)) // (2 * COUNT(*))) / 1000000.0 AS mean
FROM long GROUP BY measure
"""


REGISTRY["lineitem_measure_stats"] = {
    "fn": lineitem_measure_stats,
    "sql": MEASURE_STATS_SQL,
}


# --------------------------------------------------------------------------
# Time-series gap filling: dense per-user daily purchase series over the
# corpus date range — a date spine (broadcast 1-row min/max -> sequence ->
# explode) LEFT-joined to the sparse daily aggregate, missing counts
# zero-filled and the last observed daily value carried forward (LOCF via
# last_value IGNORE NULLS). The spine is |users| x |days| rows built
# map-side; the only shuffles are the daily aggregate and the per-user
# window sort. Days before a user's first purchase stay NULL (nothing to
# carry) — pinned by the oracle.
# --------------------------------------------------------------------------

def gapfill_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("date").alias("day"), "value"
    )
    daily = purchases.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(24,6)")).cast("double").alias("v"),
    )
    minmax = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    spine = (
        ev.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(minmax))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_purchases"),
            F.last("v", ignorenulls=True).over(w).alias("locf_value"),
        )
    )


GAPFILL_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS v
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
),
spine AS (
  SELECT u.user_id, CAST(d.day AS DATE) AS day
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (
    SELECT unnest(generate_series(MIN(CAST(ts AS DATE)),
                                  MAX(CAST(ts AS DATE)),
                                  INTERVAL 1 DAY)) AS day
    FROM events
  ) d
)
SELECT s.user_id, s.day,
       COALESCE(daily.n, 0) AS n_purchases,
       LAST_VALUE(daily.v IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS locf_value
FROM spine s
LEFT JOIN daily ON s.user_id = daily.user_id AND s.day = daily.day
"""


REGISTRY["gapfill_user_daily"] = {
    "fn": gapfill_user_daily,
    "sql": GAPFILL_SQL,
}


# --------------------------------------------------------------------------
# INTERSECT set op (the one relational set operator the catalog had not
# exercised; EXCEPT is churned_purchasers): users who purchased in BOTH
# halves of the observed month. Spark plans INTERSECT as a distinct +
# left-semi hash join — no row explosion, shuffle on the user key only.
# --------------------------------------------------------------------------

def repeat_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    day = F.col("ts").cast("date")
    cut = F.lit("2024-01-16").cast("date")
    h1 = ev.filter(day < cut).select("user_id").distinct()
    h2 = ev.filter(day >= cut).select("user_id").distinct()
    return h1.intersect(h2)


REPEAT_SQL = """
SELECT DISTINCT user_id FROM events
WHERE event_type = 'purchase' AND CAST(ts AS DATE) < DATE '2024-01-16'
INTERSECT
SELECT DISTINCT user_id FROM events
WHERE event_type = 'purchase' AND CAST(ts AS DATE) >= DATE '2024-01-16'
"""


REGISTRY["repeat_purchasers"] = {"fn": repeat_purchasers, "sql": REPEAT_SQL}


# --------------------------------------------------------------------------
# RANGE-frame trailing window: 7-day trailing revenue per order day. The
# frame is RANGE over a numeric day key (days since epoch — identical
# arithmetic in both engines), so days missing from the data still bound
# the frame correctly — a ROWS frame would silently span gaps. One daily
# aggregate shuffle + one global-ordered window (fine: one row per day; at
# 100 TB the window would partition by month/tenant first).
# --------------------------------------------------------------------------

def trailing_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    day_num = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = Window.orderBy(day_num.alias("day_num")).rangeBetween(-6, 0)
    return daily.select(
        "day",
        F.col("rev_dec").cast("double").alias("day_revenue"),
        "n_orders",
        F.sum("rev_dec").over(w).cast("double").alias("trailing_7d_revenue"),
        F.sum("n_orders").over(w).alias("trailing_7d_orders"),
    )


TRAILING_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT day,
       CAST(rev_dec AS DOUBLE) AS day_revenue,
       n_orders,
       CAST(SUM(rev_dec) OVER w AS DOUBLE) AS trailing_7d_revenue,
       CAST(SUM(n_orders) OVER w AS BIGINT) AS trailing_7d_orders
FROM daily
WINDOW w AS (ORDER BY datediff('day', DATE '1970-01-01', day)
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


REGISTRY["trailing_7d_revenue"] = {
    "fn": trailing_7d_revenue,
    "sql": TRAILING_SQL,
}


# --------------------------------------------------------------------------
# Pareto / ABC analysis of part revenue: rank parts by revenue, walk
# the cumulative share, and class them A (first 80% of revenue),
# B (to 95%), C (tail) — the classic inventory-concentration report.
# Exactness: revenue in integer 1e-4 currency units (the discount
# product has 4 decimal places — scaling by anything less leaves a
# fraction that Spark TRUNCATES and DuckDB ROUNDS on the BIGINT cast,
# an engine split measured here), the 80/95%
# thresholds compared by integer cross-multiplication
# (5·cum > 4·total etc.), never via a floating share; ordering is the
# deterministic (revenue DESC, partkey). The per-class report then
# carries exact counts, cents, and one half-up share rounding each.
# Scale: one groupBy to per-part revenue; the global cumulative is
# DISTRIBUTED (operators/rank.py with_global_cumsum — range-
# partitioned running sums + broadcast partition offsets; the part
# frame is |parts|-sized, which still scales with the corpus), and
# the class report is 3 rows.
# --------------------------------------------------------------------------


def pareto_revenue_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql_wide,
    )

    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.expr(
            "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * (1 - CAST(l_discount AS DECIMAL(18,2))))"
            " AS DECIMAL(38,4)) * 10000 AS BIGINT)"
        ).alias("rev_c4")
    )
    # distributed cumulative (operators/rank.py): range-partitioned
    # per-partition running sums + broadcast partition-sum offsets —
    # the naive unpartitioned Window.orderBy would sort the whole
    # part frame on one executor
    from de4ml_spark.operators.rank import with_global_cumsum

    tot = per_part.agg(F.sum("rev_c4").alias("total_c4"))
    classed = (
        with_global_cumsum(
            per_part,
            [F.desc("rev_c4"), F.col("l_partkey")],
            "rev_c4",
            out_col="cum_c4",
        )
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "l_partkey",
            "rev_c4",
            "cum_c4",
            "total_c4",
            # A: cum <= 80% (5*cum <= 4*total), B: <= 95% (20*cum <=
            # 19*total), else C — integer cross-multiplied in 128-bit
            # (20x a 1e-4-unit total passes int64 near sf230)
            """CASE WHEN 5 * CAST(cum_c4 AS DECIMAL(38,0))
                     <= 4 * CAST(total_c4 AS DECIMAL(38,0)) THEN 'A'
                WHEN 20 * CAST(cum_c4 AS DECIMAL(38,0))
                     <= 19 * CAST(total_c4 AS DECIMAL(38,0)) THEN 'B'
                ELSE 'C' END AS abc_class""",
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("rev_c4").cast("bigint").alias("class_rev_c4"),
            F.max("total_c4").cast("bigint").alias("_tot"),
        )
        .selectExpr(
            "abc_class",
            "n_parts",
            "class_rev_c4",
            f"""{exact_round_div_sql_wide(
                'class_rev_c4', '_tot', 'DIV'
            )} AS rev_share_r""",
        )
        .orderBy("abc_class")
    )


def _pareto_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql_wide,
    )

    return f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,2))))
              AS DECIMAL(38,4)) * 10000 AS BIGINT) AS rev_c4
  FROM lineitem GROUP BY 1
),
tot AS (SELECT CAST(SUM(rev_c4) AS BIGINT) AS total_c4 FROM per_part),
classed AS (
  SELECT l_partkey, rev_c4,
         SUM(rev_c4) OVER (ORDER BY rev_c4 DESC, l_partkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c4,
         t.total_c4
  FROM per_part CROSS JOIN tot t
),
labeled AS (
  SELECT *,
         CASE WHEN 5 * CAST(cum_c4 AS HUGEINT)
                   <= 4 * CAST(total_c4 AS HUGEINT) THEN 'A'
              WHEN 20 * CAST(cum_c4 AS HUGEINT)
                   <= 19 * CAST(total_c4 AS HUGEINT) THEN 'B'
              ELSE 'C' END AS abc_class
  FROM classed
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev_c4) AS BIGINT) AS class_rev_c4,
       {exact_round_div_sql_wide(
           'CAST(SUM(rev_c4) AS BIGINT)',
           'CAST(MAX(total_c4) AS BIGINT)', '//'
       )} AS rev_share_r
FROM labeled
GROUP BY 1
ORDER BY 1
"""


REGISTRY["pareto_revenue_parts"] = {
    "fn": pareto_revenue_parts,
    "sql": _pareto_sql(),
}


# --------------------------------------------------------------------------
# RFM customer segmentation: quintile each customer on Recency (days
# since last order), Frequency (order count), Monetary (total spend in
# cents) and report the segment grid — the standard CRM scoring.
# Quintiles are deterministic NTILE(5) over total orders
# (metric, custkey) — both engines compute NTILE identically given the
# same total order, and the tie-break key makes the order total.
# Recency quintile 5 = most recent (orders by recency ASC so ntile 1 =
# oldest; the score flips it). Scale: one groupBy per customer, three
# window passes over the customer frame (≪ orders), grid ≤ 125 rows.
# --------------------------------------------------------------------------


def rfm_segments_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    orders = load_table(spark, sf_dir, "orders")
    horizon = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("hmax")
    )
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
            F.count(F.lit(1)).alias("freq"),
            F.expr(
                "CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))"
                " AS DECIMAL(38,2)) * 100 AS BIGINT)"
            ).alias("money_c"),
        )
        .crossJoin(F.broadcast(horizon))
        .selectExpr(
            "o_custkey",
            "datediff(hmax, last_day) AS recency_days",
            "freq",
            # COALESCE 0: a customer whose every order price is NULL
            # has unknown spend — rank it lowest deterministically on
            # both engines (a NULL in the NTILE order sorts FIRST on
            # Spark, LAST on DuckDB; round-14 nulltpch parity sweep)
            "COALESCE(money_c, CAST(0 AS BIGINT)) AS money_c",
        )
    )
    # distributed exact NTILE (operators/rank.py): a bare
    # Window.orderBy ntile would single-partition the customer frame
    # three times; the range-partitioned rank + closed-form tile
    # allocation keeps every sort distributed and matches NTILE
    # semantics bit-for-bit in both engines
    from de4ml_spark.operators.rank import with_global_ntile

    scored = per_cust
    scored = with_global_ntile(
        scored, ["recency_days", "o_custkey"], 5, "nt_r"
    )
    scored = with_global_ntile(scored, ["freq", "o_custkey"], 5, "nt_f")
    scored = with_global_ntile(
        scored, ["money_c", "o_custkey"], 5, "nt_m"
    )
    scored = scored.select(
        "o_custkey",
        "recency_days",
        "freq",
        "money_c",
        # ntile 1 = most recent days (ASC) -> R score 6 - ntile
        (6 - F.col("nt_r")).alias("r_score"),
        F.col("nt_f").alias("f_score"),
        F.col("nt_m").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("money_c").cast("bigint").alias("segment_money_c"),
        )
        .selectExpr(
            "CAST(r_score AS BIGINT) AS r_score",
            "CAST(f_score AS BIGINT) AS f_score",
            "CAST(m_score AS BIGINT) AS m_score",
            "n_customers",
            "segment_money_c",
            f"""{exact_round_div_sql(
                'segment_money_c', 'n_customers', 'DIV', 2
            )} AS avg_money_r""",
        )
    )


def _rfm_sql() -> str:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    return f"""
WITH horizon AS (
  SELECT MAX(CAST(o_orderdate AS DATE)) AS hmax FROM orders
),
per_cust AS (
  SELECT o_custkey,
         datediff('day', MAX(CAST(o_orderdate AS DATE)), h.hmax)
           AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS freq,
         COALESCE(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              AS DECIMAL(38,2)) * 100 AS BIGINT), 0) AS money_c
  FROM orders CROSS JOIN horizon h
  GROUP BY o_custkey, h.hmax
),
scored AS (
  SELECT o_custkey, recency_days, freq, money_c,
         6 - NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
         NTILE(5) OVER (ORDER BY freq, o_custkey) AS f_score,
         NTILE(5) OVER (ORDER BY money_c, o_custkey) AS m_score
  FROM per_cust
)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(money_c) AS BIGINT) AS segment_money_c,
       {exact_round_div_sql(
           'CAST(SUM(money_c) AS BIGINT)',
           'CAST(COUNT(*) AS BIGINT)', '//', 2
       )} AS avg_money_r
FROM scored
GROUP BY 1, 2, 3
"""


REGISTRY["rfm_segments_customers"] = {
    "fn": rfm_segments_customers,
    "sql": _rfm_sql(),
}


# --------------------------------------------------------------------------
# Gini coefficient of part-revenue concentration — the single-number
# companion of the Pareto/ABC report (Lorenz-curve area). Exact:
# G = (2·Σ i·x_(i) − (n+1)·S) / (n·S) over revenue sorted ascending
# with deterministic (revenue, partkey) ranks; numerator and
# denominator are exact integers assembled in 128-bit internal
# arithmetic (Σ i·x_i approaches int64 at sf0.1 already), the reported
# coefficient one engine-identical double division. Also reports the
# top-1% revenue share the same exact way. Scale: one groupBy to
# per-part revenue, then a DISTRIBUTED global rank over the part
# frame (operators/rank.py — no single-partition sort).
# --------------------------------------------------------------------------


def gini_revenue_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # rev_e4 IS NOT NULL: a part whose every lineitem has NULL
    # price/discount has UNKNOWN revenue — it cannot enter the Lorenz
    # curve (and a NULL in the rank order sorts FIRST on Spark, LAST
    # on DuckDB; round-14 nulltpch parity sweep). Standard missing-
    # data treatment for Gini: exclude, don't impute 0.
    per_part = li.groupBy("l_partkey").agg(
        F.expr(
            "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * (1 - CAST(l_discount AS DECIMAL(18,2))))"
            " AS DECIMAL(38,4)) * 10000 AS BIGINT)"
        ).alias("rev_e4")
    ).filter(F.col("rev_e4").isNotNull())
    # distributed rank + known total (operators/rank.py) — replaces
    # the unpartitioned rank window AND the COUNT(*) OVER () pass
    from de4ml_spark.operators.rank import global_rank_and_total

    ranked_df, n_all = global_rank_and_total(
        per_part, ["rev_e4", "l_partkey"], out_col="i"
    )
    ranked = ranked_df.select(
        "rev_e4", "i", F.lit(int(n_all)).cast("long").alias("n_all")
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rev_e4").cast("bigint").alias("s"),
        F.sum(
            F.expr("CAST(i AS DECIMAL(38,0)) * rev_e4")
        ).alias("_wsum"),
        F.sum(
            F.expr(
                "CASE WHEN i * 100 > n_all * 99 THEN rev_e4 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("top1_rev_e4"),
    )
    return agg.selectExpr(
        "n",
        "s AS total_rev_e4",
        "top1_rev_e4",
        _w2d("2 * _wsum - CAST(n + 1 AS DECIMAL(38,0)) * s", "DIV")
        + " / "
        + _w2d("CAST(n AS DECIMAL(38,0)) * s", "DIV")
        + " AS gini_r",
        "CAST(top1_rev_e4 AS DOUBLE) / CAST(s AS DOUBLE)"
        " AS top1_share_r",
    )


GINI_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,2))))
              AS DECIMAL(38,4)) * 10000 AS BIGINT) AS rev_e4
  FROM lineitem GROUP BY 1
  HAVING rev_e4 IS NOT NULL
),
ranked AS (
  SELECT rev_e4,
         ROW_NUMBER() OVER (ORDER BY rev_e4, l_partkey) AS i,
         COUNT(*) OVER () AS n_all
  FROM per_part
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rev_e4) AS BIGINT) AS s,
         SUM(CAST(i AS HUGEINT) * rev_e4) AS wsum,
         CAST(SUM(CASE WHEN i * 100 > n_all * 99
                       THEN rev_e4 ELSE 0 END) AS BIGINT)
           AS top1_rev_e4
  FROM ranked
)
SELECT n, s AS total_rev_e4, top1_rev_e4,
       {GINI_NUM} / {GINI_DEN} AS gini_r,
       CAST(top1_rev_e4 AS DOUBLE) / CAST(s AS DOUBLE) AS top1_share_r
FROM agg
"""

REGISTRY["gini_revenue_parts"] = {
    "fn": gini_revenue_parts,
    "sql": GINI_SQL.replace(
        "{GINI_NUM}",
        _w2d("2 * wsum - CAST(n + 1 AS HUGEINT) * s", "//"),
    ).replace("{GINI_DEN}", _w2d("CAST(n AS HUGEINT) * s", "//")),
}


# --------------------------------------------------------------------------
# Theil T inequality index of per-part net revenue — the entropy-based
# member of the inequality family (Gini and the Pareto cumulative live
# above): T = Σᵢ (xᵢ/X)·ln(xᵢ·N/X), decomposable across groups where
# Gini is not. Revenues are exact e4-scaled integers; each
# ln(xᵢ·N / X) is the portable ln of an integer rational (max/min
# flip for below-mean parts), micro-quantized; the weighted sum
# Σ xᵢ·⌊ln·10⁶⌉ is carried 128-bit and normalized once through
# wide_to_double. Zero-revenue parts contribute 0 (lim x→0 x·ln x =
# 0, standard convention). Scale: one groupBy + one broadcast total;
# NO rank pass at all (unlike Gini, Theil needs no order).
# --------------------------------------------------------------------------


def theil_index_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        wide_to_double_sql as _w2d,
        with_portable_ln,
    )

    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.expr(
            "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * (1 - CAST(l_discount AS DECIMAL(18,2))))"
            " AS DECIMAL(38,4)) * 10000 AS BIGINT)"
        ).alias("rev_e4")
    )
    tot = per_part.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("rev_e4").cast("bigint").alias("x_tot"),
    )
    j = per_part.crossJoin(F.broadcast(tot)).filter("rev_e4 > 0")
    j = j.selectExpr(
        "n_parts",
        "x_tot",
        "rev_e4",
        "CAST(rev_e4 AS DECIMAL(38,0)) * n_parts AS num",
        "CAST(x_tot AS DECIMAL(38,0)) AS den",
    )
    lned = with_portable_ln(
        j,
        "CASE WHEN num >= den THEN num ELSE den END",
        "CASE WHEN num >= den THEN den ELSE num END",
        "__pln",
    ).selectExpr(
        "n_parts",
        "x_tot",
        "CAST(rev_e4 AS DECIMAL(38,0))"
        " * CAST(floor((CASE WHEN num >= den THEN __pln"
        " ELSE -__pln END) * 1000000.0 + 0.5) AS BIGINT) AS term",
    )
    agg = lned.groupBy("n_parts", "x_tot").agg(
        F.sum("term").alias("t_num")
    )
    return agg.selectExpr(
        "n_parts",
        "x_tot",
        f"{_w2d('t_num', 'DIV')} / (CAST(x_tot AS DOUBLE)"
        " * 1000000.0) AS theil_t",
    )


def _theil_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
        wide_to_double_sql as _w2d,
    )

    ln_ctes = portable_ln_duck_ctes(
        "j",
        "n_parts, x_tot, rev_e4, num, den",
        "CASE WHEN num >= den THEN num ELSE den END",
        "CASE WHEN num >= den THEN den ELSE num END",
        "pln",
        "th",
    )
    return f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,2))))
              AS DECIMAL(38,4)) * 10000 AS BIGINT) AS rev_e4
  FROM lineitem GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(rev_e4) AS BIGINT) AS x_tot
  FROM per_part
),
j AS (
  SELECT n_parts, x_tot, rev_e4,
         CAST(rev_e4 AS HUGEINT) * n_parts AS num,
         CAST(x_tot AS HUGEINT) AS den
  FROM per_part CROSS JOIN tot
  WHERE rev_e4 > 0
),
{ln_ctes},
lned AS (
  SELECT n_parts, x_tot,
         CAST(rev_e4 AS HUGEINT)
           * CAST(floor((CASE WHEN num >= den THEN pln
             ELSE -pln END) * 1000000.0 + 0.5) AS BIGINT) AS term
  FROM th_out
)
SELECT n_parts, x_tot,
       {_w2d("t_num", "//")} / (CAST(x_tot AS DOUBLE)
         * 1000000.0) AS theil_t
FROM (
  SELECT n_parts, x_tot, SUM(term) AS t_num
  FROM lned GROUP BY 1, 2
)
"""


REGISTRY["theil_index_parts"] = {
    "fn": theil_index_parts,
    "sql": _theil_sql(),
}


# --------------------------------------------------------------------------
# Herfindahl-Hirschman concentration of supplier revenue — the
# antitrust-standard market-concentration scalar: HHI = Σ shareᵢ²
# (×10⁴ in the conventional points scale). Computed N-free from exact
# integers: Σ revᵢ² / (Σ rev)², both 128-bit, one wide_to_double
# ratio each; also emits the effective number of suppliers 1/HHI.
# Scale: one groupBy + one moment aggregate.
# --------------------------------------------------------------------------


def hhi_supplier_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        wide_to_double_sql as _w2d,
    )

    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_suppkey").agg(
        F.expr(
            "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * (1 - CAST(l_discount AS DECIMAL(18,2))))"
            " AS DECIMAL(38,4)) * 10000 AS BIGINT)"
        ).alias("rev_e4")
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("rev_e4").cast("bigint").alias("s"),
        F.sum(
            F.expr("CAST(rev_e4 AS DECIMAL(38,0)) * rev_e4")
        ).alias("ss"),
    )
    hhi = (
        f"({_w2d('ss', 'DIV')}"
        " / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))"
    )
    return agg.selectExpr(
        "n_suppliers",
        f"{hhi} AS hhi",
        f"{hhi} * 10000.0 AS hhi_points",
        f"1.0 / {hhi} AS effective_suppliers",
    )


def _hhi_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        wide_to_double_sql as _w2d,
    )

    hhi = (
        f"({_w2d('ss', '//')}"
        " / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))"
    )
    return f"""
WITH per AS (
  SELECT l_suppkey,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,2))))
              AS DECIMAL(38,4)) * 10000 AS BIGINT) AS rev_e4
  FROM lineitem GROUP BY 1
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(SUM(rev_e4) AS BIGINT) AS s,
         SUM(CAST(rev_e4 AS HUGEINT) * rev_e4) AS ss
  FROM per
)
SELECT n_suppliers,
       {hhi} AS hhi,
       {hhi} * 10000.0 AS hhi_points,
       1.0 / {hhi} AS effective_suppliers
FROM agg
"""


REGISTRY["hhi_supplier_revenue"] = {
    "fn": hhi_supplier_revenue,
    "sql": _hhi_sql(),
}


# --------------------------------------------------------------------------
# Theil's L (mean log deviation) over per-part net revenue — the
# bottom-sensitive companion of theil_index_parts (Theil T; T weights
# by income share, L by population share). L = (1/n)·Σ ln(mean/xᵢ)
# = (1/n)·Σ ln(x_tot/(n·xᵢ)). Same pipeline as Theil T: portable-ln
# per part on the ordered integer pair, signed micro-quantization
# (exact half-up toward +inf on the 1e-6 grid, same text both
# engines), one exact integer sum, one final ratio.
# --------------------------------------------------------------------------


def theil_l_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        wide_to_double_sql as _w2d,
        with_portable_ln,
    )

    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.expr(
            "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * (1 - CAST(l_discount AS DECIMAL(18,2))))"
            " AS DECIMAL(38,4)) * 10000 AS BIGINT)"
        ).alias("rev_e4")
    )
    tot = per_part.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("rev_e4").cast("bigint").alias("x_tot"),
    )
    j = per_part.crossJoin(F.broadcast(tot)).filter("rev_e4 > 0")
    j = j.selectExpr(
        "n_parts",
        "x_tot",
        "CAST(x_tot AS DECIMAL(38,0)) AS num",
        "CAST(rev_e4 AS DECIMAL(38,0)) * n_parts AS den",
    )
    lned = with_portable_ln(
        j,
        "CASE WHEN num >= den THEN num ELSE den END",
        "CASE WHEN num >= den THEN den ELSE num END",
        "__pln",
    ).selectExpr(
        "n_parts",
        "x_tot",
        "CAST(floor((CASE WHEN num >= den THEN __pln"
        " ELSE -__pln END) * 1000000.0 + 0.5) AS BIGINT) AS term",
    )
    agg = lned.groupBy("n_parts", "x_tot").agg(
        F.sum("term").cast("bigint").alias("l_num")
    )
    return agg.selectExpr(
        "n_parts",
        "x_tot",
        "CAST(l_num AS DOUBLE)"
        " / (CAST(n_parts AS DOUBLE) * 1000000.0) AS theil_l",
    )


def _theil_l_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
    )

    ln_ctes = portable_ln_duck_ctes(
        "j",
        "n_parts, x_tot, num, den",
        "CASE WHEN num >= den THEN num ELSE den END",
        "CASE WHEN num >= den THEN den ELSE num END",
        "pln",
        "tl",
    )
    return f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,2))))
              AS DECIMAL(38,4)) * 10000 AS BIGINT) AS rev_e4
  FROM lineitem GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(rev_e4) AS BIGINT) AS x_tot
  FROM per_part
),
j AS (
  SELECT n_parts, x_tot,
         CAST(x_tot AS HUGEINT) AS num,
         CAST(rev_e4 AS HUGEINT) * n_parts AS den
  FROM per_part CROSS JOIN tot
  WHERE rev_e4 > 0
),
{ln_ctes},
terms AS (
  SELECT n_parts, x_tot,
         CAST(FLOOR((CASE WHEN num >= den THEN pln
              ELSE -pln END) * 1000000.0 + 0.5) AS BIGINT) AS term
  FROM tl_out
),
agg AS (
  SELECT n_parts, x_tot, CAST(SUM(term) AS BIGINT) AS l_num
  FROM terms GROUP BY 1, 2
)
SELECT n_parts, x_tot,
       CAST(l_num AS DOUBLE)
       / (CAST(n_parts AS DOUBLE) * 1000000.0) AS theil_l
FROM agg
"""


REGISTRY["theil_l_parts"] = {
    "fn": theil_l_parts,
    "sql": _theil_l_sql(),
}
