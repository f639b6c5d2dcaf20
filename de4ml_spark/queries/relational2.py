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


# --------------------------------------------------------------------------
# Q4 shape: EXISTS semi-join — orders with at least one late-shipped item.
# LEFT SEMI join never multiplies rows and ships only the join key; at
# scale the orderkey-partitioned shuffle is the whole cost.
# --------------------------------------------------------------------------

def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_shipdate").isNotNull()).select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS
)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q10 shape: returned-item revenue per customer, top 20. The two fact
# tables shuffle-join on orderkey; customer/nation dims broadcast. LIMIT
# is deterministic via (revenue DESC, custkey ASC) total order.
# --------------------------------------------------------------------------

def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 3, 2)
    revenue = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(_dec("l_extendedprice") * disc).cast("double").alias("revenue"))
    )
    return (
        revenue.join(
            F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey", "c_name", F.col("n_name").alias("nation"), "revenue"
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name AS nation,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# Q14 shape: promo revenue share — conditional aggregate over a broadcast
# dim join; the part table broadcasts, so the only shuffle is the single-row
# final reduction.
# --------------------------------------------------------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc_price = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 3, 2)
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type").startswith("PROMO"), disc_price).otherwise(
                        F.lit(0).cast("decimal(12,2)")
                    )
                ).cast("double")
                / F.sum(disc_price).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q14_SQL = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
       AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


# --------------------------------------------------------------------------
# Q7 shape: bidirectional nation-pair trade volume — two broadcast joins of
# the SAME dim under different aliases, fact⋈fact shuffle join on orderkey.
# --------------------------------------------------------------------------

def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    disc_price = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 3, 2)
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(year FROM l_shipdate) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# ROLLUP: subtotal lattice over (priority, status) — Spark expands to a
# grouping-set union in one pass (Expand operator), not one scan per level.
# --------------------------------------------------------------------------

def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
    )


ORDERS_ROLLUP_SQL = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
HAVING COUNT(*) > 0
"""
# HAVING: empty-input parity — Spark's Expand-based ROLLUP emits zero
# rows on a zero-row shard (no grand-total row), where DuckDB follows
# the standard and emits one; every real rollup row has COUNT >= 1, so
# this is a no-op on any non-empty input. Closing the gap Spark-side
# would cost a second full scan at 100 TB.


# --------------------------------------------------------------------------
# PIVOT: per-day event-type counts as columns. Spark's pivot with an
# explicit value list compiles to conditional aggregates — one scan, one
# shuffle, no per-value scans.
# --------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


EVENTS_PIVOT_SQL = """
SELECT CAST(ts AS DATE) AS day,
       COUNT(*) FILTER (event_type = 'click') AS click,
       COUNT(*) FILTER (event_type = 'error') AS error,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'signup') AS signup,
       COUNT(*) FILTER (event_type = 'view') AS view
FROM events
GROUP BY 1
"""


# --------------------------------------------------------------------------
# As-of (point-in-time) join: each click gets the most recent prior view's
# value for the same user — the no-future-leakage feature join. Spark path:
# union + carry-forward window (ONE shuffle, linear, operators/asof.py);
# oracle: DuckDB's native ASOF JOIN.
# --------------------------------------------------------------------------

def asof_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # equal-instant views resolve via the event_id tiebreak inside the
    # carry-forward sort (same result as a max_by pre-agg, one less shuffle)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_event_id"),
        F.col("value").alias("view_value"),
    )
    return asof_join(
        clicks,
        views,
        on="user_id",
        payload=["view_value"],
        right_tiebreak=["view_event_id"],
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_asof").alias("view_ts"),
        F.round("view_value_asof", 6).alias("view_value"),
    )


ASOF_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
views AS (
  SELECT user_id, ts, arg_max([value], event_id)[1] AS view_value
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id, c.ts,
       v.ts AS view_ts, ROUND(v.view_value, 6) AS view_value
FROM clicks c
ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND v.ts <= c.ts
"""


# --------------------------------------------------------------------------
# Feature-store point-in-time join ACROSS tables: each order probes the
# event stream for its customer's latest feature values as of the order
# instant — the training-set assembly join every feature store performs
# (no future leakage by construction). The orders clock (1995-2001) is
# deterministically aligned into the events window (Jan 2024) so probes
# interleave with features; customers with no event stream keep NULL
# features (LEFT semantics). Spark path: the same union + carry-forward
# shape as asof_click_view — ONE shuffle of |probes|+|features| rows, no
# O(|L|*|R|) range join; oracle: DuckDB native ASOF LEFT JOIN.
# --------------------------------------------------------------------------

PIT_USER_CAP = 300  # probe orders of users 0..299: half have event streams


def pit_features_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    # no pre-aggregation: equal-instant ties resolve inside the carry-
    # forward sort via the event_id tiebreak (latest writer wins), so the
    # whole PIT join is ONE exchange of |probes|+|events| rows
    feats = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.col("value").alias("feat_value"),
        F.col("event_type").alias("feat_type"),
    )
    probe_ts = F.expr(
        "timestampadd(MINUTE, CAST(o_orderkey % 43200 AS INT),"
        " TIMESTAMP'2024-01-01 00:00:00')"
    ).cast("timestamp_ntz")
    probes = orders.filter(F.col("o_custkey") < PIT_USER_CAP).select(
        "o_orderkey",
        F.col("o_custkey").alias("user_id"),
        probe_ts.alias("ts"),
    )
    return asof_join(
        probes,
        feats,
        on="user_id",
        payload=["feat_value", "feat_type"],
        right_tiebreak=["event_id"],
    ).select(
        "o_orderkey",
        "user_id",
        F.col("ts").alias("probe_ts"),
        F.col("ts_asof").alias("feat_ts"),
        F.round("feat_value_asof", 6).alias("feat_value"),
        F.col("feat_type_asof").alias("feat_type"),
    )


# --------------------------------------------------------------------------
# Nearest-event join: each click matches the view with the smallest
# |ts delta| within a 10-minute tolerance — the BIDIRECTIONAL as-of
# (sensor reading nearest a label instant, either side). Equidistant ties
# prefer the earlier view; equal-instant views resolve via the event_id
# tiebreak. Same union + carry-forward machinery as the as-of join (ONE
# key exchange, no range join); the oracle replays the identical
# prev/next window formulation (DuckDB has no native nearest join).
# --------------------------------------------------------------------------

NEAREST_TOL_US = 600_000_000  # 10 minutes


def nearest_view_per_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.asof import nearest_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_event_id"),
        F.col("value").alias("view_value"),
    )
    return nearest_join(
        clicks,
        views,
        on="user_id",
        tolerance_us=NEAREST_TOL_US,
        payload=["view_value"],
        right_tiebreak=["view_event_id"],
    ).select(
        "event_id",
        "user_id",
        "ts",
        "ts_near",
        F.round("view_value_near", 6).alias("view_value"),
        "dist_us",
    )


NEAREST_SQL = f"""
WITH u AS (
  SELECT user_id, epoch_us(ts) AS t, 1 AS src, event_id,
         CAST(NULL AS BIGINT) AS tb, ts AS l_ts,
         CAST(NULL AS BIGINT) AS rt, CAST(NULL AS DOUBLE) AS rv
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, epoch_us(ts), 0, NULL, event_id, NULL,
         epoch_us(ts), value
  FROM events WHERE event_type = 'view'
),
c AS (
  SELECT *,
         last_value((CASE WHEN src = 0 THEN struct_pack(rt := rt, rv := rv) END) IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t, src, tb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
         first_value((CASE WHEN src = 0 THEN struct_pack(rt := rt, rv := rv) END) IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t, src, tb
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next
  FROM u
),
p AS (
  SELECT event_id, user_id, l_ts AS ts, t,
         prev, next,
         t - prev.rt AS d_prev, next.rt - t AS d_next,
         (prev IS NOT NULL AND t - prev.rt <= {NEAREST_TOL_US}) AS prev_ok,
         (next IS NOT NULL AND next.rt - t <= {NEAREST_TOL_US}) AS next_ok
  FROM c WHERE src = 1
)
SELECT event_id, user_id, ts,
       CASE WHEN prev_ok AND (NOT next_ok OR d_prev <= d_next)
            THEN make_timestamp(prev.rt)
            WHEN next_ok THEN make_timestamp(next.rt) END AS ts_near,
       ROUND(CASE WHEN prev_ok AND (NOT next_ok OR d_prev <= d_next)
                  THEN prev.rv
                  WHEN next_ok THEN next.rv END, 6) AS view_value,
       CASE WHEN prev_ok AND (NOT next_ok OR d_prev <= d_next) THEN d_prev
            WHEN next_ok THEN d_next END AS dist_us
FROM p
"""


PIT_SQL = f"""
WITH feats AS (
  SELECT user_id, ts, arg_max([value], event_id)[1] AS feat_value,
         arg_max([event_type], event_id)[1] AS feat_type
  FROM events GROUP BY user_id, ts
),
probes AS (
  SELECT o_orderkey, o_custkey AS user_id,
         TIMESTAMP '2024-01-01 00:00:00'
           + (o_orderkey % 43200) * INTERVAL 1 MINUTE AS ts
  FROM orders WHERE o_custkey < {PIT_USER_CAP}
)
SELECT p.o_orderkey, p.user_id, p.ts AS probe_ts,
       f.ts AS feat_ts, ROUND(f.feat_value, 6) AS feat_value,
       f.feat_type
FROM probes p
ASOF LEFT JOIN feats f
  ON p.user_id = f.user_id AND f.ts <= p.ts
"""


REGISTRY: dict[str, dict] = {
    "q6_forecast_revenue": {"fn": q6_forecast_revenue, "sql": Q6_SQL},
    "asof_click_view": {"fn": asof_click_view, "sql": ASOF_SQL},
    "pit_features_orders": {"fn": pit_features_orders, "sql": PIT_SQL},
    "nearest_view_per_click": {
        "fn": nearest_view_per_click,
        "sql": NEAREST_SQL,
    },
    "q7_nation_volume": {"fn": q7_nation_volume, "sql": Q7_SQL},
    "orders_rollup": {"fn": orders_rollup, "sql": ORDERS_ROLLUP_SQL},
    "events_pivot": {"fn": events_pivot, "sql": EVENTS_PIVOT_SQL},
    "sliding_window_events": {"fn": sliding_window_events, "sql": SLIDING_WINDOW_SQL},
    "part_type_stats": {"fn": part_type_stats, "sql": PART_TYPE_SQL},
    "events_dau": {"fn": events_dau, "sql": EVENTS_DAU_SQL},
    "q4_late_orders": {"fn": q4_late_orders, "sql": Q4_SQL},
    "q10_returned_revenue": {"fn": q10_returned_revenue, "sql": Q10_SQL},
    "q14_promo_revenue": {"fn": q14_promo_revenue, "sql": Q14_SQL},
}
