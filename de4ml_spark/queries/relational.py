"""Core relational queries: scans, filters, projections, joins, aggregations,
windows, limits — the generic operator surface of SURVEY.md §2 exercised over
the driver testdata.

Engine-portability rule used throughout this package: any SUM/AVG over
doubles is computed in exact DECIMAL arithmetic and cast back to DOUBLE at
the end. Double summation order differs between engines (Spark shuffles,
DuckDB streams), so raw double sums are not reproducible; decimal sums are
exact in both engines, so the final cast yields bit-identical doubles. This
also holds on a 1000-executor cluster where partial-aggregate order is
nondeterministic.

Reference parity notes (citations relative to /root/reference/):
- joins/aggs delegated by the reference to DuckDB (logging-service/app/etl.py:68-71)
  and Materialize (join-service/app/main.py:81-96); here they are native
  DataFrame plans optimized by Catalyst/AQE.
- S7 limit-fetch: logging-service/app/lib/storage.py:48-58.
- S4 typed JSON parse: logging-service/app/etl.py:30-38.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.session import load_table


def _dec(col: str, prec: int = 12, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


# --------------------------------------------------------------------------
# Q1: pricing summary (TPC-H Q1 shape) — wide aggregation battery.
# Scale: single shuffle on a 6-value grouping key; partial aggregation
# (map-side combine) reduces shuffle volume to ~nothing. No skew possible.
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 3, 2)
    charge_tax = F.lit(1).cast("decimal(3,2)") + _dec("l_tax", 3, 2)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * disc).cast("double").alias("sum_disc_price"),
            F.sum(_dec("l_extendedprice") * disc * charge_tax)
            .cast("double")
            .alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            (F.sum(_dec("l_discount", 3, 2)).cast("double") / F.count(F.lit(1))).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
    AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
           * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE)
    AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Q3: shipping-priority top-k (TPC-H Q3 shape) — 3-way join + agg + top-k.
# Scale: customer filter is applied before the join (Catalyst pushes it to
# the parquet scan); orders⋈customer broadcasts the filtered customer side;
# lineitem⋈orders shuffles on orderkey. Top-k is a global sort of the small
# aggregated result only.
# --------------------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp_ntz")
    )
    disc = F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 3, 2)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_dec("l_extendedprice") * disc).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


Q3_SQL = """
SELECT
  l_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
    AS revenue,
  CAST(o_orderdate AS DATE) AS o_orderdate,
  o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01'
  AND l_shipdate > TIMESTAMP '1999-01-01'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Q5: revenue by customer nation within a region — 5-way star join.
# Scale: region/nation/customer/supplier are dimensions → broadcast; only
# lineitem⋈orders is a shuffle join on orderkey. Catalyst reorders the joins;
# AQE converts to broadcast at runtime if a side is small post-filter.
# --------------------------------------------------------------------------

def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 3, 2)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_dec("l_extendedprice") * disc).cast("double").alias("revenue"))
    )


Q5_SQL = """
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
    AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# Broadcast dimension join: suppliers per region (nation⋈region broadcast).
# --------------------------------------------------------------------------

def suppliers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(_dec("s_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


SUPPLIERS_PER_REGION_SQL = """
SELECT
  r_name,
  COUNT(*) AS n_suppliers,
  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --------------------------------------------------------------------------
# Grouped counts: order priority distribution (simple agg, P-series filters).
# --------------------------------------------------------------------------

def orders_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") != "F")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
    )


ORDERS_PRIORITY_SQL = """
SELECT
  o_orderpriority,
  o_orderstatus,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderstatus <> 'F'
GROUP BY o_orderpriority, o_orderstatus
"""


# --------------------------------------------------------------------------
# J2 flagship analog: CTR per user over the events stream table.
# searches↔clicks join key design: logging-service/app/contracts.py:40-42.
# Scale: one shuffle on user_id; conditional aggregation avoids a self-join.
# --------------------------------------------------------------------------

def ctr_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    views = F.count(F.when(F.col("event_type") == "view", F.lit(1)))
    clicks = F.count(F.when(F.col("event_type") == "click", F.lit(1)))
    return (
        ev.groupBy("user_id")
        .agg(views.alias("n_views"), clicks.alias("n_clicks"))
        .filter(F.col("n_views") > 0)
        .withColumn("ctr", F.col("n_clicks") / F.col("n_views"))
    )


CTR_SQL = """
SELECT
  user_id,
  COUNT(*) FILTER (WHERE event_type = 'view') AS n_views,
  COUNT(*) FILTER (WHERE event_type = 'click') AS n_clicks,
  CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS DOUBLE)
    / COUNT(*) FILTER (WHERE event_type = 'view') AS ctr
FROM events
GROUP BY user_id
HAVING COUNT(*) FILTER (WHERE event_type = 'view') > 0
"""


# --------------------------------------------------------------------------
# J4 batch shape: top-3 orders per customer (row_number window).
# join-service/README.md:116-124 (last-reward exercise → argmax-per-group).
# Scale: one shuffle on the partition key; no global sort.
# --------------------------------------------------------------------------

def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


TOP3_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rank
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
)
WHERE rank <= 3
"""


# --------------------------------------------------------------------------
# S4: typed JSON parse of events.props (from_json with contract schema).
# logging-service/app/etl.py:30-38; schema build jsonschema.py:104-135.
# Scale: from_json is JVM-side codegen — no Python in the hot path.
# --------------------------------------------------------------------------

def parse_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("props_t", F.from_json("props", "k BIGINT"))
    return (
        parsed.select("event_type", F.col("props_t.k").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_parsed"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
    )


# json_valid + json_type + TRY_CAST mirror Spark's PERMISSIVE
# from_json (malformed JSON / wrong-typed k -> NULL, never an error):
# DuckDB's raw ->> RAISES on malformed input, and its VARCHAR->BIGINT
# cast ROUNDS decimal strings ('1.5' -> 2) where Spark's strict long
# parse rejects them — both caught by the round-14 badjson parity
# sweep (a scraped-producer shard must degrade, not kill the job).
PARSE_PROPS_SQL = """
WITH parsed AS (
  SELECT event_type,
         CASE WHEN json_valid(props)
              AND json_type(props, '$.k') IN ('INTEGER','UBIGINT','BIGINT')
              THEN TRY_CAST(props->>'k' AS BIGINT) END AS k
  FROM events
)
SELECT
  event_type,
  COUNT(k) AS n_parsed,
  MIN(k) AS min_k,
  MAX(k) AS max_k,
  CAST(SUM(k) AS BIGINT) AS sum_k
FROM parsed
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# S7: row-limited fetch with audit timestamp column.
# logging-service/app/lib/storage.py:48-58 (LIMIT n + __ts audit column).
# The reference's LIMIT has no ORDER BY (nondeterministic prefix); we order
# by the event id so the oracle comparison is deterministic (SURVEY §2.5).
# --------------------------------------------------------------------------

def limit_fetch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy("event_id")
        .limit(100)
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            "props",
            F.col("ts").alias("__ts"),
        )
    )


LIMIT_FETCH_SQL = """
SELECT event_id, user_id, event_type, value, props, ts AS "__ts"
FROM events
ORDER BY event_id
LIMIT 100
"""


REGISTRY: dict[str, dict] = {
    "q1_pricing_summary": {"fn": q1_pricing_summary, "sql": Q1_SQL},
    "q3_shipping_priority": {"fn": q3_shipping_priority, "sql": Q3_SQL},
    "q5_region_revenue": {"fn": q5_region_revenue, "sql": Q5_SQL},
    "suppliers_per_region": {"fn": suppliers_per_region, "sql": SUPPLIERS_PER_REGION_SQL},
    "orders_priority_counts": {"fn": orders_priority_counts, "sql": ORDERS_PRIORITY_SQL},
    "ctr_per_user": {"fn": ctr_per_user, "sql": CTR_SQL},
    "top3_orders_per_customer": {"fn": top3_orders_per_customer, "sql": TOP3_SQL},
    "parse_event_props": {"fn": parse_event_props, "sql": PARSE_PROPS_SQL},
    "limit_fetch_events": {"fn": limit_fetch_events, "sql": LIMIT_FETCH_SQL},
}
