"""TPC-H-shape completion tier: the classic decision-support shapes not yet
in the catalog — market-share CASE ratios (Q8), delay-bucket conditional
counts (Q12 adapted: the testdata lineitem has no shipmode/commitdate, so
the bucket is order->ship delay), view-max scalar subqueries (Q15),
correlated-average decorrelation (Q17), EXISTS/NOT-EXISTS decorrelated to
a window fixpoint (Q21 adapted to shipdate), and scalar-subquery +
anti-join customer screening (Q22 adapted: nations stand in for the phone
country code, which the testdata customer lacks).

Spark-first notes: every dimension side is broadcast; correlated
subqueries become broadcast scalar/aggregate joins (what Catalyst's
decorrelation would emit); the only big-big shuffles are lineitem><orders
equi-joins on the order key. Double aggregates use the decimal-exact
pattern (cast DECIMAL, SUM, cast back) so the DuckDB oracle value-hash
matches bit-for-bit; ratios divide two exact doubles ONCE (a single IEEE
op is engine-stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.session import load_table


def _dec(col: str, prec: int = 12, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


def _vol():
    """Exact revenue volume: extendedprice * (1 - discount) in DECIMAL."""
    return _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 3, 2)
    )


_VOL_DUCK = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


# --------------------------------------------------------------------------
# Q8: national market share — NATION_3 suppliers' revenue share of ECONOMY
# parts sold to ASIA customers, per order year. The share is a conditional
# decimal SUM over the supplier nation divided by the total, computed in
# one aggregate (no second pass). Joins: two big tables shuffle on the
# order key; part/customer/nation/region/supplier broadcast.
# --------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _vol().alias("vol")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_key"))
        .select(F.year("o_orderdate").alias("o_year"), "supp_nation", vol)
    )
    zero = F.lit(0).cast("decimal(16,4)")
    return joined.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(zero))
            .cast("double")
            / F.sum("vol").cast("double")
        ).alias("mkt_share")
    )


Q8_SQL = f"""
SELECT EXTRACT(year FROM o_orderdate)::INTEGER AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN {_VOL_DUCK}
                     ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
       / CAST(SUM({_VOL_DUCK}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q12 (adapted): order->ship delay buckets x order priority. The testdata
# lineitem has no shipmode/commitdate/receiptdate, so the Q12 shape —
# conditional CASE counts of high/low priority per category — runs on the
# order-to-ship delay instead. One lineitem><orders shuffle, integer
# datediff (exact on both engines).
# --------------------------------------------------------------------------

def q12_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.when(delay <= 30, F.lit("fast")).otherwise(F.lit("slow")).alias(
                "delay_bucket"
            ),
            high.alias("is_high"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.count(F.when(F.col("is_high"), 1)).alias("high_line_count"),
            F.count(F.when(~F.col("is_high"), 1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
                          CAST(l_shipdate AS DATE)) <= 30
            THEN 'fast' ELSE 'slow' END AS delay_bucket,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q15: top supplier — per-supplier revenue over one quarter, return the
# supplier(s) achieving the max. The scalar subquery (SELECT MAX(...))
# becomes a broadcast of the 1-row max joined on equality of exact
# decimal-derived doubles (identical on both engines, so the equality is
# safe cross-engine).
# --------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_vol()).cast("double").alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == top.max_revenue)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, CAST(SUM({_VOL_DUCK}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue — average yearly revenue lost if
# Brand#13 orders below 20% of the part's average quantity were not taken.
# The correlated per-part AVG subquery decorrelates to a groupBy + join
# (both sides pruned to one brand by a broadcast part filter, so the join
# is broadcast too). The 0.2*avg threshold is one multiply of an exact
# double — engine-stable.
# --------------------------------------------------------------------------

def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    li = load_table(spark, sf_dir, "lineitem")
    brand_li = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = brand_li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        brand_li.join(
            F.broadcast(avg_qty), F.col("l_partkey") == F.col("a_partkey")
        )
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


Q17_SQL = """
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13'
),
avg_qty AS (
  SELECT l_partkey AS a_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS avg_qty
  FROM brand_li GROUP BY 1
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM brand_li JOIN avg_qty ON l_partkey = a_partkey
WHERE l_quantity < 0.2 * avg_qty
"""


# --------------------------------------------------------------------------
# Q21 (adapted): suppliers who kept multi-supplier orders waiting — for
# finished ('F') orders with 2+ suppliers, the supplier whose latest
# shipment IS the order's latest (no receipt/commit dates in the testdata,
# so lateness = last shipdate). The classic EXISTS / NOT EXISTS pair
# decorrelates exactly: "no other supplier shipped strictly later" iff this
# supplier's max equals the order max, and "another supplier exists" iff
# the order has 2+ supplier groups — one window over the per-(order,
# supplier) aggregate instead of two correlated probes. The oracle keeps
# the EXISTS/NOT EXISTS form to pin the semantics.
# --------------------------------------------------------------------------

def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    ms = (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("m"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = ms.select(
        "l_orderkey",
        "l_suppkey",
        "m",
        F.max("m").over(w).alias("m1"),
        F.count(F.lit(1)).over(w).alias("n_supp"),
    )
    waits = flagged.filter((F.col("n_supp") > 1) & (F.col("m") == F.col("m1")))
    return (
        waits.join(F.broadcast(supp), waits.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q21_SQL = """
WITH ms AS (
  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS m
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
)
SELECT s_name, COUNT(*) AS numwait
FROM ms l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND EXISTS (SELECT 1 FROM ms l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM ms l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.m > l1.m)
GROUP BY s_name
"""


# --------------------------------------------------------------------------
# Q22 (adapted): idle wealthy customers — above-average balances with no
# RECENT orders (2001+), by nation (the testdata customer has no phone, so
# nation stands in for the country code; the testdata order density gives
# every customer ~10 lifetime orders, so the lifetime anti-join is empty —
# the recency filter keeps the shape and a non-trivial result). The scalar
# AVG subquery broadcasts as a 1-row cross join; NOT EXISTS(recent orders)
# is a left_anti join on the customer key.
# --------------------------------------------------------------------------

_Q22_NATIONS = ("NATION_2", "NATION_7", "NATION_12", "NATION_17", "NATION_22")


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*_Q22_NATIONS)
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


_Q22_IN = ", ".join(f"'{n}'" for n in _Q22_NATIONS)

Q22_SQL = f"""
WITH cust AS (
  SELECT c_custkey, c_acctbal, n_name
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE n_name IN ({_Q22_IN})
)
SELECT n_name, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM cust c
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                          / COUNT(*)
                   FROM cust WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY n_name
"""


REGISTRY = {
    "q8_market_share": {"fn": q8_market_share, "sql": Q8_SQL},
    "q12_ship_delay_priority": {"fn": q12_ship_delay_priority, "sql": Q12_SQL},
    "q15_top_supplier": {"fn": q15_top_supplier, "sql": Q15_SQL},
    "q17_small_quantity_revenue": {
        "fn": q17_small_quantity_revenue,
        "sql": Q17_SQL,
    },
    "q21_waiting_supplier": {"fn": q21_waiting_supplier, "sql": Q21_SQL},
    "q22_idle_customers": {"fn": q22_idle_customers, "sql": Q22_SQL},
}
