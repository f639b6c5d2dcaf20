"""ML-data metrics tier VI (round 9b): survival comparison and
ranking-quality metrics over the synthetic warehouse — the log-rank
cohort test and Nelson-Aalen hazard that extend life_table_retention
into COMPARATIVE retention analysis, 2×2 association effect sizes,
and the MRR / MAP@K ranking metrics that complete the
popularity-baseline evaluation harness (hitrate → ndcg → mrr/map),
plus pairwise association-rule mining over order baskets.

Reference parity: the reference's dataops loop scores model quality
per batch (dataops/app/loop.py) and alerts on drift; these are the
metric kernels such a loop consumes.

Exactness discipline (operators/portable_hash.py): integer counts
and moments end-to-end; per-interval / per-user rational terms are
half-up micro- or nano-quantized to integers BEFORE any cross-row
sum (engine double-sum order differs); 128-bit intermediates through
wide_to_double_sql; final scalar chains are the SAME SQL text on
both engines. Result schemas stay driver-safe (BIGINT/DOUBLE/STRING).

Scale posture (100 TB): user-span and basket reductions are single
groupBys on the fact tables; interval tables are retention-window
bounded (weeks); top-K and 2×2 frames are constant-size broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.operators.portable_hash import (
    wide_halfup_div_sql as _whd,
    wide_to_double_sql as _w2d,
)
from de4ml_spark.session import load_table

REGISTRY: dict = {}


def _big(div: str) -> str:
    return "DECIMAL(38,0)" if div.upper() == "DIV" else "HUGEINT"


# --------------------------------------------------------------------------
# Two-cohort log-rank test on weekly retention: deterministic A/B
# cohorts (even vs odd user_id — balanced at every sf, the canonical
# experiment-analysis shape), over the SAME user-span life-table model as
# life_table_retention (statq2.py — churned = last event before the
# corpus horizon, weekly intervals). Per interval with pooled deaths:
# O−E and the hypergeometric variance are fixed IEEE chains from
# exact integer risk sets, micro-quantized and integer-summed;
# z = Σ(O−E)/√ΣV and chi² = z². Interval table is weeks-bounded.
# --------------------------------------------------------------------------

_LOGRANK_FINAL = [
    "n_intervals",
    "d_total",
    "CAST(sum_oe_u AS DOUBLE) / 1000000.0 AS oe_a",
    "(CAST(sum_oe_u AS DOUBLE) / 1000000.0)"
    " / sqrt(CAST(sum_v_u AS DOUBLE) / 1000000.0) AS z_logrank",
    "((CAST(sum_oe_u AS DOUBLE) / 1000000.0)"
    " * (CAST(sum_oe_u AS DOUBLE) / 1000000.0))"
    " / (CAST(sum_v_u AS DOUBLE) / 1000000.0) AS chi2_logrank",
]

_LOGRANK_TERMS = [
    "CAST(floor((CAST(d_a AS DOUBLE)"
    " - CAST(d_i AS DOUBLE) * CAST(n_a AS DOUBLE)"
    " / CAST(n_i AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS oe_u",
    "CAST(floor(CAST(d_i AS DOUBLE)"
    " * (CAST(n_a AS DOUBLE) / CAST(n_i AS DOUBLE))"
    " * (CAST(n_b AS DOUBLE) / CAST(n_i AS DOUBLE))"
    " * (CAST(n_i - d_i AS DOUBLE)"
    " / CAST(GREATEST(n_i - 1, 1) AS DOUBLE))"
    " * 1000000.0 + 0.5) AS BIGINT) AS v_u",
]


def logrank_test_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    grp = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("date")).alias("d0"),
            F.max(F.col("ts").cast("date")).alias("d1"),
            F.max(
                F.expr("CAST(user_id % 2 = 0 AS INT)")
            ).alias("is_a"),
        )
    )
    horizon = grp.agg(F.max("d1").alias("hmax"))
    per_user = grp.crossJoin(F.broadcast(horizon)).selectExpr(
        "datediff(d1, d0) DIV 7 AS iv",
        "CAST(d1 < hmax AS INT) AS churned",
        "is_a",
    )
    table = (
        per_user.selectExpr(
            "iv", "churned", "is_a", "explode(sequence(0, iv)) AS i"
        )
        .groupBy("i")
        .agg(
            F.sum(F.expr("CAST(is_a = 1 AS BIGINT)"))
            .cast("bigint")
            .alias("n_a"),
            F.sum(F.expr("CAST(is_a = 0 AS BIGINT)"))
            .cast("bigint")
            .alias("n_b"),
            F.sum(
                F.expr("CAST(churned = 1 AND iv = i AND is_a = 1"
                       " AS BIGINT)")
            )
            .cast("bigint")
            .alias("d_a"),
            F.sum(
                F.expr("CAST(churned = 1 AND iv = i AS BIGINT)")
            )
            .cast("bigint")
            .alias("d_i"),
        )
    )
    terms = table.filter("d_i > 0").selectExpr(
        "n_a + n_b AS n_i", "n_a", "n_b", "d_a", "d_i"
    ).selectExpr("d_i", *_LOGRANK_TERMS)
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum("d_i").cast("bigint").alias("d_total"),
        F.sum("oe_u").cast("bigint").alias("sum_oe_u"),
        F.sum("v_u").cast("bigint").alias("sum_v_u"),
    )
    return agg.selectExpr(*_LOGRANK_FINAL)


def _logrank_sql() -> str:
    terms = ",\n         ".join(_LOGRANK_TERMS)
    final = ",\n       ".join(_LOGRANK_FINAL)
    return f"""
WITH grp AS (
  SELECT user_id,
         MIN(CAST(ts AS DATE)) AS d0,
         MAX(CAST(ts AS DATE)) AS d1,
         MAX(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
           AS is_a
  FROM events
  WHERE user_id IS NOT NULL
  GROUP BY 1
),
horizon AS (SELECT MAX(d1) AS hmax FROM grp),
per_user AS (
  SELECT date_diff('day', d0, d1) // 7 AS iv,
         CASE WHEN d1 < hmax THEN 1 ELSE 0 END AS churned,
         is_a
  FROM grp CROSS JOIN horizon
),
tbl AS (
  SELECT i,
         CAST(SUM(CASE WHEN is_a = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_a,
         CAST(SUM(CASE WHEN is_a = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_b,
         CAST(SUM(CASE WHEN churned = 1 AND iv = i AND is_a = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS d_a,
         CAST(SUM(CASE WHEN churned = 1 AND iv = i
                  THEN 1 ELSE 0 END) AS BIGINT) AS d_i
  FROM (SELECT iv, churned, is_a, UNNEST(range(0, iv + 1)) AS i
        FROM per_user)
  GROUP BY 1
),
terms AS (
  SELECT d_i,
         {terms}
  FROM (SELECT n_a + n_b AS n_i, n_a, n_b, d_a, d_i
        FROM tbl WHERE d_i > 0)
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_intervals,
         CAST(SUM(d_i) AS BIGINT) AS d_total,
         CAST(SUM(oe_u) AS BIGINT) AS sum_oe_u,
         CAST(SUM(v_u) AS BIGINT) AS sum_v_u
  FROM terms
)
SELECT {final}
FROM agg
"""


REGISTRY["logrank_test_retention"] = {
    "fn": logrank_test_retention,
    "sql": _logrank_sql(),
}


# --------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard over the same weekly life table —
# the estimator that pairs with life_table_retention's Kaplan-Meier
# log-survival: H(i) = Σ_{j≤i} d_j/n_j, each hazard increment an
# EXACT int64 half-up nano-quotient (d·1e9/n — safe to d ≈ 9e9),
# prefix-summed as integers over the weeks-bounded interval table.
# --------------------------------------------------------------------------

_NA_FINAL = [
    "i",
    "n_enter",
    "d_i",
    "CAST(cum_h_n AS DOUBLE) / 1000000000.0 AS na_cumhaz",
]


def nelson_aalen_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    spans = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("date")).alias("d0"),
            F.max(F.col("ts").cast("date")).alias("d1"),
        )
    )
    horizon = spans.agg(F.max("d1").alias("hmax"))
    per_user = spans.crossJoin(F.broadcast(horizon)).selectExpr(
        "datediff(d1, d0) DIV 7 AS iv",
        "CAST(d1 < hmax AS INT) AS churned",
    )
    table = (
        per_user.selectExpr(
            "iv", "churned", "explode(sequence(0, iv)) AS i"
        )
        .groupBy("i")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_enter"),
            F.sum(
                F.expr("CAST(churned = 1 AND iv = i AS BIGINT)")
            ).cast("bigint").alias("d_i"),
        )
    )
    h = table.selectExpr(
        "i",
        "n_enter",
        "d_i",
        "(2 * d_i * 1000000000 + n_enter) DIV (2 * n_enter) AS h_n",
    )
    wcum = (
        Window.partitionBy(F.lit(1))
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return h.withColumn(
        "cum_h_n", F.sum("h_n").over(wcum).cast("bigint")
    ).selectExpr(*_NA_FINAL)


def _na_sql() -> str:
    final = ",\n       ".join(_NA_FINAL)
    return f"""
WITH spans AS (
  SELECT user_id,
         MIN(CAST(ts AS DATE)) AS d0,
         MAX(CAST(ts AS DATE)) AS d1
  FROM events
  WHERE user_id IS NOT NULL
  GROUP BY 1
),
horizon AS (SELECT MAX(d1) AS hmax FROM spans),
per_user AS (
  SELECT date_diff('day', d0, d1) // 7 AS iv,
         CASE WHEN d1 < hmax THEN 1 ELSE 0 END AS churned
  FROM spans CROSS JOIN horizon
),
tbl AS (
  SELECT i,
         CAST(COUNT(*) AS BIGINT) AS n_enter,
         CAST(SUM(CASE WHEN churned = 1 AND iv = i
                  THEN 1 ELSE 0 END) AS BIGINT) AS d_i
  FROM (SELECT iv, churned, UNNEST(range(0, iv + 1)) AS i
        FROM per_user)
  GROUP BY 1
),
h AS (
  SELECT i, n_enter, d_i,
         (2 * d_i * 1000000000 + n_enter) // (2 * n_enter) AS h_n
  FROM tbl
)
SELECT {final}
FROM (
  SELECT i, n_enter, d_i,
         CAST(SUM(h_n) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED
           PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_h_n
  FROM h
)
"""


REGISTRY["nelson_aalen_retention"] = {
    "fn": nelson_aalen_retention,
    "sql": _na_sql(),
}


# --------------------------------------------------------------------------
# 2×2 effect-size battery on documents: exposure = lang 'en',
# outcome = long document (n_chars ≥ 300). Odds ratio, Yule's Q and
# phi from the exact cell counts: OR through a wide_to_double ratio,
# its log-SE via the Woolf 1/a+1/b+1/c+1/d chain, phi via the exact
# (ad−bc) wide numerator. One groupBy to four cells; zero-cell guard
# returns NULLs (documented Haldane-free convention).
# --------------------------------------------------------------------------


def _or_final(div: str) -> list[str]:
    big = _big(div)
    ad = f"CAST(a AS {big}) * d"
    bc = f"CAST(b AS {big}) * c"
    rr = (
        f"CAST(r1 AS {big}) * r2 * c1 * c2"
    )
    guard = "a >= 1 AND b >= 1 AND c >= 1 AND d >= 1"
    return [
        "a",
        "b",
        "c",
        "d",
        f"CASE WHEN {guard} THEN {_w2d(ad, div)} / {_w2d(bc, div)}"
        " ELSE NULL END AS odds_ratio",
        f"CASE WHEN {guard} THEN"
        " sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE)"
        " + 1.0 / CAST(c AS DOUBLE) + 1.0 / CAST(d AS DOUBLE))"
        " ELSE NULL END AS log_or_se",
        f"{_w2d(f'{ad} - {bc}', div)}"
        f" / NULLIF({_w2d(ad, div)} + {_w2d(bc, div)}, 0.0) AS yule_q",
        f"{_w2d(f'{ad} - {bc}', div)}"
        f" / NULLIF(sqrt({_w2d(rr, div)}), 0.0) AS phi",
    ]


def odds_ratio_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.agg(
        F.sum(
            F.expr("CAST(lang = 'en' AND n_chars >= 300 AS BIGINT)")
        )
        .cast("bigint")
        .alias("a"),
        F.sum(
            F.expr("CAST(lang = 'en' AND n_chars < 300 AS BIGINT)")
        )
        .cast("bigint")
        .alias("b"),
        F.sum(
            F.expr("CAST(lang <> 'en' AND n_chars >= 300 AS BIGINT)")
        )
        .cast("bigint")
        .alias("c"),
        F.sum(
            F.expr("CAST(lang <> 'en' AND n_chars < 300 AS BIGINT)")
        )
        .cast("bigint")
        .alias("d"),
    )
    marg = cells.selectExpr(
        "a",
        "b",
        "c",
        "d",
        "a + b AS r1",
        "c + d AS r2",
        "a + c AS c1",
        "b + d AS c2",
    )
    return marg.selectExpr(*_or_final("DIV"))


def _or_sql() -> str:
    final = ",\n       ".join(_or_final("//"))
    return f"""
WITH cells AS (
  SELECT
    CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 300
             THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(SUM(CASE WHEN lang = 'en' AND n_chars < 300
             THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(SUM(CASE WHEN lang <> 'en' AND n_chars >= 300
             THEN 1 ELSE 0 END) AS BIGINT) AS c,
    CAST(SUM(CASE WHEN lang <> 'en' AND n_chars < 300
             THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM documents
)
SELECT {final}
FROM (
  SELECT a, b, c, d,
         a + b AS r1, c + d AS r2, a + c AS c1, b + d AS c2
  FROM cells
)
"""


REGISTRY["odds_ratio_docs"] = {
    "fn": odds_ratio_docs,
    "sql": _or_sql(),
}


# --------------------------------------------------------------------------
# Mean reciprocal rank of the popularity baseline — same temporal
# split / top-K recommender as popularity_hitrate_orders
# (mldataq4.py): rank the K recommendations (count DESC, partkey),
# score 1/rank-of-first-hit per held-out customer. Each reciprocal is
# an exact int64 half-up nano-quotient; the mean divides the integer
# sum once. The rank window runs over the K-row broadcast only.
# --------------------------------------------------------------------------

MRR_K = 20
_MRR_FINAL = [
    "n_customers",
    "n_with_hit",
    "CAST(sum_rr_n AS DOUBLE)"
    " / (CAST(n_customers AS DOUBLE) * 1000000000.0) AS mrr",
]


def _pop_split_frames(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    split = orders.agg(
        F.expr(
            "CAST(date_add(MIN(od), CAST(datediff(MAX(od), MIN(od))"
            " * 3 DIV 4 AS INT)) AS DATE)"
        ).alias("split_day")
    )
    o = orders.crossJoin(F.broadcast(split))
    train = o.filter("od <= split_day")
    test = o.filter("od > split_day")
    ranked = (
        train.join(li, train.o_orderkey == li.l_orderkey)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col("l_partkey"))
        .limit(MRR_K)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.col("l_partkey"))
            ),
        )
        .select("l_partkey", "rnk")
    )
    holdout = (
        test.join(li, test.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    return ranked, holdout


def mrr_popularity_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ranked, holdout = _pop_split_frames(spark, sf_dir)
    best = (
        holdout.join(F.broadcast(ranked), "l_partkey")
        .groupBy("o_custkey")
        .agg(F.min("rnk").alias("minrnk"))
        .selectExpr(
            "o_custkey",
            "(2 * 1000000000 + minrnk) DIV (2 * minrnk) AS rr_n",
        )
    )
    custs = holdout.select("o_custkey").distinct()
    agg = custs.join(best, "o_custkey", "left").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.expr("CAST(rr_n IS NOT NULL AS BIGINT)"))
        .cast("bigint")
        .alias("n_with_hit"),
        F.sum(F.expr("COALESCE(rr_n, 0)"))
        .cast("bigint")
        .alias("sum_rr_n"),
    )
    return agg.selectExpr(*_MRR_FINAL)


_POP_SPLIT_SQL = """
o AS (
  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od
  FROM orders
),
split AS (
  SELECT MIN(od) + TO_DAYS(CAST(datediff('day', MIN(od), MAX(od))
         * 3 // 4 AS INT)) AS split_day
  FROM o
),
train_orders AS (
  SELECT o.* FROM o CROSS JOIN split WHERE od <= split_day
),
test_orders AS (
  SELECT o.* FROM o CROSS JOIN split WHERE od > split_day
),
ranked AS (
  SELECT l_partkey,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, l_partkey)
              AS BIGINT) AS rnk
  FROM (
    SELECT l.l_partkey, COUNT(*) AS cnt
    FROM train_orders t JOIN lineitem l ON t.o_orderkey = l.l_orderkey
    GROUP BY 1
    ORDER BY COUNT(*) DESC, l.l_partkey
    LIMIT {K}
  )
),
holdout AS (
  SELECT DISTINCT t.o_custkey, l.l_partkey
  FROM test_orders t JOIN lineitem l ON t.o_orderkey = l.l_orderkey
)"""


def _mrr_sql() -> str:
    final = ",\n       ".join(_MRR_FINAL)
    return f"""
WITH {_POP_SPLIT_SQL.format(K=MRR_K)},
best AS (
  SELECT o_custkey,
         (2 * 1000000000 + MIN(rnk)) // (2 * MIN(rnk)) AS rr_n
  FROM holdout JOIN ranked USING (l_partkey)
  GROUP BY 1
),
custs AS (SELECT DISTINCT o_custkey FROM holdout)
SELECT {final}
FROM (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CASE WHEN rr_n IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_with_hit,
         CAST(SUM(COALESCE(rr_n, 0)) AS BIGINT) AS sum_rr_n
  FROM custs LEFT JOIN best USING (o_custkey)
)
"""


REGISTRY["mrr_popularity_orders"] = {
    "fn": mrr_popularity_orders,
    "sql": _mrr_sql(),
}


# --------------------------------------------------------------------------
# MAP@K of the same popularity baseline: per customer, average
# precision over the ranked list = Σ_{hit at rank r} P@r / min(K,|R|)
# with P@r = (#hits ≤ r)/r. The hit-position count is a per-customer
# window over ≤ K broadcast-ranked rows (customer-partitioned — no
# global window); each P@r and the AP division are half-up
# nano-quotients, integer-summed before the single final division.
# --------------------------------------------------------------------------

_MAP_FINAL = [
    "n_customers",
    "CAST(sum_ap_n AS DOUBLE)"
    " / (CAST(n_customers AS DOUBLE) * 1000000000.0) AS map_at_k",
]


def map_at_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranked, holdout = _pop_split_frames(spark, sf_dir)
    hitpos = (
        holdout.join(F.broadcast(ranked), "l_partkey")
        .withColumn(
            "nhit",
            F.row_number().over(
                Window.partitionBy("o_custkey").orderBy("rnk")
            ),
        )
        .selectExpr(
            "o_custkey",
            "(2 * CAST(nhit AS BIGINT) * 1000000000"
            " + CAST(rnk AS BIGINT))"
            " DIV (2 * CAST(rnk AS BIGINT)) AS p_n",
        )
    )
    per_cust_hits = hitpos.groupBy("o_custkey").agg(
        F.sum("p_n").cast("bigint").alias("sum_p_n")
    )
    sizes = holdout.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_holdout")
    )
    ap = sizes.join(per_cust_hits, "o_custkey", "left").selectExpr(
        "o_custkey",
        f"LEAST(CAST({MRR_K} AS BIGINT), n_holdout) AS denom",
        "COALESCE(sum_p_n, 0) AS sum_p_n",
    ).selectExpr(
        "o_custkey",
        "(2 * sum_p_n + denom) DIV (2 * denom) AS ap_n",
    )
    agg = ap.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("ap_n").cast("bigint").alias("sum_ap_n"),
    )
    return agg.selectExpr(*_MAP_FINAL)


def _map_sql() -> str:
    final = ",\n       ".join(_MAP_FINAL)
    return f"""
WITH {_POP_SPLIT_SQL.format(K=MRR_K)},
hitpos AS (
  SELECT o_custkey,
         (2 * CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY rnk) AS BIGINT) * 1000000000 + rnk)
           // (2 * rnk) AS p_n
  FROM holdout JOIN ranked USING (l_partkey)
),
per_cust_hits AS (
  SELECT o_custkey, CAST(SUM(p_n) AS BIGINT) AS sum_p_n
  FROM hitpos GROUP BY 1
),
sizes AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_holdout
  FROM holdout GROUP BY 1
),
ap AS (
  SELECT s.o_custkey,
         (2 * COALESCE(h.sum_p_n, 0)
          + LEAST(CAST({MRR_K} AS BIGINT), n_holdout))
           // (2 * LEAST(CAST({MRR_K} AS BIGINT), n_holdout)) AS ap_n
  FROM sizes s LEFT JOIN per_cust_hits h USING (o_custkey)
)
SELECT {final}
FROM (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(ap_n) AS BIGINT) AS sum_ap_n
  FROM ap
)
"""


REGISTRY["map_at_k_orders"] = {
    "fn": map_at_k_orders,
    "sql": _map_sql(),
}


# --------------------------------------------------------------------------
# Pairwise association rules over order baskets: for every part pair
# co-occurring in ≥ 2 orders, support / confidence / lift from exact
# basket counts. The pair join shuffles on orderkey (baskets are
# small — lines-per-order bounded), part marginals broadcast back,
# lift as a wide_to_double ratio, ranked (lift DESC, parts) top 20.
# --------------------------------------------------------------------------

_AR_MIN_CO = 2
_AR_TOPN = 20


def _ar_final(div: str) -> list[str]:
    big = _big(div)
    return [
        "part_a",
        "part_b",
        "c_ab",
        "n_a",
        "n_b",
        "CAST(c_ab AS DOUBLE) / CAST(n_orders AS DOUBLE) AS support",
        "CAST(c_ab AS DOUBLE) / CAST(n_a AS DOUBLE) AS confidence",
        f"{_w2d(f'CAST(c_ab AS {big}) * n_orders', div)}"
        f" / {_w2d(f'CAST(n_a AS {big}) * n_b', div)} AS lift",
    ]


def association_rules_parts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct()
    a = basket.selectExpr("l_orderkey", "l_partkey AS part_a")
    b = basket.selectExpr("l_orderkey", "l_partkey AS part_b")
    co = (
        a.join(b, "l_orderkey")
        .filter("part_a < part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
        .filter(f"c_ab >= {_AR_MIN_CO}")
    )
    marg = basket.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_p")
    )
    n_orders = basket.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    j = (
        co.join(
            F.broadcast(marg.selectExpr("l_partkey AS part_a",
                                        "n_p AS n_a")),
            "part_a",
        )
        .join(
            F.broadcast(marg.selectExpr("l_partkey AS part_b",
                                        "n_p AS n_b")),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
    )
    out = j.selectExpr(*_ar_final("DIV"))
    return out.orderBy(
        F.desc("lift"), F.col("part_a"), F.col("part_b")
    ).limit(_AR_TOPN)


def _ar_sql() -> str:
    final = ",\n       ".join(_ar_final("//"))
    return f"""
WITH basket AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
co AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM basket a JOIN basket b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_AR_MIN_CO}
),
marg AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_p
  FROM basket GROUP BY 1
),
n AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
  FROM basket
)
SELECT {final}
FROM co
JOIN marg ma ON ma.l_partkey = co.part_a
JOIN marg mb ON mb.l_partkey = co.part_b
CROSS JOIN n,
LATERAL (SELECT ma.n_p AS n_a, mb.n_p AS n_b) m
ORDER BY lift DESC, part_a, part_b
LIMIT {_AR_TOPN}
"""


REGISTRY["association_rules_parts"] = {
    "fn": association_rules_parts,
    "sql": _ar_sql(),
}


# --------------------------------------------------------------------------
# Lin's concordance correlation between o_totalprice and the order's
# summed line extended prices — "how reproducible is one measurement
# of the order's value by another" (CCC = Pearson × location/scale
# accuracy C_b). Multiplying every population moment through by n²
# leaves ONE ratio of exact 128-bit integers:
# CCC = 2(nΣxy−ΣxΣy) / (nΣx²−(Σx)² + nΣy²−(Σy)² + (Σx−Σy)²).
# One join + one groupBy; the moment row is a single broadcast.
# --------------------------------------------------------------------------


def _ccc_final(div: str) -> list[str]:
    big = _big(div)
    sxy = f"(CAST(n AS {big}) * sxy - CAST(sx AS {big}) * sy)"
    sxx = f"(CAST(n AS {big}) * sxx - CAST(sx AS {big}) * sx)"
    syy = f"(CAST(n AS {big}) * syy - CAST(sy AS {big}) * sy)"
    dd = f"(CAST(sx - sy AS {big}) * (sx - sy))"
    return [
        "n",
        f"{_w2d(sxy, div)} / sqrt({_w2d(sxx, div)} * {_w2d(syy, div)})"
        " AS pearson_r",
        f"(2.0 * {_w2d(sxy, div)})"
        f" / ({_w2d(sxx, div)} + {_w2d(syy, div)} + {_w2d(dd, div)})"
        " AS lin_ccc",
    ]


def lin_ccc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " AS x",
    )
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " AS p",
    )
    ysum = li.groupBy("l_orderkey").agg(
        F.sum("p").cast("bigint").alias("y")
    )
    j = orders.join(
        ysum, orders.o_orderkey == ysum.l_orderkey
    ).select("x", "y")
    mom = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
    )
    return mom.selectExpr(*_ccc_final("DIV"))


def _ccc_sql() -> str:
    final = ",\n       ".join(_ccc_final("//"))
    return f"""
WITH o AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS x
  FROM orders
),
ysum AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
              AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM o JOIN ysum ON o.o_orderkey = ysum.l_orderkey
)
SELECT {final}
FROM mom
"""


REGISTRY["lin_ccc_orders"] = {
    "fn": lin_ccc_orders,
    "sql": _ccc_sql(),
}


# --------------------------------------------------------------------------
# First-order partial correlation on lineitem: quantity ↔ extended
# price CONTROLLING for discount — the leakage probe ("is the
# association direct or routed through a third column"). The three
# Pearson r's come from one exact wide moment row (cents / basis
# points); the partial-correlation formula is a staged IEEE chain.
# --------------------------------------------------------------------------

_PC_FINAL = [
    "n",
    "r_xy",
    "r_xz",
    "r_yz",
    "(r_xy - r_xz * r_yz)"
    " / NULLIF(sqrt((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz)), 0.0)"
    " AS partial_r",
]


def _pc_r(div: str, a: str, b: str) -> str:
    big = _big(div)
    num = f"(CAST(n AS {big}) * s{a}{b} - CAST(s{a} AS {big}) * s{b})"
    da = f"(CAST(n AS {big}) * s{a}{a} - CAST(s{a} AS {big}) * s{a})"
    db = f"(CAST(n AS {big}) * s{b}{b} - CAST(s{b} AS {big}) * s{b})"
    return (
        f"{_w2d(num, div)}"
        f" / NULLIF(sqrt({_w2d(da, div)} * {_w2d(db, div)}), 0.0)"
    )


def partial_corr_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "CAST(l_quantity AS BIGINT) AS x",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " AS y",
        "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " AS z",
    )
    mom = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("z").cast("bigint").alias("sz"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
        F.sum(F.expr("CAST(z AS DECIMAL(38,0)) * z")).alias("szz"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * z")).alias("sxz"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * z")).alias("syz"),
    )
    rs = mom.selectExpr(
        "n",
        f"{_pc_r('DIV', 'x', 'y')} AS r_xy",
        f"{_pc_r('DIV', 'x', 'z')} AS r_xz",
        f"{_pc_r('DIV', 'y', 'z')} AS r_yz",
    )
    return rs.selectExpr(*_PC_FINAL)


def _pc_sql() -> str:
    final = ",\n       ".join(_PC_FINAL)
    return f"""
WITH li AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS y,
         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS z
  FROM lineitem
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(z) AS BIGINT) AS sz,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy,
         SUM(CAST(z AS HUGEINT) * z) AS szz,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * z) AS sxz,
         SUM(CAST(y AS HUGEINT) * z) AS syz
  FROM li
),
rs AS (
  SELECT n,
         {_pc_r('//', 'x', 'y')} AS r_xy,
         {_pc_r('//', 'x', 'z')} AS r_xz,
         {_pc_r('//', 'y', 'z')} AS r_yz
  FROM mom
)
SELECT {final}
FROM rs
"""


REGISTRY["partial_corr_lineitem"] = {
    "fn": partial_corr_lineitem,
    "sql": _pc_sql(),
}


# --------------------------------------------------------------------------
# Quadratic-weighted Cohen's kappa between two ordinal document
# ratings — length band (n_chars DIV 150, capped 0-3) vs token-count
# band (tokens DIV 25, capped 0-3); the ordinal-severity agreement
# metric (unweighted kappa on the binary pair lives in
# mldataq5.cohens_kappa_docs). κ_w = 1 − N·Σw·O / Σ_ij w_ij·r_i·c_j
# with w_ij = (i−j)², one wide ratio from exact cell counts. The 4×4
# cell/marginal frames are constant-size broadcasts.
# --------------------------------------------------------------------------


def _wkappa_final(div: str) -> list[str]:
    big = _big(div)
    return [
        "n_docs",
        "sum_wo",
        f"1.0 - ({_w2d(f'CAST(n_docs AS {big}) * sum_wo', div)}"
        f" / NULLIF({_w2d('sum_we', div)}, 0.0)) AS weighted_kappa",
    ]


def weighted_kappa_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rated = docs.selectExpr(
        "LEAST(n_chars DIV 150, 3) AS ra",
        "LEAST(CAST(size(split(text, ' ')) AS BIGINT) DIV 25, 3)"
        " AS rb",
    )
    cells = rated.groupBy("ra", "rb").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    rows = cells.groupBy("ra").agg(
        F.sum("o").cast("bigint").alias("r_i")
    )
    cols = cells.groupBy("rb").agg(
        F.sum("o").cast("bigint").alias("c_j")
    )
    wo = cells.agg(
        F.sum("o").cast("bigint").alias("n_docs"),
        F.sum(F.expr("(ra - rb) * (ra - rb) * o"))
        .cast("bigint")
        .alias("sum_wo"),
    )
    we = (
        rows.crossJoin(F.broadcast(cols))
        .agg(
            F.sum(
                F.expr(
                    "CAST((ra - rb) * (ra - rb) AS DECIMAL(38,0))"
                    " * r_i * c_j"
                )
            ).alias("sum_we")
        )
    )
    return wo.crossJoin(F.broadcast(we)).selectExpr(
        *_wkappa_final("DIV")
    )


def _wkappa_sql() -> str:
    final = ",\n       ".join(_wkappa_final("//"))
    return f"""
WITH rated AS (
  SELECT LEAST(n_chars // 150, 3) AS ra,
         LEAST(CAST(len(string_split(text, ' ')) AS BIGINT) // 25, 3)
           AS rb
  FROM documents
),
cells AS (
  SELECT ra, rb, CAST(COUNT(*) AS BIGINT) AS o
  FROM rated GROUP BY 1, 2
),
rws AS (SELECT ra, CAST(SUM(o) AS BIGINT) AS r_i FROM cells GROUP BY 1),
cls AS (SELECT rb, CAST(SUM(o) AS BIGINT) AS c_j FROM cells GROUP BY 1),
wo AS (
  SELECT CAST(SUM(o) AS BIGINT) AS n_docs,
         CAST(SUM((ra - rb) * (ra - rb) * o) AS BIGINT) AS sum_wo
  FROM cells
),
we AS (
  SELECT SUM(CAST((ra - rb) * (ra - rb) AS HUGEINT) * r_i * c_j)
           AS sum_we
  FROM rws CROSS JOIN cls
)
SELECT {final}
FROM wo CROSS JOIN we
"""


REGISTRY["weighted_kappa_docs"] = {
    "fn": weighted_kappa_docs,
    "sql": _wkappa_sql(),
}


# --------------------------------------------------------------------------
# Mantel-Haenszel pooled odds ratio + CMH test across source strata
# (the stratified sibling of odds_ratio_docs — "does the en ↔ long
# association survive controlling for source"). Per-stratum a·d/n and
# b·c/n are half-up micro-quotients (wide division — stratum sizes
# can be huge); the CMH χ² continuity-corrected numerator uses
# micro-quantized E and V terms, integer-summed before one IEEE tail.
# Stratum table is source-bounded.
# --------------------------------------------------------------------------


def _mh_terms(div: str) -> list[str]:
    big = _big(div)
    ad = f"CAST(a AS {big}) * d * 1000000"
    bc = f"CAST(b AS {big}) * c * 1000000"
    e = f"CAST(a + b AS {big}) * (a + c) * 1000000"
    v = (
        f"CAST(a + b AS {big}) * (c + d) * (a + c) * (b + d)"
        " * 1000000"
    )
    return [
        f"CAST({_whd(ad, 'n_k', div)} AS BIGINT) AS ad_u",
        f"CAST({_whd(bc, 'n_k', div)} AS BIGINT) AS bc_u",
        f"CAST({_whd(e, 'n_k', div)} AS BIGINT) AS e_u",
        f"CAST({_whd(v, 'n_k * n_k * (n_k - 1)', div)} AS BIGINT)"
        " AS v_u",
        "a * 1000000 AS a_u",
    ]


_MH_FINAL = [
    "n_strata",
    # NULLIF degenerate guards: all-concordant strata (sum_bc = 0) or
    # single-member strata (zero hypergeometric variance) yield NULL
    "CAST(sum_ad_u AS DOUBLE) / NULLIF(CAST(sum_bc_u AS DOUBLE), 0.0)"
    " AS or_mh",
    "((ABS(CAST(sum_a_u - sum_e_u AS DOUBLE)) - 500000.0)"
    " * (ABS(CAST(sum_a_u - sum_e_u AS DOUBLE)) - 500000.0))"
    " / NULLIF(CAST(sum_v_u AS DOUBLE) * 1000000.0, 0.0) AS chi2_cmh",
]


def mantel_haenszel_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    strata = docs.groupBy("source").agg(
        F.sum(
            F.expr("CAST(lang = 'en' AND n_chars >= 300 AS BIGINT)")
        ).cast("bigint").alias("a"),
        F.sum(
            F.expr("CAST(lang = 'en' AND n_chars < 300 AS BIGINT)")
        ).cast("bigint").alias("b"),
        F.sum(
            F.expr("CAST(lang <> 'en' AND n_chars >= 300 AS BIGINT)")
        ).cast("bigint").alias("c"),
        F.sum(
            F.expr("CAST(lang <> 'en' AND n_chars < 300 AS BIGINT)")
        ).cast("bigint").alias("d"),
    ).selectExpr("source", "a", "b", "c", "d", "a + b + c + d AS n_k")
    terms = strata.filter("n_k > 1").selectExpr(
        "source", *_mh_terms("DIV")
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("ad_u").cast("bigint").alias("sum_ad_u"),
        F.sum("bc_u").cast("bigint").alias("sum_bc_u"),
        F.sum("e_u").cast("bigint").alias("sum_e_u"),
        F.sum("v_u").cast("bigint").alias("sum_v_u"),
        F.sum("a_u").cast("bigint").alias("sum_a_u"),
    )
    return agg.selectExpr(*_MH_FINAL)


def _mh_sql() -> str:
    terms = ",\n         ".join(_mh_terms("//"))
    final = ",\n       ".join(_MH_FINAL)
    return f"""
WITH strata AS (
  SELECT source,
         CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 300
                  THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN lang = 'en' AND n_chars < 300
                  THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN lang <> 'en' AND n_chars >= 300
                  THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN lang <> 'en' AND n_chars < 300
                  THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM documents GROUP BY 1
),
s2 AS (
  SELECT source, a, b, c, d, a + b + c + d AS n_k
  FROM strata WHERE a + b + c + d > 1
),
terms AS (
  SELECT source,
         {terms}
  FROM s2
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         CAST(SUM(ad_u) AS BIGINT) AS sum_ad_u,
         CAST(SUM(bc_u) AS BIGINT) AS sum_bc_u,
         CAST(SUM(e_u) AS BIGINT) AS sum_e_u,
         CAST(SUM(v_u) AS BIGINT) AS sum_v_u,
         CAST(SUM(a_u) AS BIGINT) AS sum_a_u
  FROM terms
)
SELECT {final}
FROM agg
"""


REGISTRY["mantel_haenszel_docs"] = {
    "fn": mantel_haenszel_docs,
    "sql": _mh_sql(),
}


# --------------------------------------------------------------------------
# Breslow-Day homogeneity test across the same source-stratified 2x2
# tables as mantel_haenszel_docs: CMH answers "is there a common
# association"; Breslow-Day answers whether a SINGLE odds ratio is even
# the right model — X2_BD = sum_k (a_k - A_k)^2 / Var(A_k), with A_k the
# fitted top-left cell under the pooled MH odds ratio (the root of the
# margin-constrained quadratic A(r2-c1+A) = psi (r1-A)(c1-A) that keeps
# all four fitted cells positive).
#
# Cross-engine exactness: psi is one IEEE division of two
# micro-quantized integer MH sums (bit-identical); every per-stratum
# quantity then flows through a SINGLE fixed expression tree of
# correctly-rounded IEEE ops (+ - * / sqrt) written with identical
# text/associativity on both engines, so each stratum's term is
# bit-identical; terms are half-up micro-quantized and INTEGER-summed
# (stratum iteration order can never reorder a float sum). Strata with
# a zero margin carry no information about the odds ratio (fitted cell
# on the boundary, zero variance) and are excluded, per the standard
# formulation. Stratum table is source-bounded; everything below the
# groupBy is |sources|-sized.
# --------------------------------------------------------------------------

_BD_FINAL = [
    "n_strata",
    "n_strata - 1 AS df",
    "psi AS or_mh",
    "CAST(CAST(sum_term_u AS BIGINT) AS DOUBLE) / 1000000.0"
    " AS chi2_bd",
    # Tarone's correction: X²_T = X²_BD − (Σ(a−A))² / ΣVar(A) — the
    # recommended form (the MH-fitted A's don't sum the residuals to
    # exactly zero); both sums ride exact signed micro-units
    "CAST(CAST(sum_term_u AS BIGINT) AS DOUBLE) / 1000000.0"
    " - CAST(sum_d_u AS DOUBLE) * CAST(sum_d_u AS DOUBLE)"
    " / (1000000.0 * CAST(sum_v_u AS DOUBLE)) AS chi2_tarone",
]

# single shared expression text (rendered into BOTH engines verbatim):
# quadratic coefficients, the in-range root, and the tie to Var(A)
_BD_STAGES = [
    # quadratic A^2 (1-psi) + A [(r2-c1) + psi (r1+c1)] - psi r1 c1 = 0
    [
        "source", "a", "r1", "r2", "c1", "psi",
        "1.0 - psi AS aq",
        "CAST(r2 - c1 AS DOUBLE) + psi * CAST(r1 + c1 AS DOUBLE)"
        " AS bq",
        "0.0 - psi * (CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE))"
        " AS c0",
    ],
    [
        "source", "a", "r1", "r2", "c1", "psi", "aq", "bq",
        "SQRT(GREATEST(bq * bq - 4.0 * aq * c0, 0.0)) AS sq",
    ],
    # psi == 1 degenerates to the linear solve = independence fit;
    # otherwise take whichever root keeps all four fitted cells
    # positive (exactly one does for psi != 1)
    [
        "source", "a", "r1", "r2", "c1", "psi",
        "CASE WHEN ABS(aq) < 1e-12 THEN"
        " (CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE))"
        " / CAST(r1 + r2 AS DOUBLE)"
        " WHEN (sq - bq) / (2.0 * aq) > 0.0"
        " AND (sq - bq) / (2.0 * aq) < CAST(LEAST(r1, c1) AS DOUBLE)"
        " AND CAST(r2 - c1 AS DOUBLE) + (sq - bq) / (2.0 * aq) > 0.0"
        " THEN (sq - bq) / (2.0 * aq)"
        " ELSE (0.0 - (bq + sq)) / (2.0 * aq) END AS fitted",
    ],
    # Var(A)^-1 = 1/A + 1/(r1-A) + 1/(c1-A) + 1/(r2-c1+A), fixed
    # association
    [
        "source", "a", "psi", "fitted",
        "((1.0 / fitted + 1.0 / (CAST(r1 AS DOUBLE) - fitted))"
        " + 1.0 / (CAST(c1 AS DOUBLE) - fitted))"
        " + 1.0 / (CAST(r2 - c1 AS DOUBLE) + fitted) AS recip",
    ],
    # term = (a - A)^2 / Var(A), half-up micro-quantized; the signed
    # residual d_u and Var(A) micro-units feed Tarone's correction
    [
        "source",
        "CAST(FLOOR(((CAST(a AS DOUBLE) - fitted)"
        " * (CAST(a AS DOUBLE) - fitted))"
        " * recip * 1000000.0 + 0.5) AS BIGINT) AS term_u",
        "CASE WHEN CAST(a AS DOUBLE) - fitted >= 0.0 THEN"
        " CAST(FLOOR((CAST(a AS DOUBLE) - fitted)"
        " * 1000000.0 + 0.5) AS BIGINT)"
        " ELSE -CAST(FLOOR((fitted - CAST(a AS DOUBLE))"
        " * 1000000.0 + 0.5) AS BIGINT) END AS d_u",
        "CAST(FLOOR((1.0 / recip) * 1000000.0 + 0.5) AS BIGINT)"
        " AS v_u",
        "psi",
    ],
]

_BD_STRATA = [
    "source", "a", "d",
    "a + b AS r1",
    "c + d AS r2",
    "a + c AS c1",
    "b + d AS c2",
    "a + b + c + d AS n_k",
]


def breslow_day_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    strata = (
        docs.groupBy("source")
        .agg(
            F.sum(
                F.expr("CAST(lang = 'en' AND n_chars >= 300 AS BIGINT)")
            ).cast("bigint").alias("a"),
            F.sum(
                F.expr("CAST(lang = 'en' AND n_chars < 300 AS BIGINT)")
            ).cast("bigint").alias("b"),
            F.sum(
                F.expr("CAST(lang <> 'en' AND n_chars >= 300 AS BIGINT)")
            ).cast("bigint").alias("c"),
            F.sum(
                F.expr("CAST(lang <> 'en' AND n_chars < 300 AS BIGINT)")
            ).cast("bigint").alias("d"),
        )
        .selectExpr(*_BD_STRATA)
        .filter("r1 > 0 AND r2 > 0 AND c1 > 0 AND c2 > 0")
        .persist()
    )
    big = _big("DIV")
    mh = strata.selectExpr(
        f"CAST({_whd(f'CAST(a AS {big}) * d * 1000000', 'n_k', 'DIV')}"
        " AS BIGINT) AS ad_u",
        f"CAST({_whd(f'CAST(r1 - a AS {big}) * (c1 - a) * 1000000', 'n_k', 'DIV')}"
        " AS BIGINT) AS bc_u",
    ).agg(
        F.sum("ad_u").cast("bigint").alias("sum_ad_u"),
        F.sum("bc_u").cast("bigint").alias("sum_bc_u"),
    )
    psi_df = mh.selectExpr(
        "CAST(sum_ad_u AS DOUBLE) / CAST(sum_bc_u AS DOUBLE) AS psi"
    )
    cur = strata.crossJoin(F.broadcast(psi_df))
    for stage in _BD_STAGES:
        cur = cur.selectExpr(*stage)
    agg = cur.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("term_u").cast("bigint").alias("sum_term_u"),
        F.sum("d_u").cast("bigint").alias("sum_d_u"),
        F.sum("v_u").cast("bigint").alias("sum_v_u"),
        F.min("psi").alias("psi"),
    )
    from de4ml_spark.cache import release_after

    return release_after(agg.selectExpr(*_BD_FINAL), strata)


def _bd_sql() -> str:
    big = _big("//")
    strata_cols = ",\n         ".join(_BD_STRATA)
    stages = []
    prev = "s2"
    for i, stage in enumerate(_BD_STAGES):
        cols = ",\n         ".join(stage)
        stages.append(
            f"q{i} AS (\n  SELECT {cols}\n  FROM {prev}\n)"
        )
        prev = f"q{i}"
    chain = ",\n".join(stages)
    final = ",\n       ".join(_BD_FINAL)
    ad = _whd(f"CAST(a AS {big}) * d * 1000000", "n_k", "//")
    bc = _whd(f"CAST(r1 - a AS {big}) * (c1 - a) * 1000000", "n_k", "//")
    return f"""
WITH strata AS (
  SELECT source,
         CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 300
                  THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN lang = 'en' AND n_chars < 300
                  THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN lang <> 'en' AND n_chars >= 300
                  THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN lang <> 'en' AND n_chars < 300
                  THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM documents GROUP BY 1
),
s2 AS (
  SELECT {strata_cols}
  FROM strata
  WHERE a + b > 0 AND c + d > 0 AND a + c > 0 AND b + d > 0
),
mh AS (
  SELECT CAST(SUM(CAST({ad} AS BIGINT)) AS BIGINT) AS sum_ad_u,
         CAST(SUM(CAST({bc} AS BIGINT)) AS BIGINT) AS sum_bc_u
  FROM s2
),
s2p AS (
  SELECT s2.*,
         CAST(sum_ad_u AS DOUBLE) / CAST(sum_bc_u AS DOUBLE) AS psi
  FROM s2 CROSS JOIN mh
),
{chain.replace('FROM s2', 'FROM s2p', 1)},
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         CAST(SUM(term_u) AS BIGINT) AS sum_term_u,
         CAST(SUM(d_u) AS BIGINT) AS sum_d_u,
         CAST(SUM(v_u) AS BIGINT) AS sum_v_u,
         MIN(psi) AS psi
  FROM q{len(_BD_STAGES) - 1}
)
SELECT {final}
FROM agg
"""


REGISTRY["breslow_day_docs"] = {
    "fn": breslow_day_docs,
    "sql": _bd_sql(),
}
