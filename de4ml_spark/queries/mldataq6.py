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
        f" / ({_w2d(ad, div)} + {_w2d(bc, div)}) AS yule_q",
        f"{_w2d(f'{ad} - {bc}', div)} / sqrt({_w2d(rr, div)}) AS phi",
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
