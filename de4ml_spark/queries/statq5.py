"""Statistical-testing tier V (round 9c): distribution-shape tests on
the pooled value histogram (Kuiper, Cramér-von Mises, energy
distance) and reliability / agreement coefficients on the dense
day × event-type count grid (Cronbach's alpha, two-way-random ICC).

These extend the KS / Mood battery (statq3) and the Friedman /
Kendall-W grid battery (statq2/statq4) sideways: Kuiper and CvM are
the cyclic-sensitive and integral-form companions of the KS sup-norm;
alpha and ICC are the internal-consistency view of the same grid the
concordance tests rank.

Exactness discipline (see SCALE.md): every statistic is an exact
128-bit integer identity up to ONE final IEEE chain whose text is
identical in Spark and DuckDB. CDF products cumA·n_b ≤ n_a·n_b and
their squares ride DECIMAL(38,0)/HUGEINT. Scale: the only shuffles
are the value-histogram groupBy (bounded by distinct cents values)
and the day × type grid (calendar × type-cardinality bounded) — both
aggregate frames, never row frames.

Reference parity: the reference ships SUMMARIZE-style profiling and
drift checks (dataops/app/profile.py); these entries are the
distribution-comparison tier a 100 TB training-data pipeline runs on
top of that surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from de4ml_spark.operators.portable_hash import (
    wide_to_double_sql as _w2d,
)
from de4ml_spark.session import load_table

REGISTRY: dict = {}


def _big(div: str) -> str:
    return "DECIMAL(38,0)" if div.upper() == "DIV" else "HUGEINT"


# --------------------------------------------------------------------------
# Kuiper two-sample test: click vs purchase on `value`. V = D⁺ + D⁻
# where D⁺ = max_v (F_a − F_b) and D⁻ = max_v (F_b − F_a) over the
# pooled value histogram — the rotation-invariant refinement of the
# KS sup-norm (sensitive to tail + median shifts simultaneously).
# Numerators max(cumA·n_b − cumB·n_a) are exact int64; the same
# single cum window over the bounded histogram as ks_two_sample.
# --------------------------------------------------------------------------

_KUIPER_FINAL = [
    "n_a",
    "n_b",
    "vplus_num",
    "vminus_num",
    "CAST(vplus_num + vminus_num AS DOUBLE)"
    " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS kuiper_v",
    "(CAST(vplus_num + vminus_num AS DOUBLE)"
    " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))"
    " * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)"
    " / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))"
    " AS kuiper_scaled",
]


def kuiper_two_sample_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    byval = (
        ev.filter(F.col("value").isNotNull())
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v_c")
        )
        .agg(
            F.sum(F.expr("CAST(event_type = 'click' AS BIGINT)"))
            .cast("bigint")
            .alias("a_n"),
            F.sum(F.expr("CAST(event_type = 'purchase' AS BIGINT)"))
            .cast("bigint")
            .alias("b_n"),
        )
    )
    wcum = (
        Window.partitionBy(F.lit(1))
        .orderBy("v_c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = byval.withColumn("cum_a", F.sum("a_n").over(wcum)).withColumn(
        "cum_b", F.sum("b_n").over(wcum)
    )
    totals = byval.agg(
        F.sum("a_n").cast("bigint").alias("n_a"),
        F.sum("b_n").cast("bigint").alias("n_b"),
    )
    vmax = (
        cum.crossJoin(F.broadcast(totals))
        .selectExpr(
            "n_a",
            "n_b",
            "cum_a * n_b - cum_b * n_a AS dplus",
        )
        .groupBy("n_a", "n_b")
        .agg(
            F.greatest(F.max("dplus"), F.lit(0))
            .cast("bigint")
            .alias("vplus_num"),
            F.greatest(-F.min("dplus"), F.lit(0))
            .cast("bigint")
            .alias("vminus_num"),
        )
    )
    return vmax.selectExpr(*_KUIPER_FINAL)


def _kuiper_sql() -> str:
    final = ",\n       ".join(_KUIPER_FINAL)
    return f"""
WITH byval AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS a_n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS b_n
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
  GROUP BY 1
),
cum AS (
  SELECT v_c,
         SUM(a_n) OVER (ORDER BY v_c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
         SUM(b_n) OVER (ORDER BY v_c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
  FROM byval
),
totals AS (
  SELECT CAST(SUM(a_n) AS BIGINT) AS n_a,
         CAST(SUM(b_n) AS BIGINT) AS n_b
  FROM byval
),
vmax AS (
  SELECT n_a, n_b,
         CAST(GREATEST(MAX(cum_a * n_b - cum_b * n_a), 0)
              AS BIGINT) AS vplus_num,
         CAST(GREATEST(-MIN(cum_a * n_b - cum_b * n_a), 0)
              AS BIGINT) AS vminus_num
  FROM cum CROSS JOIN totals
  GROUP BY 1, 2
)
SELECT {final}
FROM vmax
"""


REGISTRY["kuiper_two_sample_value"] = {
    "fn": kuiper_two_sample_value,
    "sql": _kuiper_sql(),
}


# --------------------------------------------------------------------------
# Cramér-von Mises two-sample statistic, integral form with ties:
# T = (n_a·n_b / N) · ∫ (F_a − F_b)² dH_N evaluated over the pooled
# ECDF H_N — i.e. T = Σ_v c_v·(cumA_v·n_b − cumB_v·n_a)²
# / (N² · n_a · n_b) with c_v the pooled count at v. (The rank form
# in Anderson 1962 is tie-free; the ECDF-integral form is the
# natural generalization under ties and is what both engines and the
# pure-Python recompute test evaluate — documented convention.)
# The squared numerator rides DECIMAL(38,0)/HUGEINT.
# --------------------------------------------------------------------------


def _cvm_final(div: str) -> list[str]:
    return [
        "n_a",
        "n_b",
        f"{_w2d('t_num', div)}"
        " / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))"
        " * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))"
        " * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS cvm_t",
    ]


def cvm_two_sample_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    byval = (
        ev.filter(F.col("value").isNotNull())
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v_c")
        )
        .agg(
            F.sum(F.expr("CAST(event_type = 'click' AS BIGINT)"))
            .cast("bigint")
            .alias("a_n"),
            F.sum(F.expr("CAST(event_type = 'purchase' AS BIGINT)"))
            .cast("bigint")
            .alias("b_n"),
        )
    )
    wcum = (
        Window.partitionBy(F.lit(1))
        .orderBy("v_c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = byval.withColumn("cum_a", F.sum("a_n").over(wcum)).withColumn(
        "cum_b", F.sum("b_n").over(wcum)
    )
    totals = byval.agg(
        F.sum("a_n").cast("bigint").alias("n_a"),
        F.sum("b_n").cast("bigint").alias("n_b"),
    )
    tnum = (
        cum.crossJoin(F.broadcast(totals))
        .selectExpr(
            "n_a",
            "n_b",
            "CAST(a_n + b_n AS DECIMAL(38,0))"
            " * (cum_a * n_b - cum_b * n_a)"
            " * (cum_a * n_b - cum_b * n_a) AS term",
        )
        .groupBy("n_a", "n_b")
        .agg(F.sum("term").alias("t_num"))
    )
    return tnum.selectExpr(*_cvm_final("DIV"))


def _cvm_sql() -> str:
    final = ",\n       ".join(_cvm_final("//"))
    return f"""
WITH byval AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS a_n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS b_n
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
  GROUP BY 1
),
cum AS (
  SELECT v_c, a_n, b_n,
         SUM(a_n) OVER (ORDER BY v_c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
         SUM(b_n) OVER (ORDER BY v_c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
  FROM byval
),
totals AS (
  SELECT CAST(SUM(a_n) AS BIGINT) AS n_a,
         CAST(SUM(b_n) AS BIGINT) AS n_b
  FROM byval
),
tnum AS (
  SELECT n_a, n_b,
         SUM(CAST(a_n + b_n AS HUGEINT)
             * (cum_a * n_b - cum_b * n_a)
             * (cum_a * n_b - cum_b * n_a)) AS t_num
  FROM cum CROSS JOIN totals
  GROUP BY 1, 2
)
SELECT {final}
FROM tnum
"""


REGISTRY["cvm_two_sample_value"] = {
    "fn": cvm_two_sample_value,
    "sql": _cvm_sql(),
}


# --------------------------------------------------------------------------
# Cronbach's alpha over the dense day × event-type count grid: items
# = the k event types, observations = the n calendar days (missing
# cells are true zero counts). α = k/(k−1) · (1 − Σ_j S_j / S_tot)
# with S_j = n·Σ_d c_dj² − (Σ_d c_dj)² the n-scaled per-item variance
# numerator and S_tot the same for the daily totals — the n-scaling
# cancels, so every term is an exact integer and α is one ratio.
# --------------------------------------------------------------------------


def _alpha_final(div: str) -> list[str]:
    return [
        "k_types",
        "n_days",
        "CAST(k_types AS DOUBLE) / (CAST(k_types AS DOUBLE) - 1.0)"
        f" * (1.0 - {_w2d('s_items', div)} / {_w2d('s_total', div)})"
        " AS cronbach_alpha",
    ]


def cronbach_alpha_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isNotNull())
    counts = base.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    # dense-grid moments without materializing the grid: missing
    # cells are zeros, which contribute nothing to Σc and Σc², so
    # per-item sums over the sparse counts ARE the dense sums; only
    # n (distinct days) enters the scaling.
    ndays = counts.select("day").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    items = (
        counts.groupBy("event_type")
        .agg(
            F.sum("c").cast("bigint").alias("sj"),
            F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("sj2"),
        )
        .crossJoin(F.broadcast(ndays))
        .selectExpr(
            "n_days",
            "CAST(n_days AS DECIMAL(38,0)) * sj2"
            " - CAST(sj AS DECIMAL(38,0)) * sj AS s_j",
        )
        .groupBy("n_days")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_types"),
            F.sum("s_j").alias("s_items"),
        )
    )
    tot = (
        counts.groupBy("day")
        .agg(F.sum("c").cast("bigint").alias("t"))
        .agg(
            F.sum("t").cast("bigint").alias("st"),
            F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * t")).alias("st2"),
        )
    )
    stot = items.crossJoin(F.broadcast(tot)).selectExpr(
        "k_types",
        "n_days",
        "s_items",
        "CAST(n_days AS DECIMAL(38,0)) * st2"
        " - CAST(st AS DECIMAL(38,0)) * st AS s_total",
    )
    return stot.selectExpr(*_alpha_final("DIV"))


def _alpha_sql() -> str:
    final = ",\n       ".join(_alpha_final("//"))
    return f"""
WITH counts AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type IS NOT NULL
  GROUP BY 1, 2
),
nd AS (
  SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days FROM counts
),
items AS (
  SELECT n_days,
         CAST(COUNT(*) AS BIGINT) AS k_types,
         SUM(s_j) AS s_items
  FROM (
    SELECT n_days,
           CAST(n_days AS HUGEINT) * sj2
           - CAST(sj AS HUGEINT) * sj AS s_j
    FROM (
      SELECT event_type,
             CAST(SUM(c) AS BIGINT) AS sj,
             SUM(CAST(c AS HUGEINT) * c) AS sj2
      FROM counts GROUP BY 1
    ) CROSS JOIN nd
  )
  GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(t) AS BIGINT) AS st,
         SUM(CAST(t AS HUGEINT) * t) AS st2
  FROM (
    SELECT day, CAST(SUM(c) AS BIGINT) AS t FROM counts GROUP BY 1
  )
),
stot AS (
  SELECT k_types, n_days, s_items,
         CAST(n_days AS HUGEINT) * st2
         - CAST(st AS HUGEINT) * st AS s_total
  FROM items CROSS JOIN tot
)
SELECT {final}
FROM stot
"""


REGISTRY["cronbach_alpha_daily"] = {
    "fn": cronbach_alpha_daily,
    "sql": _alpha_sql(),
}


# --------------------------------------------------------------------------
# Two-way random-effects intraclass correlation ICC(2,1) (absolute
# agreement, single measurement; Shrout-Fleiss) on the same dense
# day × type grid: subjects = n days, raters = k types. With the
# nk-scaled sums of squares A_r = n·ΣT_d² − G², A_c = k·ΣC_j² − G²,
# A_t = nk·Σc² − G², A_e = A_t − A_r − A_c (all exact integers;
# the common 1/(nk) cancels):
#   ICC(2,1) = n[(k−1)A_r − A_e]
#            / (n(k−1)A_r + n(k−1)A_e + k(n−1)A_c − k·A_e).
# Missing grid cells are true zeros; sparse sums equal dense sums.
# --------------------------------------------------------------------------


def _icc_final(div: str) -> list[str]:
    big = _big(div)
    num = (
        f"CAST(n_days AS {big})"
        " * ((k_types - 1) * a_r - (a_t - a_r - a_c))"
    )
    den = (
        f"CAST(n_days AS {big}) * (k_types - 1) * a_r"
        f" + CAST(n_days AS {big}) * (k_types - 1)"
        " * (a_t - a_r - a_c)"
        f" + CAST(k_types AS {big}) * (n_days - 1) * a_c"
        f" - CAST(k_types AS {big}) * (a_t - a_r - a_c)"
    )
    return [
        "n_days",
        "k_types",
        f"{_w2d(num, div)} / {_w2d(den, div)} AS icc_2_1",
    ]


def icc_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isNotNull())
    counts = base.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    dims = counts.agg(
        F.countDistinct("day").cast("bigint").alias("n_days"),
        F.countDistinct("event_type").cast("bigint").alias("k_types"),
        F.sum("c").cast("bigint").alias("g"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("sc2"),
    )
    rows = (
        counts.groupBy("day")
        .agg(F.sum("c").cast("bigint").alias("t"))
        .agg(F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * t")).alias("st2"))
    )
    cols = (
        counts.groupBy("event_type")
        .agg(F.sum("c").cast("bigint").alias("cj"))
        .agg(
            F.sum(F.expr("CAST(cj AS DECIMAL(38,0)) * cj")).alias("sc2j")
        )
    )
    ss = (
        dims.crossJoin(F.broadcast(rows))
        .crossJoin(F.broadcast(cols))
        .selectExpr(
            "n_days",
            "k_types",
            "CAST(n_days AS DECIMAL(38,0)) * st2"
            " - CAST(g AS DECIMAL(38,0)) * g AS a_r",
            "CAST(k_types AS DECIMAL(38,0)) * sc2j"
            " - CAST(g AS DECIMAL(38,0)) * g AS a_c",
            "CAST(n_days AS DECIMAL(38,0)) * k_types * sc2"
            " - CAST(g AS DECIMAL(38,0)) * g AS a_t",
        )
    )
    return ss.selectExpr(*_icc_final("DIV"))


def _icc_sql() -> str:
    final = ",\n       ".join(_icc_final("//"))
    return f"""
WITH counts AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type IS NOT NULL
  GROUP BY 1, 2
),
dims AS (
  SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k_types,
         CAST(SUM(c) AS BIGINT) AS g,
         SUM(CAST(c AS HUGEINT) * c) AS sc2
  FROM counts
),
rows_ss AS (
  SELECT SUM(CAST(t AS HUGEINT) * t) AS st2
  FROM (SELECT day, CAST(SUM(c) AS BIGINT) AS t FROM counts GROUP BY 1)
),
cols_ss AS (
  SELECT SUM(CAST(cj AS HUGEINT) * cj) AS sc2j
  FROM (
    SELECT event_type, CAST(SUM(c) AS BIGINT) AS cj
    FROM counts GROUP BY 1
  )
),
ss AS (
  SELECT n_days, k_types,
         CAST(n_days AS HUGEINT) * st2
         - CAST(g AS HUGEINT) * g AS a_r,
         CAST(k_types AS HUGEINT) * sc2j
         - CAST(g AS HUGEINT) * g AS a_c,
         CAST(n_days AS HUGEINT) * k_types * sc2
         - CAST(g AS HUGEINT) * g AS a_t
  FROM dims CROSS JOIN rows_ss CROSS JOIN cols_ss
)
SELECT {final}
FROM ss
"""


REGISTRY["icc_daily_types"] = {
    "fn": icc_daily_types,
    "sql": _icc_sql(),
}
