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
from de4ml_spark.session import load_events_finite, load_table

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
    # shared persisted two-sample cum frame (operators/pairhist.py)
    from de4ml_spark.operators.pairhist import two_sample_cums

    vmax = (
        two_sample_cums(spark, sf_dir)
        .selectExpr(
            "na_tot AS n_a",
            "nb_tot AS n_b",
            "ca * nb_tot - cb * na_tot AS dplus",
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
WITH byval0 AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS a_n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS b_n
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
  GROUP BY 1
),
byval AS (
  -- pair-existence guard (round-14 one-class parity sweep): the Spark
  -- side reads the shared pair frame, which is EMPTY unless both
  -- classes have values; no-op when both classes exist
  SELECT * FROM byval0
  WHERE (SELECT COALESCE(SUM(a_n), 0) FROM byval0) > 0
    AND (SELECT COALESCE(SUM(b_n), 0) FROM byval0) > 0
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
    # shared persisted two-sample cum frame (operators/pairhist.py)
    from de4ml_spark.operators.pairhist import two_sample_cums

    tnum = (
        two_sample_cums(spark, sf_dir)
        .selectExpr(
            "na_tot AS n_a",
            "nb_tot AS n_b",
            "CAST(a_n + b_n AS DECIMAL(38,0))"
            " * (ca * nb_tot - cb * na_tot)"
            " * (ca * nb_tot - cb * na_tot) AS term",
        )
        .groupBy("n_a", "n_b")
        .agg(F.sum("term").alias("t_num"))
    )
    return tnum.selectExpr(*_cvm_final("DIV"))


def _cvm_sql() -> str:
    final = ",\n       ".join(_cvm_final("//"))
    return f"""
WITH byval0 AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS a_n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS b_n
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
  GROUP BY 1
),
byval AS (
  -- pair-existence guard (round-14 one-class parity sweep): the Spark
  -- side reads the shared pair frame, which is EMPTY unless both
  -- classes have values; no-op when both classes exist
  SELECT * FROM byval0
  WHERE (SELECT COALESCE(SUM(a_n), 0) FROM byval0) > 0
    AND (SELECT COALESCE(SUM(b_n), 0) FROM byval0) > 0
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
        # NULLIF degenerate guards: k = 1 type or zero total variance
        "CAST(k_types AS DOUBLE) / NULLIF(CAST(k_types AS DOUBLE)"
        " - 1.0, 0.0)"
        f" * (1.0 - {_w2d('s_items', div)}"
        f" / NULLIF({_w2d('s_total', div)}, 0.0))"
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
        f"{_w2d(num, div)} / NULLIF({_w2d(den, div)}, 0.0)"
        " AS icc_2_1",
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


# --------------------------------------------------------------------------
# Energy distance (Székely-Rizzo) between click and purchase `value`:
# E² = 2·μ_AB − μ_AA − μ_BB with μ_XY = mean pairwise |x − y|
# (V-statistic form, n², m², nm denominators). 1-D closed form over
# the sorted pooled histogram: Σ pairs |x−y| = Σ_v x_v·(cnt_before·v
# − sum_before) accumulated per sample — exact integers in cents via
# one cum window over the bounded histogram; NO all-pairs join
# anywhere (the O(n²) definition collapses to cumulative sums).
# Companion to emd_value_types (W1 distance): E² weights tail
# differences quadratically, EMD linearly.
# --------------------------------------------------------------------------


def _energy_final(div: str) -> list[str]:
    ab = _w2d("ab_num", div)
    aa = _w2d("aa_num", div)
    bb = _w2d("bb_num", div)
    e2 = (
        f"(2.0 * {ab} / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
        f" - 2.0 * {aa} / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE))"
        f" - 2.0 * {bb} / (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE)))"
    )
    return [
        "n_a",
        "n_b",
        f"{e2} AS energy_sq_cents",
        f"sqrt({e2}) AS energy_dist_cents",
    ]


def energy_distance_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # shared persisted two-sample cum frame (operators/pairhist.py):
    # ca/cb ride the shared frame; the value-weighted cums sa/sb are
    # entry-specific, so they run as one window over the persisted
    # histogram-bounded scan (no events pass).
    from de4ml_spark.operators.pairhist import two_sample_cums

    byval = two_sample_cums(spark, sf_dir)
    wcum = (
        Window.partitionBy(F.lit(1))
        .orderBy("v_c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        byval.withColumn(
            "sa",
            F.sum(F.expr("CAST(a_n AS DECIMAL(38,0)) * v_c")).over(wcum),
        )
        .withColumn(
            "sb",
            F.sum(F.expr("CAST(b_n AS DECIMAL(38,0)) * v_c")).over(wcum),
        )
    )
    terms = cum.selectExpr(
        "a_n",
        "b_n",
        # exclusive cums: inclusive minus the row's own mass
        "CAST(a_n AS DECIMAL(38,0))"
        " * ((ca - a_n) * v_c - (sa - CAST(a_n AS DECIMAL(38,0)) * v_c))"
        " AS t_aa",
        "CAST(b_n AS DECIMAL(38,0))"
        " * ((cb - b_n) * v_c - (sb - CAST(b_n AS DECIMAL(38,0)) * v_c))"
        " AS t_bb",
        "CAST(a_n AS DECIMAL(38,0))"
        " * ((cb - b_n) * v_c - (sb - CAST(b_n AS DECIMAL(38,0)) * v_c))"
        " + CAST(b_n AS DECIMAL(38,0))"
        " * ((ca - a_n) * v_c - (sa - CAST(a_n AS DECIMAL(38,0)) * v_c))"
        " AS t_ab",
    )
    agg = terms.agg(
        F.sum("a_n").cast("bigint").alias("n_a"),
        F.sum("b_n").cast("bigint").alias("n_b"),
        F.sum("t_aa").alias("aa_num"),
        F.sum("t_bb").alias("bb_num"),
        F.sum("t_ab").alias("ab_num"),
    )
    return agg.selectExpr(*_energy_final("DIV"))


def _energy_sql() -> str:
    final = ",\n       ".join(_energy_final("//"))
    return f"""
WITH byval0 AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS a_n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS b_n
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
  GROUP BY 1
),
byval AS (
  -- pair-existence guard (round-14 one-class parity sweep): the Spark
  -- side reads the shared pair frame, which is EMPTY unless both
  -- classes have values; no-op when both classes exist
  SELECT * FROM byval0
  WHERE (SELECT COALESCE(SUM(a_n), 0) FROM byval0) > 0
    AND (SELECT COALESCE(SUM(b_n), 0) FROM byval0) > 0
),
cum AS (
  SELECT v_c, a_n, b_n,
         SUM(a_n) OVER w AS ca,
         SUM(b_n) OVER w AS cb,
         SUM(CAST(a_n AS HUGEINT) * v_c) OVER w AS sa,
         SUM(CAST(b_n AS HUGEINT) * v_c) OVER w AS sb
  FROM byval
  WINDOW w AS (ORDER BY v_c
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
terms AS (
  SELECT a_n, b_n,
         CAST(a_n AS HUGEINT)
         * ((ca - a_n) * v_c - (sa - CAST(a_n AS HUGEINT) * v_c))
           AS t_aa,
         CAST(b_n AS HUGEINT)
         * ((cb - b_n) * v_c - (sb - CAST(b_n AS HUGEINT) * v_c))
           AS t_bb,
         CAST(a_n AS HUGEINT)
         * ((cb - b_n) * v_c - (sb - CAST(b_n AS HUGEINT) * v_c))
         + CAST(b_n AS HUGEINT)
         * ((ca - a_n) * v_c - (sa - CAST(a_n AS HUGEINT) * v_c))
           AS t_ab,
  FROM cum
),
agg AS (
  SELECT CAST(SUM(a_n) AS BIGINT) AS n_a,
         CAST(SUM(b_n) AS BIGINT) AS n_b,
         SUM(t_aa) AS aa_num,
         SUM(t_bb) AS bb_num,
         SUM(t_ab) AS ab_num
  FROM terms
)
SELECT {final}
FROM agg
"""


REGISTRY["energy_distance_value"] = {
    "fn": energy_distance_value,
    "sql": _energy_sql(),
}


# --------------------------------------------------------------------------
# Seasonal-naive forecast accuracy on the daily event-count series:
# the lag-7 forecast ŷ_t = y_{t−7} scored by MASE (scaled by the
# in-sample lag-1 naive MAE, Hyndman-Koehler), Theil's U1, and mean
# error (bias). Lags are CALENDAR joins on the day index (an absent
# day is a missing observation, not zero — inner-join semantics,
# documented); every numerator/denominator is an exact int64 sum, one
# IEEE chain per metric.
# --------------------------------------------------------------------------

_FORECAST_FINAL = [
    "m1",
    "m7",
    "(CAST(sad7 AS DOUBLE) / CAST(m7 AS DOUBLE))"
    " / (CAST(sad1 AS DOUBLE) / CAST(m1 AS DOUBLE)) AS mase_seasonal",
    "sqrt(CAST(sse7 AS DOUBLE) / CAST(m7 AS DOUBLE))"
    " / (sqrt(CAST(syy7 AS DOUBLE) / CAST(m7 AS DOUBLE))"
    " + sqrt(CAST(shh7 AS DOUBLE) / CAST(m7 AS DOUBLE))) AS theil_u1",
    "CAST(bias7 AS DOUBLE) / CAST(m7 AS DOUBLE) AS mean_error",
]


def seasonal_forecast_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    l1 = daily.selectExpr("t + 1 AS t", "y AS y_l1")
    l7 = daily.selectExpr("t + 7 AS t", "y AS y_l7")
    j1 = daily.join(l1, "t").selectExpr("abs(y - y_l1) AS ad1")
    j7 = daily.join(l7, "t").selectExpr(
        "y", "y_l7",
        "abs(y - y_l7) AS ad7",
        "(y - y_l7) * (y - y_l7) AS sq7",
        "y - y_l7 AS e7",
    )
    a1 = j1.agg(
        F.count(F.lit(1)).cast("bigint").alias("m1"),
        F.sum("ad1").cast("bigint").alias("sad1"),
    )
    a7 = j7.agg(
        F.count(F.lit(1)).cast("bigint").alias("m7"),
        F.sum("ad7").cast("bigint").alias("sad7"),
        F.sum("sq7").cast("bigint").alias("sse7"),
        F.sum("e7").cast("bigint").alias("bias7"),
        F.sum(F.expr("y * y")).cast("bigint").alias("syy7"),
        F.sum(F.expr("y_l7 * y_l7")).cast("bigint").alias("shh7"),
    )
    return (
        a7.crossJoin(F.broadcast(a1)).selectExpr(*_FORECAST_FINAL)
    )


def _forecast_sql() -> str:
    final = ",\n       ".join(_FORECAST_FINAL)
    return f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
a1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m1,
         CAST(SUM(ABS(d.y - l.y)) AS BIGINT) AS sad1
  FROM daily d JOIN daily l ON d.t = l.t + 1
),
a7 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m7,
         CAST(SUM(ABS(d.y - l.y)) AS BIGINT) AS sad7,
         CAST(SUM((d.y - l.y) * (d.y - l.y)) AS BIGINT) AS sse7,
         CAST(SUM(d.y - l.y) AS BIGINT) AS bias7,
         CAST(SUM(d.y * d.y) AS BIGINT) AS syy7,
         CAST(SUM(l.y * l.y) AS BIGINT) AS shh7
  FROM daily d JOIN daily l ON d.t = l.t + 7
)
SELECT {final}
FROM a7 CROSS JOIN a1
"""


REGISTRY["seasonal_forecast_daily"] = {
    "fn": seasonal_forecast_daily,
    "sql": _forecast_sql(),
}


# --------------------------------------------------------------------------
# Chow structural-break test on the daily OLS trend: split the
# calendar at the midpoint of the observed day range (t_mid =
# (t_min + t_max) DIV 2, deterministic integer), fit y ~ t on each
# half and pooled, F = ((RSS_p − RSS_1 − RSS_2)/2)/((RSS_1+RSS_2)/(n−4)).
# Per-segment raw moment sums are exact integers in ONE conditional-
# aggregation pass (pooled = segment sums added); each RSS is the
# staged-double identity RSS = (Syy·Sxx − Sxy²)/(n·Sxx) on _w2d'd
# n-scaled moments — the same text both engines, like ols_daily_trend.
# --------------------------------------------------------------------------


def _chow_staged(tag: str, src: str | None, div: str) -> list[str]:
    """n-scaled centered-moment staged doubles for one segment.

    ``src`` names the raw-sum prefix (``a_``/``b_``); ``None`` means
    the pooled segment, whose raw sums are the two segments' added —
    additivity of raw moment sums is what makes one conditional-
    aggregation pass sufficient for all three fits.
    """
    b = _big(div)
    if src is None:
        n, st, sy = "(a_n + b_n)", "(a_st + b_st)", "(a_sy + b_sy)"
        stt = "(a_stt + b_stt)"
        sty = "(a_sty + b_sty)"
        syy = "(a_syy + b_syy)"
    else:
        n, st, sy = f"{src}n", f"{src}st", f"{src}sy"
        stt, sty, syy = f"{src}stt", f"{src}sty", f"{src}syy"
    sxx = f"CAST({n} AS {b}) * {stt} - CAST({st} AS {b}) * {st}"
    sxy = f"CAST({n} AS {b}) * {sty} - CAST({st} AS {b}) * {sy}"
    syc = f"CAST({n} AS {b}) * {syy} - CAST({sy} AS {b}) * {sy}"
    out = [] if src is not None else [f"{n} AS {tag}n"]
    out += [
        f"{_w2d(sxx, div)} AS {tag}sxx_d",
        f"{_w2d(sxy, div)} AS {tag}sxy_d",
        f"{_w2d(syc, div)} AS {tag}syy_d",
    ]
    return out


def _chow_rss(pfx: str) -> str:
    # staged doubles {pfx}sxx_d/{pfx}sxy_d/{pfx}syy_d and count {pfx}n
    # NULLIF: a one-day segment has sxx = 0 (no time spread) — its RSS
    # is undefined; degrade to NULL rather than DIVIDE_BY_ZERO
    return (
        f"(({pfx}syy_d * {pfx}sxx_d - {pfx}sxy_d * {pfx}sxy_d)"
        f" / NULLIF(CAST({pfx}n AS DOUBLE) * {pfx}sxx_d, 0.0))"
    )


_CHOW_FINAL = [
    "n_days",
    "n1",
    "n2",
    "rss_pooled",
    "rss_split",
    # NULLIF degenerate guards: a perfect split fit (rss_split = 0)
    # or n_days <= 4 yield NULL, not DIVIDE_BY_ZERO
    "((rss_pooled - rss_split) / 2.0)"
    " / NULLIF(rss_split / NULLIF(CAST(n_days AS DOUBLE) - 4.0, 0.0),"
    " 0.0) AS chow_f",
]


def chow_break_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    rng = daily.agg(
        F.expr("(MIN(t) + MAX(t)) DIV 2").alias("t_mid"),
        F.min("t").alias("t0"),
    )
    seg = daily.crossJoin(F.broadcast(rng)).selectExpr(
        "t - t0 AS t", "y", "CAST(t <= t_mid AS INT) AS s1"
    )
    big = "DECIMAL(38,0)"

    def _sums(tag: str, flag: str) -> list:
        return [
            F.sum(F.expr(f"CAST({flag} AS BIGINT)"))
            .cast("bigint")
            .alias(f"{tag}n"),
            F.sum(F.expr(f"{flag} * t")).cast("bigint").alias(f"{tag}st"),
            F.sum(F.expr(f"{flag} * y")).cast("bigint").alias(f"{tag}sy"),
            F.sum(F.expr(f"{flag} * CAST(t AS {big}) * t")).alias(
                f"{tag}stt"
            ),
            F.sum(F.expr(f"{flag} * CAST(t AS {big}) * y")).alias(
                f"{tag}sty"
            ),
            F.sum(F.expr(f"{flag} * CAST(y AS {big}) * y")).alias(
                f"{tag}syy"
            ),
        ]

    mom = seg.agg(*(_sums("a_", "s1") + _sums("b_", "(1 - s1)")))

    staged = mom.selectExpr(
        "a_n",
        "b_n",
        *_chow_staged("a_", "a_", "DIV"),
        *_chow_staged("b_", "b_", "DIV"),
        *_chow_staged("p_", None, "DIV"),
    )
    fin = staged.selectExpr(
        "p_n AS n_days",
        "a_n AS n1",
        "b_n AS n2",
        f"{_chow_rss('p_')} AS rss_pooled",
        f"{_chow_rss('a_')} + {_chow_rss('b_')} AS rss_split",
    )
    return fin.selectExpr(*_CHOW_FINAL)


def _chow_sql() -> str:
    big = "HUGEINT"

    def _sums(tag: str, flag: str) -> str:
        return f"""
         CAST(SUM({flag}) AS BIGINT) AS {tag}n,
         CAST(SUM({flag} * t) AS BIGINT) AS {tag}st,
         CAST(SUM({flag} * y) AS BIGINT) AS {tag}sy,
         SUM({flag} * CAST(t AS {big}) * t) AS {tag}stt,
         SUM({flag} * CAST(t AS {big}) * y) AS {tag}sty,
         SUM({flag} * CAST(y AS {big}) * y) AS {tag}syy"""

    staged = ",\n    ".join(
        ["a_n", "b_n"]
        + _chow_staged("a_", "a_", "//")
        + _chow_staged("b_", "b_", "//")
        + _chow_staged("p_", None, "//")
    )
    final = ",\n       ".join(_CHOW_FINAL)
    return f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
rng AS (
  SELECT (MIN(t) + MAX(t)) // 2 AS t_mid, MIN(t) AS t0 FROM daily
),
seg AS (
  SELECT t - t0 AS t, y,
         CAST(t <= t_mid AS INT) AS s1
  FROM daily CROSS JOIN rng
),
mom AS (
  SELECT {_sums('a_', 's1')},
         {_sums('b_', '(1 - s1)')}
  FROM seg
),
staged AS (
  SELECT {staged}
  FROM mom
),
fin AS (
  SELECT p_n AS n_days, a_n AS n1, b_n AS n2,
         {_chow_rss('p_')} AS rss_pooled,
         {_chow_rss('a_')} + {_chow_rss('b_')} AS rss_split
  FROM staged
)
SELECT {final}
FROM fin
"""


REGISTRY["chow_break_daily"] = {
    "fn": chow_break_daily,
    "sql": _chow_sql(),
}


# --------------------------------------------------------------------------
# Quade test on the day × event-type grid (days = blocks, types =
# treatments): the rank-ANCOVA refinement of Friedman that weights
# each day by the rank of its within-day count RANGE. Quadruple-
# scaled integers throughout: doubled within-day midranks R2_dj
# (dense grid, k² pair join per day), doubled across-day range
# midranks Q2_d (histogram-cum over the bounded distinct-range
# frame), S4_j = Σ_d Q2_d·(R2_dj − (k+1)); A16 = Σ (Q2_d·(R2_dj −
# (k+1)))²; F = (n−1)·ΣS4_j² / (n·A16 − ΣS4_j²) — all exact until
# the one final ratio.
# --------------------------------------------------------------------------

_QUADE_FINAL = [
    "n_days",
    "k_types",
    "(CAST(n_days AS DOUBLE) - 1.0) * CAST(sb AS DOUBLE)"
    " / NULLIF(CAST(n_days AS DOUBLE) * CAST(a16 AS DOUBLE)"
    " - CAST(sb AS DOUBLE), 0.0) AS quade_f",
]


def quade_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isNotNull())
    days = base.select(
        F.col("ts").cast("date").alias("day")
    ).distinct()
    types = base.select("event_type").distinct()
    counts = base.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(counts, ["day", "event_type"], "left")
        .selectExpr("day", "event_type", "COALESCE(c, 0) AS c")
    )
    # doubled within-day midranks via the k² pair join
    o = grid.selectExpr("day", "c AS c2")
    r2 = (
        grid.join(o, "day")
        .groupBy("day", "event_type")
        .agg(
            F.sum(
                F.expr(
                    "2 * CAST(c2 < c AS BIGINT)"
                    " + CAST(c2 = c AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("r2m1")
        )
        .selectExpr("day", "event_type", "r2m1 + 1 AS r2")
    )
    # day range, then doubled midranks of ranges across days via the
    # distinct-range histogram (bounded frame, one cum window)
    rng = grid.groupBy("day").agg(
        (F.max("c") - F.min("c")).cast("bigint").alias("rg")
    )
    hist = rng.groupBy("rg").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    wcum = (
        Window.partitionBy(F.lit(1))
        .orderBy("rg")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hr = hist.withColumn("cum", F.sum("t").over(wcum)).selectExpr(
        "rg", "2 * (cum - t) + t + 1 AS q2"
    )
    dq = rng.join(F.broadcast(hr), "rg").select("day", "q2")
    dims = grid.agg(
        F.countDistinct("day").cast("bigint").alias("n_days"),
        F.countDistinct("event_type").cast("bigint").alias("k_types"),
    )
    cell = (
        r2.join(dq, "day")
        .crossJoin(F.broadcast(dims))
        .selectExpr(
            "event_type",
            "n_days",
            "k_types",
            "q2 * (r2 - (k_types + 1)) AS s_cell",
        )
    )
    sj = cell.groupBy("event_type", "n_days", "k_types").agg(
        F.sum("s_cell").cast("bigint").alias("s4_j")
    )
    a16 = cell.groupBy("n_days", "k_types").agg(
        F.sum(
            F.expr("CAST(s_cell AS DECIMAL(38,0)) * s_cell")
        ).alias("a16")
    )
    sb = sj.groupBy("n_days", "k_types").agg(
        F.sum(F.expr("CAST(s4_j AS DECIMAL(38,0)) * s4_j")).alias("sb")
    )
    out = a16.join(sb, ["n_days", "k_types"])
    return out.selectExpr(*_QUADE_FINAL)


def _quade_sql() -> str:
    final = ",\n       ".join(_QUADE_FINAL)
    return f"""
WITH base AS (
  SELECT CAST(ts AS DATE) AS day, event_type
  FROM events WHERE event_type IS NOT NULL
),
days AS (SELECT DISTINCT day FROM base),
types AS (SELECT DISTINCT event_type FROM base),
counts AS (
  SELECT day, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM base GROUP BY 1, 2
),
grid AS (
  SELECT d.day, t.event_type, COALESCE(c.c, 0) AS c
  FROM days d CROSS JOIN types t
  LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
),
r2 AS (
  SELECT g.day, g.event_type,
         CAST(SUM(2 * CASE WHEN o.c < g.c THEN 1 ELSE 0 END
                  + CASE WHEN o.c = g.c THEN 1 ELSE 0 END)
              AS BIGINT) + 1 AS r2
  FROM grid g JOIN grid o ON o.day = g.day
  GROUP BY 1, 2
),
rng AS (
  SELECT day, CAST(MAX(c) - MIN(c) AS BIGINT) AS rg
  FROM grid GROUP BY 1
),
hist AS (
  SELECT rg, CAST(COUNT(*) AS BIGINT) AS t FROM rng GROUP BY 1
),
hr AS (
  SELECT rg,
         2 * (SUM(t) OVER (ORDER BY rg
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t)
         + t + 1 AS q2
  FROM hist
),
dq AS (SELECT day, q2 FROM rng JOIN hr USING (rg)),
dims AS (
  SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k_types
  FROM grid
),
cell AS (
  SELECT r2.event_type, n_days, k_types,
         q2 * (r2 - (k_types + 1)) AS s_cell
  FROM r2 JOIN dq USING (day) CROSS JOIN dims
),
sj AS (
  SELECT event_type, n_days, k_types,
         CAST(SUM(s_cell) AS BIGINT) AS s4_j
  FROM cell GROUP BY 1, 2, 3
),
a16 AS (
  SELECT n_days, k_types,
         SUM(CAST(s_cell AS HUGEINT) * s_cell) AS a16
  FROM cell GROUP BY 1, 2
),
sb AS (
  SELECT n_days, k_types,
         SUM(CAST(s4_j AS HUGEINT) * s4_j) AS sb
  FROM sj GROUP BY 1, 2
)
SELECT {final}
FROM a16 JOIN sb USING (n_days, k_types)
"""


REGISTRY["quade_daily_value"] = {
    "fn": quade_daily_value,
    "sql": _quade_sql(),
}


# --------------------------------------------------------------------------
# Entropy rate of the per-user event-type Markov chain:
# H = Σ_ij (c_ij/C)·ln(r_i/c_ij) nats, where c_ij counts consecutive
# (prev → next) transitions within a user's ts-ordered stream (same
# ordering convention as markov_next_event_accuracy: ts, event_id)
# and r_i = Σ_j c_ij. Per-cell portable-ln on the exact integer pair
# (r_i ≥ c_ij ≥ 1), micro-quantized half-up, weighted by c_ij — one
# exact integer sum, one final ratio. The transition table is
# k²-bounded; the only corpus-sized work is the lead() per user.
# --------------------------------------------------------------------------

_ENTROPY_FINAL = [
    "n_transitions",
    "n_states",
    f"{_w2d('h_num', 'DIV')}"
    " / (CAST(n_transitions AS DOUBLE) * 1000000.0)"
    " AS entropy_rate_nats",
]


def markov_entropy_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import with_portable_ln

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.col("event_type").alias("prev"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter("nxt IS NOT NULL")
    cells = trans.groupBy("prev", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    rows_ = cells.groupBy("prev").agg(
        F.sum("c").cast("bigint").alias("r")
    )
    j = cells.join(rows_, "prev")
    lned = with_portable_ln(j, "r", "c", "__pln").selectExpr(
        "prev",
        "c",
        "CAST(c AS DECIMAL(38,0))"
        " * CAST(floor(__pln * 1000000.0 + 0.5) AS BIGINT) AS term",
    )
    agg = lned.agg(
        F.sum("c").cast("bigint").alias("n_transitions"),
        F.countDistinct("prev").cast("bigint").alias("n_states"),
        F.sum("term").alias("h_num"),
    )
    return agg.selectExpr(*_ENTROPY_FINAL)


def _entropy_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
    )

    ln_ctes = portable_ln_duck_ctes(
        "j", "prev, c", "r", "c", "pln", "me"
    )
    final = ",\n       ".join(
        [
            "n_transitions",
            "n_states",
            f"{_w2d('h_num', '//')}"
            " / (CAST(n_transitions AS DOUBLE) * 1000000.0)"
            " AS entropy_rate_nats",
        ]
    )
    return f"""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LEAD(event_type) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS nxt
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
cells AS (
  SELECT event_type AS prev, nxt, CAST(COUNT(*) AS BIGINT) AS c
  FROM ordered WHERE nxt IS NOT NULL GROUP BY 1, 2
),
rows_ AS (
  SELECT prev, CAST(SUM(c) AS BIGINT) AS r FROM cells GROUP BY 1
),
j AS (SELECT cells.prev, c, r FROM cells JOIN rows_ USING (prev)),
{ln_ctes},
terms AS (
  SELECT prev, c,
         CAST(c AS HUGEINT)
         * CAST(FLOOR(pln * 1000000.0 + 0.5) AS BIGINT) AS term
  FROM me_out
),
agg AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_transitions,
         CAST(COUNT(DISTINCT prev) AS BIGINT) AS n_states,
         SUM(term) AS h_num
  FROM terms
)
SELECT {final}
FROM agg
"""


REGISTRY["markov_entropy_rate"] = {
    "fn": markov_entropy_rate,
    "sql": _entropy_sql(),
}


# --------------------------------------------------------------------------
# Shared histogram for the click-vs-purchase two-sample battery.
# --------------------------------------------------------------------------


# The DataFrame twin of _TWO_SAMPLE_HIST_SQL lives in
# operators/pairhist.py (two_sample_cums) — every battery entry reads the
# shared persisted pair frame; only the oracle CTE string remains here.
_TWO_SAMPLE_HIST_SQL = """
byval0 AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS a_n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS b_n
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
  GROUP BY 1
),
byval AS (
  -- pair-existence guard (round-14 one-class parity sweep): the Spark
  -- battery reads the shared pair frame (operators/pairhist.py), where
  -- the (click, purchase) pair only EXISTS when both sides have
  -- non-null values — a shard with clicks but no purchases yields an
  -- empty frame there. Mirror that here so both engines degrade to the
  -- (already parity-pinned) empty shape; a no-op whenever both classes
  -- have any value.
  SELECT * FROM byval0
  WHERE (SELECT COALESCE(SUM(a_n), 0) FROM byval0) > 0
    AND (SELECT COALESCE(SUM(b_n), 0) FROM byval0) > 0
)"""


# --------------------------------------------------------------------------
# Ansari-Bradley scale test (click vs purchase `value`), midrank
# scores under ties: score(p) = min(p, N+1−p); a tied group occupying
# pooled positions [lo, hi] gives each member the group mean
# S_g/c_g, with S_g = Σ_{p=lo..hi} min(p, N+1−p) in exact triangular
# closed form from the cum counts. AB = Σ_A score is carried
# micro-quantized (halfup(a_v·S_g·1e6, c_g), exact 128-bit), as are
# the squared scores for the tie-exact conditional variance
# Var = n_a·n_b·(N·Σs² − (Σs)²)/(N²(N−1));
# z = (AB − n_a·Σs/N)/√Var. Exact to the documented 1e-6 score grid.
# --------------------------------------------------------------------------


def _ab_final() -> list[str]:
    # all *_u columns are micro-scaled (1e6) exact integers
    e_ab = (
        "(CAST(n_a AS DOUBLE) * CAST(s_sum AS DOUBLE)"
        " / CAST(n_a + n_b AS DOUBLE))"
    )
    var = (
        "(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)"
        " * (CAST(n_a + n_b AS DOUBLE) * (CAST(s2_u AS DOUBLE) / 1e6)"
        " - CAST(s_sum AS DOUBLE) * CAST(s_sum AS DOUBLE))"
        " / (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b AS DOUBLE)"
        " * (CAST(n_a + n_b AS DOUBLE) - 1.0)))"
    )
    return [
        "n_a",
        "n_b",
        "CAST(ab_u AS DOUBLE) / 1e6 AS ab_stat",
        # NULLIF: all-tied values collapse the hist to one group, var = 0
        # (round-14 ties sweep) — degrade to NULL on both engines
        f"(CAST(ab_u AS DOUBLE) / 1e6 - {e_ab})"
        f" / NULLIF(sqrt({var}), 0.0) AS z_ansari",
    ]


def _ab_group_sum(lo: str, hi: str, n: str) -> str:
    """Σ_{p=lo..hi} min(p, N+1−p), exact: ascending part up to
    m = (N+1) DIV 2, descending part after."""
    m = f"(({n} + 1) DIV 2)"
    hi_a = f"(CASE WHEN {hi} < {m} THEN {hi} ELSE {m} END)"
    lo_d = f"(CASE WHEN {lo} > {m} + 1 THEN {lo} ELSE {m} + 1 END)"
    tri_a = (
        f"(CASE WHEN {hi_a} >= {lo} THEN"
        f" ({hi_a} * ({hi_a} + 1) - ({lo} - 1) * {lo}) DIV 2"
        " ELSE 0 END)"
    )
    # descending scores N+1−p for p in [lo_d, hi]
    tri_d = (
        f"(CASE WHEN {hi} >= {lo_d} THEN"
        f" (({n} + 1) * ({hi} - {lo_d} + 1))"
        f" - (({hi} * ({hi} + 1) - ({lo_d} - 1) * {lo_d}) DIV 2)"
        " ELSE 0 END)"
    )
    return f"({tri_a} + {tri_d})"


def ansari_bradley_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        wide_halfup_div_sql as _whd,
    )

    # shared persisted two-sample cum frame (operators/pairhist.py)
    from de4ml_spark.operators.pairhist import two_sample_cums

    g = two_sample_cums(spark, sf_dir).selectExpr(
        "a_n",
        "b_n",
        "ca + cb AS cum",
        "na_tot AS n_a",
        "nb_tot AS n_b",
    ).selectExpr(
        "a_n",
        "b_n",
        "a_n + b_n AS c_g",
        "cum - (a_n + b_n) + 1 AS lo",
        "cum AS hi",
        "n_a",
        "n_b",
        "n_a + n_b AS nn",
    )
    sg = g.selectExpr(
        "a_n",
        "c_g",
        "n_a",
        "n_b",
        f"CAST({_ab_group_sum('lo', 'hi', 'nn')} AS DECIMAL(38,0))"
        " AS s_g",
    )
    terms = sg.selectExpr(
        "n_a",
        "n_b",
        "s_g",
        f"CAST({_whd('CAST(a_n AS DECIMAL(38,0)) * s_g * 1000000', 'c_g', 'DIV')}"
        " AS DECIMAL(38,0)) AS ab_term_u",
        f"CAST({_whd('s_g * s_g * 1000000', 'c_g', 'DIV')}"
        " AS DECIMAL(38,0)) AS s2_term_u",
    )
    agg = terms.groupBy("n_a", "n_b").agg(
        F.sum("ab_term_u").alias("ab_u"),
        F.sum("s2_term_u").alias("s2_u"),
        F.sum("s_g").alias("s_sum_w"),
    ).selectExpr(
        "n_a",
        "n_b",
        "CAST(ab_u AS DECIMAL(38,0)) AS ab_u",
        "CAST(s2_u AS DECIMAL(38,0)) AS s2_u",
        "CAST(s_sum_w AS BIGINT) AS s_sum",
    )
    return agg.selectExpr(*_ab_final())


def _ansari_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        wide_halfup_div_sql as _whd,
    )

    final = ",\n       ".join(_ab_final())
    gsum = _ab_group_sum("lo", "hi", "nn").replace(" DIV ", " // ")
    return f"""
WITH {_TWO_SAMPLE_HIST_SQL},
cum AS (
  SELECT v_c, a_n, b_n,
         SUM(a_n + b_n) OVER (ORDER BY v_c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM byval
),
totals AS (
  SELECT CAST(SUM(a_n) AS BIGINT) AS n_a,
         CAST(SUM(b_n) AS BIGINT) AS n_b
  FROM byval
),
g AS (
  SELECT a_n, b_n, a_n + b_n AS c_g,
         cum - (a_n + b_n) + 1 AS lo, cum AS hi,
         n_a, n_b, n_a + n_b AS nn
  FROM cum CROSS JOIN totals
),
sg AS (
  SELECT a_n, c_g, n_a, n_b,
         CAST({gsum} AS HUGEINT) AS s_g
  FROM g
),
terms AS (
  SELECT n_a, n_b, s_g,
         {_whd('CAST(a_n AS HUGEINT) * s_g * 1000000', 'c_g', '//')}
           AS ab_term_u,
         {_whd('s_g * s_g * 1000000', 'c_g', '//')} AS s2_term_u
  FROM sg
),
agg AS (
  SELECT n_a, n_b,
         SUM(ab_term_u) AS ab_u,
         SUM(s2_term_u) AS s2_u,
         CAST(SUM(s_g) AS BIGINT) AS s_sum
  FROM terms GROUP BY 1, 2
)
SELECT {final}
FROM agg
"""


REGISTRY["ansari_bradley_value"] = {
    "fn": ansari_bradley_value,
    "sql": _ansari_sql(),
}


# --------------------------------------------------------------------------
# Fligner-Policello robust rank-order test (click vs purchase): the
# Mann-Whitney companion that drops the equal-variance assumption by
# studentizing with placement variances. Doubled placements keep ties
# exact: an A-member at value v has 2P = 2·cumB_<v + b_v. With
# SP2 = Σ_A 2P, SQ2 = Σ_B 2Q, and the na-scaled placement-variance
# numerators VA = na·Σa_v(2P)² − SP2² (= 4·na·Σ(P−P̄)²):
#   Ũ = (SQ2 − SP2) / (2·√(W / (na·nb))),
#   W = nb·VA + na·VB + SP2·SQ2  — every input an exact integer.
# --------------------------------------------------------------------------


def _fp_final(div: str) -> list[str]:
    w = _w2d("w_num", div)
    return [
        "n_a",
        "n_b",
        "sp2",
        "sq2",
        # NULLIF: zero placement variance (tiny/constant samples)
        # zeroes the denominator — ANSI DIVIDE_BY_ZERO on Spark; U is
        # undefined there, NULL on both engines (round-14 small-sample
        # parity sweep)
        "CAST(sq2 - sp2 AS DOUBLE)"
        f" / NULLIF(2.0 * sqrt({w}"
        " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 0.0)"
        " AS u_fligner_policello",
    ]


def fligner_policello_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # shared persisted two-sample cum frame (operators/pairhist.py)
    from de4ml_spark.operators.pairhist import two_sample_cums

    cum = two_sample_cums(spark, sf_dir)
    pl = cum.selectExpr(
        "a_n",
        "b_n",
        "2 * (cb - b_n) + b_n AS p2",
        "2 * (ca - a_n) + a_n AS q2",
    )
    agg = pl.agg(
        F.sum("a_n").cast("bigint").alias("n_a"),
        F.sum("b_n").cast("bigint").alias("n_b"),
        F.sum(F.expr("a_n * p2")).cast("bigint").alias("sp2"),
        F.sum(F.expr("b_n * q2")).cast("bigint").alias("sq2"),
        F.sum(F.expr("CAST(a_n AS DECIMAL(38,0)) * p2 * p2")).alias(
            "sp2sq"
        ),
        F.sum(F.expr("CAST(b_n AS DECIMAL(38,0)) * q2 * q2")).alias(
            "sq2sq"
        ),
    )
    staged = agg.selectExpr(
        "n_a",
        "n_b",
        "sp2",
        "sq2",
        "CAST(n_b AS DECIMAL(38,0))"
        " * (CAST(n_a AS DECIMAL(38,0)) * sp2sq"
        " - CAST(sp2 AS DECIMAL(38,0)) * sp2)"
        " + CAST(n_a AS DECIMAL(38,0))"
        " * (CAST(n_b AS DECIMAL(38,0)) * sq2sq"
        " - CAST(sq2 AS DECIMAL(38,0)) * sq2)"
        " + CAST(sp2 AS DECIMAL(38,0)) * sq2 AS w_num",
    )
    return staged.selectExpr(*_fp_final("DIV"))


def _fp_sql() -> str:
    final = ",\n       ".join(_fp_final("//"))
    return f"""
WITH {_TWO_SAMPLE_HIST_SQL},
cum AS (
  SELECT v_c, a_n, b_n,
         SUM(a_n) OVER w AS ca,
         SUM(b_n) OVER w AS cb
  FROM byval
  WINDOW w AS (ORDER BY v_c
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
pl AS (
  SELECT a_n, b_n,
         2 * (cb - b_n) + b_n AS p2,
         2 * (ca - a_n) + a_n AS q2
  FROM cum
),
agg AS (
  SELECT CAST(SUM(a_n) AS BIGINT) AS n_a,
         CAST(SUM(b_n) AS BIGINT) AS n_b,
         CAST(SUM(a_n * p2) AS BIGINT) AS sp2,
         CAST(SUM(b_n * q2) AS BIGINT) AS sq2,
         SUM(CAST(a_n AS HUGEINT) * p2 * p2) AS sp2sq,
         SUM(CAST(b_n AS HUGEINT) * q2 * q2) AS sq2sq
  FROM pl
),
staged AS (
  SELECT n_a, n_b, sp2, sq2,
         CAST(n_b AS HUGEINT)
         * (CAST(n_a AS HUGEINT) * sp2sq
            - CAST(sp2 AS HUGEINT) * sp2)
         + CAST(n_a AS HUGEINT)
         * (CAST(n_b AS HUGEINT) * sq2sq
            - CAST(sq2 AS HUGEINT) * sq2)
         + CAST(sp2 AS HUGEINT) * sq2 AS w_num
  FROM agg
)
SELECT {final}
FROM staged
"""


REGISTRY["fligner_policello_value"] = {
    "fn": fligner_policello_value,
    "sql": _fp_sql(),
}


# --------------------------------------------------------------------------
# Anderson-Darling two-sample test (Scholz-Stephens A²akN, k = 2,
# tie-adjusted midpoint version — scipy's anderson_ksamp
# midrank=True): with per-distinct-value pooled count l, doubled
# midpoint cums B2 = 2·cum − l and M2ᵢ = 2·cumᵢ − cᵢ, each term
# reduces to the INTEGER ratio lⱼ·(N·M2ᵢ − nᵢ·B2)² / (B2·(2N−B2)
# − N·lⱼ) (denominator ≥ l(N−l) > 0). Numerator/denominator are
# _w2d-staged and each term micro-quantized half-up (deterministic
# both engines; the recompute test replicates the quantization
# tolerance); A² = (N−1)/N² · (T_a/n_a + T_b/n_b)/1e6.
# --------------------------------------------------------------------------


def _ad_final() -> list[str]:
    return [
        "n_a",
        "n_b",
        "((CAST(n_a + n_b AS DOUBLE) - 1.0)"
        " / (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b AS DOUBLE)))"
        " * (CAST(ta_u AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " + CAST(tb_u AS DOUBLE) / CAST(n_b AS DOUBLE)) / 1e6"
        " AS ad_a2",
    ]


def _ad_term(m2: str, cn: str, div: str) -> str:
    """micro-quantized lⱼ·(N·M2 − n·B2)²/(B2(2N−B2) − N·l)."""
    b = _big(div)
    num = (
        f"CAST(l AS {b}) * (CAST(nn AS {b}) * {m2}"
        f" - CAST({cn} AS {b}) * b2)"
        f" * (CAST(nn AS {b}) * {m2} - CAST({cn} AS {b}) * b2)"
    )
    den = f"CAST(b2 AS {b}) * (2 * nn - b2) - CAST(nn AS {b}) * l"
    # NULLIF: a value group spanning the WHOLE pooled sample (all-tied
    # shard, round-14 ties sweep) zeroes den (and num) — NULL the 0/0
    # term on both engines; SUM skips it, the excluded-group convention.
    return (
        f"CAST(floor(1000000.0 * {_w2d(num, div)}"
        f" / NULLIF({_w2d(den, div)}, 0.0) + 0.5) AS BIGINT)"
    )


def anderson_darling_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # shared persisted two-sample cum frame (operators/pairhist.py)
    from de4ml_spark.operators.pairhist import two_sample_cums

    g = two_sample_cums(spark, sf_dir).selectExpr(
        "na_tot AS n_a",
        "nb_tot AS n_b",
        "na_tot + nb_tot AS nn",
        "a_n + b_n AS l",
        "2 * (ca + cb) - (a_n + b_n) AS b2",
        "2 * ca - a_n AS m2a",
        "2 * cb - b_n AS m2b",
    )
    terms = g.selectExpr(
        "n_a",
        "n_b",
        f"{_ad_term('m2a', 'n_a', 'DIV')} AS t_a",
        f"{_ad_term('m2b', 'n_b', 'DIV')} AS t_b",
    )
    agg = terms.groupBy("n_a", "n_b").agg(
        F.sum("t_a").cast("bigint").alias("ta_u"),
        F.sum("t_b").cast("bigint").alias("tb_u"),
    )
    return agg.selectExpr(*_ad_final())


def _ad_sql() -> str:
    final = ",\n       ".join(_ad_final())
    return f"""
WITH {_TWO_SAMPLE_HIST_SQL},
cum AS (
  SELECT v_c, a_n, b_n,
         SUM(a_n) OVER w AS ca,
         SUM(b_n) OVER w AS cb
  FROM byval
  WINDOW w AS (ORDER BY v_c
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
totals AS (
  SELECT CAST(SUM(a_n) AS BIGINT) AS n_a,
         CAST(SUM(b_n) AS BIGINT) AS n_b
  FROM byval
),
g AS (
  SELECT n_a, n_b, n_a + n_b AS nn, a_n + b_n AS l,
         2 * (ca + cb) - (a_n + b_n) AS b2,
         2 * ca - a_n AS m2a,
         2 * cb - b_n AS m2b
  FROM cum CROSS JOIN totals
),
terms AS (
  SELECT n_a, n_b,
         {_ad_term('m2a', 'n_a', '//')} AS t_a,
         {_ad_term('m2b', 'n_b', '//')} AS t_b
  FROM g
),
agg AS (
  SELECT n_a, n_b,
         CAST(SUM(t_a) AS BIGINT) AS ta_u,
         CAST(SUM(t_b) AS BIGINT) AS tb_u
  FROM terms GROUP BY 1, 2
)
SELECT {final}
FROM agg
"""


REGISTRY["anderson_darling_value"] = {
    "fn": anderson_darling_value,
    "sql": _ad_sql(),
}


# --------------------------------------------------------------------------
# Granger causality, lag 1: do daily click counts predict next-day
# purchase counts beyond purchase's own lag? Unrestricted
# y_t ~ 1 + y_{t−1} + x_{t−1} vs restricted y_t ~ 1 + y_{t−1};
# F = (RSS_r − RSS_u)/(RSS_u/(n−3)). Ten raw moment sums over the
# matched (t, t−1) day pairs are exact integers; the two RSS come
# from the closed-form normal-equation solution on _w2d-staged
# n-scaled centered moments (Cramer's rule for the 2-regressor fit),
# one IEEE chain — the pure-Python test checks against an
# INDEPENDENT numpy lstsq fit. Day pairs are calendar joins over the
# observed-day spine (missing day = missing observation).
# --------------------------------------------------------------------------


def _granger_final() -> list[str]:
    rss_u = (
        "(dyy - (day_ * day_ * dbb - 2.0 * day_ * dby * dab"
        " + dby * dby * daa) / (daa * dbb - dab * dab))"
    )
    rss_r = "(dyy - day_ * day_ / daa)"
    return [
        "n_obs",
        f"{rss_r} / CAST(n_obs AS DOUBLE) AS rss_restricted",
        f"{rss_u} / CAST(n_obs AS DOUBLE) AS rss_unrestricted",
        f"(({rss_r}) - ({rss_u}))"
        f" * (CAST(n_obs AS DOUBLE) - 3.0) / ({rss_u}) AS granger_f",
    ]


def granger_clicks_purchases(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(
        # CASE..ELSE 0 (same guard as mahalanobis_anomalous_days): an
        # all-NULL-typed day must count 0 on both engines, not NULL —
        # latent here only because the t/t+1 inner join happens to drop
        # isolated corrupt days, but two ADJACENT corrupt days would
        # expose it.
        F.sum(F.expr("CASE WHEN event_type = 'click' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("x"),
        F.sum(
            F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
        )
        .cast("bigint")
        .alias("y"),
    )
    lag = daily.selectExpr(
        "t + 1 AS t", "y AS a", "x AS b"
    )
    m = daily.join(lag, "t").selectExpr("y", "a", "b")
    big = "DECIMAL(38,0)"
    mom = m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("a").cast("bigint").alias("sa"),
        F.sum("b").cast("bigint").alias("sb"),
        F.sum(F.expr(f"CAST(y AS {big}) * y")).alias("syy"),
        F.sum(F.expr(f"CAST(a AS {big}) * a")).alias("saa"),
        F.sum(F.expr(f"CAST(b AS {big}) * b")).alias("sbb"),
        F.sum(F.expr(f"CAST(a AS {big}) * y")).alias("say"),
        F.sum(F.expr(f"CAST(b AS {big}) * y")).alias("sby"),
        F.sum(F.expr(f"CAST(a AS {big}) * b")).alias("sab"),
    )

    def _c(p: str, q: str, sp: str, sq: str, div: str) -> str:
        b = _big(div)
        return _w2d(
            f"CAST(n AS {b}) * {p}{q} - CAST(s{sp} AS {b}) * s{sq}",
            div,
        )

    staged = mom.selectExpr(
        "n AS n_obs",
        f"{_c('sy', 'y', 'y', 'y', 'DIV')} AS dyy",
        f"{_c('sa', 'a', 'a', 'a', 'DIV')} AS daa",
        f"{_c('sb', 'b', 'b', 'b', 'DIV')} AS dbb",
        f"{_c('sa', 'y', 'a', 'y', 'DIV')} AS day_",
        f"{_c('sb', 'y', 'b', 'y', 'DIV')} AS dby",
        f"{_c('sa', 'b', 'a', 'b', 'DIV')} AS dab",
    )
    return staged.selectExpr(*_granger_final())


def _granger_sql() -> str:
    big = "HUGEINT"

    def _c(p: str, sp: str, sq: str) -> str:
        return _w2d(
            f"CAST(n AS {big}) * {p} - CAST(s{sp} AS {big}) * s{sq}",
            "//",
        )

    final = ",\n       ".join(_granger_final())
    return f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS t,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY 1
),
m AS (
  SELECT d.y AS y, l.y AS a, l.x AS b
  FROM daily d JOIN daily l ON d.t = l.t + 1
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(a) AS BIGINT) AS sa,
         CAST(SUM(b) AS BIGINT) AS sb,
         SUM(CAST(y AS {big}) * y) AS syy,
         SUM(CAST(a AS {big}) * a) AS saa,
         SUM(CAST(b AS {big}) * b) AS sbb,
         SUM(CAST(a AS {big}) * y) AS say,
         SUM(CAST(b AS {big}) * y) AS sby,
         SUM(CAST(a AS {big}) * b) AS sab
  FROM m
),
staged AS (
  SELECT n AS n_obs,
         {_c('syy', 'y', 'y')} AS dyy,
         {_c('saa', 'a', 'a')} AS daa,
         {_c('sbb', 'b', 'b')} AS dbb,
         {_c('say', 'a', 'y')} AS day_,
         {_c('sby', 'b', 'y')} AS dby,
         {_c('sab', 'a', 'b')} AS dab
  FROM mom
)
SELECT {final}
FROM staged
"""


REGISTRY["granger_clicks_purchases"] = {
    "fn": granger_clicks_purchases,
    "sql": _granger_sql(),
}


# --------------------------------------------------------------------------
# Blomqvist's beta (medial correlation) between l_quantity and
# l_extendedprice: quadrant sign concordance around the two lower
# medians (position ⌈n/2⌉ via one cum window over each bounded value
# histogram; rows ON either median are excluded — documented
# convention). beta = (c_pp + c_mm − c_pm − c_mp)/m, exact integers.
# --------------------------------------------------------------------------

_BLOMQVIST_FINAL = [
    "n_used",
    "c_pp",
    "c_mm",
    "CAST(c_pp + c_mm - (n_used - c_pp - c_mm) AS DOUBLE)"
    " / CAST(n_used AS DOUBLE) AS blomqvist_beta",
]


def blomqvist_beta_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # both coordinates NOT NULL: a pair with a missing side cannot be
    # scored against the medians, and a NULL group in the median's cum
    # window orders FIRST on Spark and LAST on DuckDB, shifting the
    # median itself (round-14 nulltpch parity sweep)
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL"
    ).selectExpr(
        "CAST(l_quantity AS BIGINT) AS q",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " AS p",
    )
    wq = (
        Window.partitionBy(F.lit(1))
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    n_tot = li.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    med_q = (
        li.groupBy("q")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .withColumn("cum", F.sum("c").over(wq))
        .crossJoin(F.broadcast(n_tot))
        .filter("cum - c < (n + 1) DIV 2 AND (n + 1) DIV 2 <= cum")
        .selectExpr("q AS med_q")
    )
    wp = (
        Window.partitionBy(F.lit(1))
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    med_p = (
        li.groupBy("p")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .withColumn("cum", F.sum("c").over(wp))
        .crossJoin(F.broadcast(n_tot))
        .filter("cum - c < (n + 1) DIV 2 AND (n + 1) DIV 2 <= cum")
        .selectExpr("p AS med_p")
    )
    tagged = (
        li.crossJoin(F.broadcast(med_q))
        .crossJoin(F.broadcast(med_p))
        .filter("q != med_q AND p != med_p")
    )
    agg = tagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_used"),
        F.sum(F.expr("CAST(q > med_q AND p > med_p AS BIGINT)"))
        .cast("bigint")
        .alias("c_pp"),
        F.sum(F.expr("CAST(q < med_q AND p < med_p AS BIGINT)"))
        .cast("bigint")
        .alias("c_mm"),
    )
    return agg.selectExpr(*_BLOMQVIST_FINAL)


def _blomqvist_sql() -> str:
    final = ",\n       ".join(_BLOMQVIST_FINAL)
    return f"""
WITH li AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS p
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM li),
med_q AS (
  SELECT q AS med_q FROM (
    SELECT q, CAST(COUNT(*) AS BIGINT) AS c,
           SUM(COUNT(*)) OVER (ORDER BY q
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM li GROUP BY 1
  ) CROSS JOIN n_tot
  WHERE cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum
),
med_p AS (
  SELECT p AS med_p FROM (
    SELECT p, CAST(COUNT(*) AS BIGINT) AS c,
           SUM(COUNT(*)) OVER (ORDER BY p
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM li GROUP BY 1
  ) CROSS JOIN n_tot
  WHERE cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_used,
         CAST(SUM(CASE WHEN q > med_q AND p > med_p THEN 1 ELSE 0 END)
              AS BIGINT) AS c_pp,
         CAST(SUM(CASE WHEN q < med_q AND p < med_p THEN 1 ELSE 0 END)
              AS BIGINT) AS c_mm
  FROM li CROSS JOIN med_q CROSS JOIN med_p
  WHERE q != med_q AND p != med_p
)
SELECT {final}
FROM agg
"""


REGISTRY["blomqvist_beta_lineitem"] = {
    "fn": blomqvist_beta_lineitem,
    "sql": _blomqvist_sql(),
}


# --------------------------------------------------------------------------
# Goodman-Kruskal lambda: proportional reduction in error predicting
# event_type from day-of-week. λ = (Σ_dow max_type c − max_type C)
# / (n − max_type C) — pure integer counts (max of counts, never an
# argmax, so ties cannot break determinism), one final ratio.
# --------------------------------------------------------------------------

_LAMBDA_FINAL = [
    "n_events",
    "sum_row_max",
    "col_max",
    "CAST(sum_row_max - col_max AS DOUBLE)"
    " / NULLIF(CAST(n_events - col_max AS DOUBLE), 0.0) AS gk_lambda",
]


def gk_lambda_dow_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    cells = ev.groupBy(
        F.expr("dayofweek(CAST(ts AS DATE))").alias("dow"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    row_max = cells.groupBy("dow").agg(F.max("c").alias("m"))
    srm = row_max.agg(
        F.sum("m").cast("bigint").alias("sum_row_max")
    )
    col = cells.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("ct")
    )
    cm = col.agg(F.max("ct").cast("bigint").alias("col_max"))
    n = cells.agg(F.sum("c").cast("bigint").alias("n_events"))
    return (
        n.crossJoin(F.broadcast(srm))
        .crossJoin(F.broadcast(cm))
        .selectExpr(*_LAMBDA_FINAL)
    )


def _gk_lambda_sql() -> str:
    final = ",\n       ".join(_LAMBDA_FINAL)
    # DuckDB dayofweek: 0=Sunday..6; Spark dayofweek: 1=Sunday..7.
    # Align by using DuckDB's dayofweek(..)+1.
    return f"""
WITH cells AS (
  SELECT dayofweek(CAST(ts AS DATE)) + 1 AS dow, event_type,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type IS NOT NULL
  GROUP BY 1, 2
),
srm AS (
  SELECT CAST(SUM(m) AS BIGINT) AS sum_row_max FROM (
    SELECT dow, MAX(c) AS m FROM cells GROUP BY 1
  )
),
cm AS (
  SELECT CAST(MAX(ct) AS BIGINT) AS col_max FROM (
    SELECT event_type, SUM(c) AS ct FROM cells GROUP BY 1
  )
),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_events FROM cells)
SELECT {final}
FROM n CROSS JOIN srm CROSS JOIN cm
"""


REGISTRY["gk_lambda_dow_type"] = {
    "fn": gk_lambda_dow_type,
    "sql": _gk_lambda_sql(),
}


# --------------------------------------------------------------------------
# Newey-West (HAC) long-run variance of the daily event-count series,
# Bartlett kernel, lag window L = 7: with integer n-scaled residuals
# e_t = n·y_t − Σy, the lag covariocities C_k = Σ_t e_t·e_{t+k} are
# exact 128-bit integers (calendar-join adjacency over the observed-
# day spine, one k = 0..7 explode + equi-join — no self-cross).
# lrv = [(L+1)·C_0 + 2·Σ_k (L+1−k)·C_k] / ((L+1)·n³); also the
# autocorrelation inflation factor lrv/γ₀ — the effective-sample-size
# deflator a 100 TB A/B pipeline applies to daily-mean standard
# errors.
# --------------------------------------------------------------------------

NW_LAGS = 7


def _nw_final(div: str) -> list[str]:
    nw = _w2d("nw_num", div)
    c0 = _w2d("c0", div)
    lp1 = f"{NW_LAGS + 1}.0"
    return [
        "n_days",
        f"{nw} / ({lp1} * CAST(n_days AS DOUBLE)"
        " * CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE))"
        " AS nw_lrv",
        f"{nw} / NULLIF({lp1} * {c0}, 0.0) AS inflation_vs_gamma0",
    ]


def newey_west_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    e = daily.crossJoin(F.broadcast(tot)).selectExpr(
        "t", "n", "CAST(n AS DECIMAL(38,0)) * y - s AS e"
    )
    lags = e.selectExpr(
        "t",
        "e AS e_lag",
        f"explode(sequence(0, {NW_LAGS})) AS k",
    ).selectExpr("t + k AS t", "k", "e_lag")
    prod = e.join(lags, "t").groupBy("k").agg(
        F.sum(F.expr("e * e_lag")).alias("ck"),
        F.max("n").alias("n_days"),
    )
    agg = prod.groupBy("n_days").agg(
        F.sum(
            F.expr(
                f"CASE WHEN k = 0 THEN CAST({NW_LAGS + 1} AS"
                " DECIMAL(38,0)) * ck"
                f" ELSE 2 * CAST({NW_LAGS + 1} - k AS DECIMAL(38,0))"
                " * ck END"
            )
        ).alias("nw_num"),
        F.sum(F.expr("CASE WHEN k = 0 THEN ck END")).alias("c0"),
    )
    return agg.selectExpr(*_nw_final("DIV"))


def _nw_sql() -> str:
    final = ",\n       ".join(_nw_final("//"))
    return f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s
  FROM daily
),
e AS (
  SELECT t, n, CAST(n AS HUGEINT) * y - s AS e
  FROM daily CROSS JOIN tot
),
lags AS (
  SELECT t + k AS t, k, e AS e_lag
  FROM e CROSS JOIN (
    SELECT unnest(range(0, {NW_LAGS + 1})) AS k
  )
),
prod AS (
  SELECT k, SUM(e.e * l.e_lag) AS ck, MAX(n) AS n_days
  FROM e JOIN lags l USING (t)
  GROUP BY 1
),
agg AS (
  SELECT n_days,
         SUM(CASE WHEN k = 0 THEN CAST({NW_LAGS + 1} AS HUGEINT) * ck
             ELSE 2 * CAST({NW_LAGS + 1} - k AS HUGEINT) * ck END)
           AS nw_num,
         SUM(CASE WHEN k = 0 THEN ck END) AS c0
  FROM prod GROUP BY 1
)
SELECT {final}
FROM agg
"""


REGISTRY["newey_west_daily"] = {
    "fn": newey_west_daily,
    "sql": _nw_sql(),
}


# --------------------------------------------------------------------------
# Runs up-and-down test on the daily event-count series (the
# difference-sign randomness test — the companion of runs_test_value,
# which runs above/below the median): consecutive observed-day
# diffs, zero diffs dropped (documented), R = 1 + sign changes;
# z = (R − (2m−1)/3) / √((16m−29)/90). The daily frame is calendar-
# bounded, so its two order windows are aggregate-frame exceptions.
# --------------------------------------------------------------------------

_RUD_FINAL = [
    "m_diffs",
    "n_runs",
    # GREATEST+NULLIF: for m_diffs <= 1 the variance term goes
    # non-positive — DuckDB's sqrt RAISES on negatives where Spark
    # yields NaN, so the statistic degrades to NULL identically on
    # both engines (z is undefined there anyway)
    "(CAST(n_runs AS DOUBLE)"
    " - (2.0 * CAST(m_diffs AS DOUBLE) - 1.0) / 3.0)"
    " / sqrt(NULLIF(GREATEST("
    "(16.0 * CAST(m_diffs AS DOUBLE) - 29.0) / 90.0, 0.0), 0.0))"
    " AS z_runs_updown",
]


def runs_updown_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    wpos = Window.partitionBy(F.lit(1)).orderBy("t")
    pos = daily.withColumn("pos", F.row_number().over(wpos))
    nxt = pos.selectExpr("pos - 1 AS pos", "y AS y1")
    diffs = (
        pos.join(nxt, "pos")
        .selectExpr("pos", "CAST(SIGN(y1 - y) AS BIGINT) AS s")
        .filter("s != 0")
    )
    wd = Window.partitionBy(F.lit(1)).orderBy("pos")
    dpos = diffs.withColumn("dpos", F.row_number().over(wd))
    dnxt = dpos.selectExpr("dpos - 1 AS dpos", "s AS s1")
    agg = (
        dpos.join(dnxt, "dpos", "left")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m_diffs"),
            (
                F.sum(
                    F.expr(
                        "CAST(s1 IS NOT NULL AND s1 != s AS BIGINT)"
                    )
                )
                + 1
            )
            .cast("bigint")
            .alias("n_runs"),
        )
    )
    return agg.selectExpr(*_RUD_FINAL)


def _rud_sql() -> str:
    final = ",\n       ".join(_RUD_FINAL)
    return f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
pos AS (
  SELECT t, y, ROW_NUMBER() OVER (ORDER BY t) AS pos FROM daily
),
diffs AS (
  SELECT p.pos, CAST(SIGN(n.y - p.y) AS BIGINT) AS s
  FROM pos p JOIN pos n ON n.pos = p.pos + 1
  WHERE SIGN(n.y - p.y) != 0
),
dpos AS (
  SELECT s, ROW_NUMBER() OVER (ORDER BY pos) AS dpos FROM diffs
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m_diffs,
         CAST(SUM(CASE WHEN p.s IS NOT NULL AND p.s != d.s
                  THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_runs
  FROM dpos d LEFT JOIN dpos p ON p.dpos = d.dpos - 1
)
SELECT {final}
FROM agg
"""


REGISTRY["runs_updown_daily"] = {
    "fn": runs_updown_daily,
    "sql": _rud_sql(),
}


# --------------------------------------------------------------------------
# Weibull probability-plot fit of user lifetime durations: on a
# Weibull sample, y = ln(−ln(1−F)) is linear in x = ln(dur) with
# slope = the shape k (k < 1 ⇒ heavy churn early, k > 1 ⇒ aging).
# Midpoint ECDF per distinct duration keeps 1−F the exact rational
# (2(n−cum)+c)/(2n); the DOUBLE portable-ln pipeline (same recipe as
# bartlett): u = ln(2n) − ln(2(n−cum)+c) micro-quantized, then
# y = ln(u_micro) − ln(1e6) with the ln(1e6) literal inlined
# identically on both engines. One unweighted point per distinct
# duration (documented); zero-duration users and u_micro < 1 points
# are excluded (documented). The fit frame is the duration histogram
# — calendar-bounded.
# --------------------------------------------------------------------------

_LN_1E6 = "13.815510557964274"  # portable_ln_const(10**6), exact literal


def _weibull_final(div: str) -> list[str]:
    big = _big(div)
    num = f"(CAST(n AS {big}) * sxy - CAST(sx AS {big}) * sy)"
    den = f"(CAST(n AS {big}) * sxx - CAST(sx AS {big}) * sx)"
    # NULLIF guards (round-15 nullepochs composed shape): a shard whose
    # survivors collapse to ONE distinct duration point makes the fit
    # denominator exactly zero (n·sxx = sx² at n = 1) — Spark ANSI
    # aborts where DuckDB NULLs the division, so the degenerate-sample
    # convention (NULL fit) is pinned identically on both engines; the
    # k = 0 flat fit likewise NULLs ln λ = −b/k instead of aborting.
    k = f"({_w2d(num, div)} / NULLIF({_w2d(den, div)}, 0.0))"
    return [
        "n AS n_points",
        f"{k} AS weibull_shape",
        # intercept = (Σy − k·Σx)/n (micro units); ln λ = −b/k
        f"-((CAST(sy AS DOUBLE) - {k} * CAST(sx AS DOUBLE))"
        f" / (CAST(n AS DOUBLE) * 1000000.0)) / NULLIF({k}, 0.0)"
        " AS weibull_ln_scale",
    ]


def weibull_fit_user_lifetimes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import with_portable_ln

    ev = load_table(spark, sf_dir, "events")
    spans = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.expr(
                "datediff(MAX(CAST(ts AS DATE)),"
                " MIN(CAST(ts AS DATE)))"
            ).alias("dur")
        )
        .filter("dur >= 1")
    )
    hist = spans.groupBy("dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wcum = (
        Window.partitionBy(F.lit(1))
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = hist.agg(F.sum("c").cast("bigint").alias("n_tot"))
    g = (
        hist.withColumn("cum", F.sum("c").over(wcum))
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "CAST(dur AS BIGINT) AS dur",
            "2 * (n_tot - cum) + c AS tail2",
            "2 * n_tot AS n2",
        )
    )
    lu = with_portable_ln(g, "n2", "tail2", "__lnu").selectExpr(
        "dur",
        "CAST(floor(__lnu * 1000000.0 + 0.5) AS BIGINT) AS u_m",
    ).filter("u_m >= 1")
    lx = with_portable_ln(lu, "dur", "1", "__lnx")
    ly = with_portable_ln(lx, "u_m", "1", "__lny")
    q = ly.selectExpr(
        "CAST(floor(__lnx * 1000000.0 + 0.5) AS BIGINT) AS x_u",
        f"CAST(floor((__lny - {_LN_1E6}) * 1000000.0 + 0.5)"
        " AS BIGINT) AS y_u",
    )
    mom = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x_u").cast("bigint").alias("sx"),
        F.sum("y_u").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(x_u AS DECIMAL(38,0)) * y_u")).alias("sxy"),
        F.sum(F.expr("CAST(x_u AS DECIMAL(38,0)) * x_u")).alias("sxx"),
    )
    return mom.selectExpr(*_weibull_final("DIV"))


def _weibull_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
    )

    lnu = portable_ln_duck_ctes(
        "g", "dur", "n2", "tail2", "__lnu", "wu"
    )
    lnx = portable_ln_duck_ctes("lu", "dur, u_m", "dur", "1", "__lnx", "wx")
    lny = portable_ln_duck_ctes(
        "wx_out", "dur, u_m, __lnx", "u_m", "1", "__lny", "wy"
    )
    final = ",\n       ".join(_weibull_final("//"))
    return f"""
WITH spans AS (
  SELECT user_id,
         date_diff('day', MIN(CAST(ts AS DATE)),
                   MAX(CAST(ts AS DATE))) AS dur
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1
),
hist AS (
  SELECT dur, CAST(COUNT(*) AS BIGINT) AS c
  FROM spans WHERE dur >= 1 GROUP BY 1
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tot FROM hist),
g AS (
  SELECT CAST(dur AS BIGINT) AS dur,
         2 * (n_tot - cum) + c AS tail2,
         2 * n_tot AS n2
  FROM (
    SELECT dur, c,
           SUM(c) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM hist
  ) CROSS JOIN tot
),
{lnu},
lu AS (
  SELECT dur,
         CAST(floor(__lnu * 1000000.0 + 0.5) AS BIGINT) AS u_m
  FROM wu_out
  WHERE CAST(floor(__lnu * 1000000.0 + 0.5) AS BIGINT) >= 1
),
{lnx},
{lny},
q AS (
  SELECT CAST(floor(__lnx * 1000000.0 + 0.5) AS BIGINT) AS x_u,
         CAST(floor((__lny - {_LN_1E6}) * 1000000.0 + 0.5)
              AS BIGINT) AS y_u
  FROM wy_out
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x_u) AS BIGINT) AS sx,
         CAST(SUM(y_u) AS BIGINT) AS sy,
         SUM(CAST(x_u AS HUGEINT) * y_u) AS sxy,
         SUM(CAST(x_u AS HUGEINT) * x_u) AS sxx
  FROM q
)
SELECT {final}
FROM mom
"""


REGISTRY["weibull_fit_user_lifetimes"] = {
    "fn": weibull_fit_user_lifetimes,
    "sql": _weibull_sql(),
}


# --------------------------------------------------------------------------
# Bowker's test of symmetry on the event-type transition matrix (the
# k×k generalization of McNemar): χ² = Σ_{i<j} (c_ij − c_ji)²
# / (c_ij + c_ji) over the per-user consecutive-transition counts
# (same ordering convention as markov_entropy_rate). Each term is a
# half-up micro-quantized exact 128-bit quotient (denominators vary
# per pair, k(k−1)/2 ≤ 10 pairs); df counts the non-empty pairs.
# A symmetric chain ⇒ user flows i→j and j→i balance.
# --------------------------------------------------------------------------

_BOWKER_FINAL = [
    "n_transitions",
    "df_pairs",
    "CAST(chi2_u AS DOUBLE) / 1000000.0 AS chi2_bowker",
]


def bowker_symmetry_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        wide_halfup_div_sql as _whd,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.col("event_type").alias("prev"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter("nxt IS NOT NULL")
    cells = trans.groupBy("prev", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    a = cells.filter("prev < nxt").selectExpr(
        "prev AS i", "nxt AS j", "c AS cij"
    )
    b = cells.filter("prev > nxt").selectExpr(
        "nxt AS i", "prev AS j", "c AS cji"
    )
    pairs = a.join(b, ["i", "j"], "full").selectExpr(
        "COALESCE(cij, 0) AS cij", "COALESCE(cji, 0) AS cji"
    )
    tot = cells.agg(
        F.sum("c").cast("bigint").alias("n_transitions")
    )
    term = _whd(
        "CAST(cij - cji AS DECIMAL(38,0)) * (cij - cji) * 1000000",
        "(cij + cji)",
        "DIV",
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("df_pairs"),
        F.sum(F.expr(f"CAST({term} AS DECIMAL(38,0))"))
        .cast("bigint")
        .alias("chi2_u"),
    )
    return agg.crossJoin(F.broadcast(tot)).selectExpr(
        *_BOWKER_FINAL
    )


def _bowker_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        wide_halfup_div_sql as _whd,
    )

    term = _whd(
        "CAST(cij - cji AS HUGEINT) * (cij - cji) * 1000000",
        "(cij + cji)",
        "//",
    )
    final = ",\n       ".join(_BOWKER_FINAL)
    return f"""
WITH ordered AS (
  SELECT event_type, LEAD(event_type) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS nxt
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
cells AS (
  SELECT event_type AS prev, nxt, CAST(COUNT(*) AS BIGINT) AS c
  FROM ordered WHERE nxt IS NOT NULL GROUP BY 1, 2
),
pairs AS (
  SELECT COALESCE(a.cij, 0) AS cij, COALESCE(b.cji, 0) AS cji
  FROM (SELECT prev AS i, nxt AS j, c AS cij FROM cells
        WHERE prev < nxt) a
  FULL JOIN (SELECT nxt AS i, prev AS j, c AS cji FROM cells
             WHERE prev > nxt) b USING (i, j)
),
tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_transitions FROM cells
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS df_pairs,
         CAST(SUM({term}) AS BIGINT) AS chi2_u
  FROM pairs
)
SELECT {final}
FROM agg CROSS JOIN tot
"""


REGISTRY["bowker_symmetry_transitions"] = {
    "fn": bowker_symmetry_transitions,
    "sql": _bowker_sql(),
}


# --------------------------------------------------------------------------
# Gwet's AC1 inter-rater agreement on the two document-quality
# raters of cohens_kappa_docs — the paradox-resistant alternative
# (kappa collapses under prevalence skew; AC1's chance term uses the
# MEAN prevalence). Exact rational: with m = a1 + b1,
# AC1 = (2n·agree − m·(2n − m)) / (2n² − m·(2n − m)) — pure integers,
# one ratio.
# --------------------------------------------------------------------------

_AC1_FINAL = [
    "n_tot",
    "agree",
    "CAST(2 * n_tot * agree"
    " - (a1 + b1) * (2 * n_tot - (a1 + b1)) AS DOUBLE)"
    " / CAST(2 * n_tot * n_tot"
    " - (a1 + b1) * (2 * n_tot - (a1 + b1)) AS DOUBLE) AS gwet_ac1",
]


def gwet_ac1_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # CASE ... ELSE 0: NULL-field docs fail each rule on both engines
    # (round-14 nulldocs parity sweep; see cohens_kappa_docs)
    flags = docs.selectExpr(
        "CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ra",
        "CASE WHEN size(split(text, ' ')) >= 50 THEN 1 ELSE 0 END AS rb",
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tot"),
        F.sum(F.expr("CAST(ra = rb AS BIGINT)"))
        .cast("bigint")
        .alias("agree"),
        F.sum("ra").cast("bigint").alias("a1"),
        F.sum("rb").cast("bigint").alias("b1"),
    )
    return agg.selectExpr(*_AC1_FINAL)


def _ac1_sql() -> str:
    final = ",\n       ".join(_AC1_FINAL)
    return f"""
WITH flags AS (
  SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ra,
         CASE WHEN len(string_split(text, ' ')) >= 50 THEN 1 ELSE 0 END
           AS rb
  FROM documents
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tot,
         CAST(SUM(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT)
           AS agree,
         CAST(SUM(ra) AS BIGINT) AS a1,
         CAST(SUM(rb) AS BIGINT) AS b1
  FROM flags
)
SELECT {final}
FROM agg
"""


REGISTRY["gwet_ac1_docs"] = {
    "fn": gwet_ac1_docs,
    "sql": _ac1_sql(),
}


# --------------------------------------------------------------------------
# Two-way (randomized-block) ANOVA on the dense day × type grid —
# days as blocks, types as treatments, no replication (so no
# interaction term): rides the exact nk-scaled sums of squares of
# icc_daily_types. F_types = A_c·(n−1)/A_e tests the treatment
# effect Friedman tests nonparametrically; F_days = A_r·(k−1)/A_e is
# the block effect. Both exact-integer ratios.
# --------------------------------------------------------------------------


def _anova2_final(div: str) -> list[str]:
    ae = "(a_t - a_r - a_c)"
    return [
        "n_days",
        "k_types",
        f"{_w2d(f'CAST(k_types - 1 AS {_big(div)}) * a_r', div)}"
        f" / NULLIF({_w2d(ae, div)}, 0.0) AS f_days",
        f"{_w2d(f'CAST(n_days - 1 AS {_big(div)}) * a_c', div)}"
        f" / NULLIF({_w2d(ae, div)}, 0.0) AS f_types",
    ]


def two_way_anova_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
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
    rows_ = (
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
        dims.crossJoin(F.broadcast(rows_))
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
    return ss.selectExpr(*_anova2_final("DIV"))


def _anova2_sql() -> str:
    final = ",\n       ".join(_anova2_final("//"))
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


REGISTRY["two_way_anova_daily"] = {
    "fn": two_way_anova_daily,
    "sql": _anova2_sql(),
}


# --------------------------------------------------------------------------
# 10%-trimmed mean of `value` per event type: drop ⌊n/10⌋ rows from
# each tail of the per-type cents histogram (positional overlap
# arithmetic on the cum window — exact integers; the histogram is
# the only shuffle), average the kept mass. The robust-location
# companion of mad_price / mood_median.
# --------------------------------------------------------------------------

_TRIM_FINAL = [
    "event_type",
    "n_total",
    "n_kept",
    "CAST(s_kept AS DOUBLE) / CAST(n_kept AS DOUBLE)"
    " AS trimmed_mean_cents",
]


def trimmed_mean_value_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hist = (
        load_events_finite(spark, sf_dir)
        .filter(F.col("event_type").isNotNull())
        .groupBy(
            "event_type",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v_c"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("v_c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = hist.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n_t")
    )
    g = (
        hist.withColumn("cum", F.sum("c").over(wcum))
        .join(tot, "event_type")
        .selectExpr(
            "event_type",
            "n_t",
            "v_c",
            "c",
            "cum",
            "n_t DIV 10 AS k",
        )
    )
    kept = g.selectExpr(
        "event_type",
        "n_t",
        "v_c",
        "GREATEST(CAST(0 AS BIGINT),"
        " LEAST(cum, n_t - k) - GREATEST(cum - c + 1, k + 1) + 1)"
        " AS kc",
    )
    agg = kept.groupBy("event_type").agg(
        F.max("n_t").alias("n_total"),
        F.sum("kc").cast("bigint").alias("n_kept"),
        F.sum(F.expr("CAST(kc AS DECIMAL(38,0)) * v_c")).alias(
            "s_kept"
        ),
    )
    return agg.selectExpr(*_TRIM_FINAL).orderBy("event_type")


def _trim_sql() -> str:
    final = ",\n       ".join(_TRIM_FINAL)
    return f"""
WITH hist AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
g AS (
  SELECT event_type, v_c, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY v_c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n_t
  FROM hist
),
kept AS (
  SELECT event_type, n_t, v_c,
         GREATEST(CAST(0 AS BIGINT),
           LEAST(cum, n_t - (n_t // 10))
           - GREATEST(cum - c + 1, (n_t // 10) + 1) + 1) AS kc
  FROM g
),
agg AS (
  SELECT event_type,
         CAST(MAX(n_t) AS BIGINT) AS n_total,
         CAST(SUM(kc) AS BIGINT) AS n_kept,
         SUM(CAST(kc AS HUGEINT) * v_c) AS s_kept
  FROM kept GROUP BY 1
)
SELECT {final}
FROM agg
ORDER BY event_type
"""


REGISTRY["trimmed_mean_value_types"] = {
    "fn": trimmed_mean_value_types,
    "sql": _trim_sql(),
}


# --------------------------------------------------------------------------
# Brunner-Munzel test (click vs purchase `value`) — the modern
# replacement for Mann-Whitney under unequal variances AND unequal
# shapes (lawstat::brunner.munzel.test parity). With doubled pooled
# midranks R2_v and doubled within-group midranks W2_v (both from
# the same histogram cums), the placement deltas d = R2 − W2 are
# exact integers;
#   BM = (m·S_b − n·S_a) / (N·√(V_a/(m−1) + V_b/(n−1)))
# with S_i = Σ d_i (doubled-rank sums) and V_i = n_i·Σd² − (Σd)²
# the n_i-scaled variance numerators — one IEEE chain.
# --------------------------------------------------------------------------


def _bm_final(div: str) -> list[str]:
    va = _w2d("v_a", div)
    vb = _w2d("v_b", div)
    return [
        "n_a",
        "n_b",
        # numerator carries the within-rank mean offset n_a·n_b·(n_b −
        # n_a), which cancels ONLY for equal sample sizes — dropping it
        # was caught by the pure-Python recompute test
        # NULLIF guards: n = 1 sides zero the (n-1) factors and
        # constant samples zero the rank variance — ANSI
        # DIVIDE_BY_ZERO on Spark; W degrades to NULL on both engines
        # (round-14 small-sample parity sweep)
        "CAST(n_a * sb2 - n_b * sa2 + n_a * n_b * (n_b - n_a)"
        " AS DOUBLE)"
        f" / NULLIF(CAST(n_a + n_b AS DOUBLE) * sqrt({va}"
        f" / NULLIF(CAST(n_a AS DOUBLE) - 1.0, 0.0) + {vb}"
        " / NULLIF(CAST(n_b AS DOUBLE) - 1.0, 0.0)), 0.0)"
        " AS w_brunner_munzel",
    ]


def brunner_munzel_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # shared persisted two-sample cum frame (operators/pairhist.py)
    from de4ml_spark.operators.pairhist import two_sample_cums

    cum = two_sample_cums(spark, sf_dir)
    # doubled pooled midrank minus doubled within-group midrank =
    # doubled placement vs the OTHER sample (constant per value)
    d = cum.selectExpr(
        "a_n",
        "b_n",
        # pooled R2 = 2*(ca+cb - a_n - b_n) + (a_n + b_n) + 1;
        # within-a W2 = 2*(ca - a_n) + a_n + 1  =>  d_a = 2*(cb-b_n)+b_n
        "2 * (cb - b_n) + b_n AS d_a",
        "2 * (ca - a_n) + a_n AS d_b",
    )
    agg = d.agg(
        F.sum("a_n").cast("bigint").alias("n_a"),
        F.sum("b_n").cast("bigint").alias("n_b"),
        F.sum(F.expr("a_n * d_a")).cast("bigint").alias("sa2"),
        F.sum(F.expr("b_n * d_b")).cast("bigint").alias("sb2"),
        F.sum(F.expr("CAST(a_n AS DECIMAL(38,0)) * d_a * d_a")).alias(
            "sa2sq"
        ),
        F.sum(F.expr("CAST(b_n AS DECIMAL(38,0)) * d_b * d_b")).alias(
            "sb2sq"
        ),
    )
    staged = agg.selectExpr(
        "n_a",
        "n_b",
        "sa2",
        "sb2",
        "CAST(n_a AS DECIMAL(38,0)) * sa2sq"
        " - CAST(sa2 AS DECIMAL(38,0)) * sa2 AS v_a",
        "CAST(n_b AS DECIMAL(38,0)) * sb2sq"
        " - CAST(sb2 AS DECIMAL(38,0)) * sb2 AS v_b",
    )
    return staged.selectExpr(*_bm_final("DIV"))


def _bm_sql() -> str:
    final = ",\n       ".join(_bm_final("//"))
    return f"""
WITH {_TWO_SAMPLE_HIST_SQL},
cum AS (
  SELECT v_c, a_n, b_n,
         SUM(a_n) OVER w AS ca,
         SUM(b_n) OVER w AS cb
  FROM byval
  WINDOW w AS (ORDER BY v_c
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
d AS (
  SELECT a_n, b_n,
         2 * (cb - b_n) + b_n AS d_a,
         2 * (ca - a_n) + a_n AS d_b
  FROM cum
),
agg AS (
  SELECT CAST(SUM(a_n) AS BIGINT) AS n_a,
         CAST(SUM(b_n) AS BIGINT) AS n_b,
         CAST(SUM(a_n * d_a) AS BIGINT) AS sa2,
         CAST(SUM(b_n * d_b) AS BIGINT) AS sb2,
         SUM(CAST(a_n AS HUGEINT) * d_a * d_a) AS sa2sq,
         SUM(CAST(b_n AS HUGEINT) * d_b * d_b) AS sb2sq
  FROM d
),
staged AS (
  SELECT n_a, n_b, sa2, sb2,
         CAST(n_a AS HUGEINT) * sa2sq
         - CAST(sa2 AS HUGEINT) * sa2 AS v_a,
         CAST(n_b AS HUGEINT) * sb2sq
         - CAST(sb2 AS HUGEINT) * sb2 AS v_b
  FROM agg
)
SELECT {final}
FROM staged
"""


REGISTRY["brunner_munzel_value"] = {
    "fn": brunner_munzel_value,
    "sql": _bm_sql(),
}


# --------------------------------------------------------------------------
# Dunn's post-hoc test after Kruskal-Wallis: pairwise z for every
# event-type pair from the pooled midranks of `value`, with the
# standard tie correction. Doubled midranks R2 per (type, value)
# come from the pooled histogram cum; per-type doubled rank sums and
# the pooled tie term T = Σ(t³−t) are exact integers; each pair's
#   z = (R̄_i − R̄_j) / √((N(N+1)/12 − T/(12(N−1)))·(1/n_i + 1/n_j))
# is one IEEE chain over the k(k−1)/2 ≤ 10-row pair frame.
# --------------------------------------------------------------------------

_DUNN_FINAL = [
    "type_a",
    "type_b",
    "n_a",
    "n_b",
    # NULLIF: an all-tied shard makes the tie term cancel the variance
    # exactly (T = N³−N ⇒ bracket = 0; round-14 ties sweep) — NULL z
    "(CAST(s_a AS DOUBLE) / (2.0 * CAST(n_a AS DOUBLE))"
    " - CAST(s_b AS DOUBLE) / (2.0 * CAST(n_b AS DOUBLE)))"
    " / NULLIF(sqrt((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0) / 12.0"
    " - CAST(tie_t AS DOUBLE) / (12.0 * (CAST(nn AS DOUBLE) - 1.0)))"
    " * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 0.0)"
    " AS z_dunn",
]


def dunn_posthoc_value_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hist = (
        load_events_finite(spark, sf_dir)
        .filter(F.col("event_type").isNotNull())
        .groupBy(
            "event_type",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v_c"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    pooled = hist.groupBy("v_c").agg(
        F.sum("c").cast("bigint").alias("pc")
    )
    wcum = (
        Window.partitionBy(F.lit(1))
        .orderBy("v_c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pr = pooled.withColumn("cum", F.sum("pc").over(wcum)).selectExpr(
        "v_c", "pc", "2 * (cum - pc) + pc + 1 AS r2"
    )
    per = (
        hist.join(F.broadcast(pr.select("v_c", "r2")), "v_c")
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("bigint").alias("n_i"),
            F.sum(F.expr("c * r2")).cast("bigint").alias("s_i"),
        )
    )
    ties = pr.agg(
        F.sum(
            F.expr("CAST(pc AS DECIMAL(38,0)) * pc * pc - pc")
        ).alias("tie_w"),
        F.sum("pc").cast("bigint").alias("nn"),
    ).selectExpr("CAST(tie_w AS BIGINT) AS tie_t", "nn")
    a = per.selectExpr(
        "event_type AS type_a", "n_i AS n_a", "s_i AS s_a"
    )
    b = per.selectExpr(
        "event_type AS type_b", "n_i AS n_b", "s_i AS s_b"
    )
    pairs = (
        a.join(F.broadcast(b), F.expr("type_a < type_b"))
        .crossJoin(F.broadcast(ties))
    )
    return pairs.selectExpr(*_DUNN_FINAL).orderBy(
        "type_a", "type_b"
    )


def _dunn_sql() -> str:
    final = ",\n       ".join(_DUNN_FINAL)
    return f"""
WITH hist AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
pr AS (
  SELECT v_c, pc,
         2 * (SUM(pc) OVER (ORDER BY v_c
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - pc)
         + pc + 1 AS r2
  FROM (SELECT v_c, CAST(SUM(c) AS BIGINT) AS pc
        FROM hist GROUP BY 1)
),
per AS (
  SELECT event_type,
         CAST(SUM(c) AS BIGINT) AS n_i,
         CAST(SUM(c * r2) AS BIGINT) AS s_i
  FROM hist JOIN pr USING (v_c)
  GROUP BY 1
),
ties AS (
  SELECT CAST(SUM(CAST(pc AS HUGEINT) * pc * pc - pc) AS BIGINT)
           AS tie_t,
         CAST(SUM(pc) AS BIGINT) AS nn
  FROM pr
)
SELECT {final}
FROM (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.n_i AS n_a, b.n_i AS n_b, a.s_i AS s_a, b.s_i AS s_b
  FROM per a JOIN per b ON a.event_type < b.event_type
) CROSS JOIN ties
ORDER BY type_a, type_b
"""


REGISTRY["dunn_posthoc_value_types"] = {
    "fn": dunn_posthoc_value_types,
    "sql": _dunn_sql(),
}


# --------------------------------------------------------------------------
# Seasonal Mann-Kendall trend test (Hirsch-Slack) on daily event
# counts with day-of-week seasons: within each weekday, the usual MK
# kernel S_s = Σ_{i<j} sgn(c_j − c_i), with per-season tie-corrected
# variances Var_s = [n_s(n_s−1)(2n_s+5) − Σt(t−1)(2t+5)]/18;
# S = ΣS_s, Var = ΣVar_s (seasons independent under H₀),
# z = (S ∓ 1)/√Var (continuity-corrected). Removes the weekly cycle
# that inflates plain mann_kendall_daily. Pair frames are per-season
# (calendar²/49), exact integers throughout; one IEEE tail.
# --------------------------------------------------------------------------

_SMK_FINAL = [
    "n_days",
    "s_stat",
    "CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)"
    " / sqrt(CAST(var18 AS DOUBLE) / 18.0)"
    " WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)"
    " / sqrt(CAST(var18 AS DOUBLE) / 18.0)"
    " ELSE 0.0 END AS z_seasonal_mk",
]


def seasonal_mann_kendall_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).selectExpr("day", "c", "dayofweek(day) AS season")
    a = daily.selectExpr("season", "day AS da", "c AS ca")
    b = daily.selectExpr("season", "day AS db", "c AS cb")
    s = (
        a.join(b, "season")
        .filter("da < db")
        .agg(
            F.sum(
                F.expr(
                    "CAST(cb > ca AS BIGINT) - CAST(cb < ca AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    per_season = daily.groupBy("season").agg(
        F.count(F.lit(1)).cast("bigint").alias("ns")
    )
    ties = (
        daily.groupBy("season", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("season")
        .agg(
            F.sum(
                F.expr(
                    "CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5)"
                )
            ).alias("tsum")
        )
    )
    var18 = (
        per_season.join(ties, "season")
        .selectExpr(
            "ns",
            "CAST(ns AS DECIMAL(38,0)) * (ns - 1) * (2 * ns + 5)"
            " - tsum AS v18",
        )
        .agg(
            F.sum("ns").cast("bigint").alias("n_days"),
            F.sum("v18").alias("var18"),
        )
    )
    return s.crossJoin(F.broadcast(var18)).selectExpr(*_SMK_FINAL)


def _smk_sql() -> str:
    final = ",\n       ".join(_SMK_FINAL)
    return f"""
WITH daily AS (
  SELECT day, c, dayofweek(day) + 1 AS season
  FROM (
    SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1
  )
),
s AS (
  SELECT CAST(SUM(CASE WHEN b.c > a.c THEN 1
                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM daily a JOIN daily b
    ON a.season = b.season AND a.day < b.day
),
ties AS (
  SELECT season,
         SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS tsum
  FROM (SELECT season, c, CAST(COUNT(*) AS BIGINT) AS t
        FROM daily GROUP BY 1, 2)
  GROUP BY 1
),
per_season AS (
  SELECT season, CAST(COUNT(*) AS BIGINT) AS ns FROM daily GROUP BY 1
),
var18 AS (
  SELECT CAST(SUM(ns) AS BIGINT) AS n_days,
         SUM(CAST(ns AS HUGEINT) * (ns - 1) * (2 * ns + 5) - tsum)
           AS var18
  FROM per_season JOIN ties USING (season)
)
SELECT {final}
FROM s CROSS JOIN var18
"""


REGISTRY["seasonal_mann_kendall_daily"] = {
    "fn": seasonal_mann_kendall_daily,
    "sql": _smk_sql(),
}


# --------------------------------------------------------------------------
# Cucconi joint location-scale test (click vs purchase `value`) —
# the modern one-shot alternative to running Wilcoxon + Ansari
# separately (Lepage's pair): with pooled midranks R of sample B and
# contrary ranks N+1−R,
#   U = (6ΣR² − n(N+1)(2N+1)) / √(mn(N+1)(2N+1)(8N+11)/5),
#   V the same on contrary ranks,
#   ρ = 2(N²−4)/((2N+1)(8N+11)) − 1,
#   C = (U² + V² − 2ρUV) / (2(1−ρ²)).
# Doubled midranks keep ΣR² = Σ b_v·R2²/4 exact (quarter-scaled
# integers); one IEEE chain. Ties use midranks (documented — the
# permutation-exact version is test-scale only).
# --------------------------------------------------------------------------


def _cucconi_final(div: str) -> list[str]:
    sr2 = _w2d("sr2q", div)  # 4·ΣR²
    sc2 = _w2d("sc2q", div)  # 4·Σ(N+1−R)²
    u = (
        f"((6.0 * {sr2} / 4.0 - CAST(n_b AS DOUBLE)"
        " * CAST(nn + 1 AS DOUBLE) * CAST(2 * nn + 1 AS DOUBLE))"
        " / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)"
        " * CAST(nn + 1 AS DOUBLE) * CAST(2 * nn + 1 AS DOUBLE)"
        " * CAST(8 * nn + 11 AS DOUBLE) / 5.0))"
    )
    v = (
        f"((6.0 * {sc2} / 4.0 - CAST(n_b AS DOUBLE)"
        " * CAST(nn + 1 AS DOUBLE) * CAST(2 * nn + 1 AS DOUBLE))"
        " / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)"
        " * CAST(nn + 1 AS DOUBLE) * CAST(2 * nn + 1 AS DOUBLE)"
        " * CAST(8 * nn + 11 AS DOUBLE) / 5.0))"
    )
    rho = (
        "(2.0 * (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) - 4.0)"
        " / (CAST(2 * nn + 1 AS DOUBLE) * CAST(8 * nn + 11 AS DOUBLE))"
        " - 1.0)"
    )
    return [
        "n_a",
        "n_b",
        f"{u} AS u_loc",
        f"{v} AS v_scale",
        f"(({u}) * ({u}) + ({v}) * ({v})"
        f" - 2.0 * {rho} * ({u}) * ({v}))"
        f" / (2.0 * (1.0 - {rho} * {rho})) AS cucconi_c",
    ]


def cucconi_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shared persisted two-sample cum frame (operators/pairhist.py)
    from de4ml_spark.operators.pairhist import two_sample_cums

    g = two_sample_cums(spark, sf_dir).selectExpr(
        "b_n",
        "na_tot AS n_a",
        "nb_tot AS n_b",
        "na_tot + nb_tot AS nn",
        # doubled pooled midrank of the value group
        "2 * (ca + cb - a_n - b_n) + (a_n + b_n) + 1 AS r2",
    )
    agg = g.groupBy("n_a", "n_b", "nn").agg(
        F.sum(F.expr("CAST(b_n AS DECIMAL(38,0)) * r2 * r2")).alias(
            "sr2q"
        ),
        F.sum(
            F.expr(
                "CAST(b_n AS DECIMAL(38,0))"
                " * (2 * (nn + 1) - r2) * (2 * (nn + 1) - r2)"
            )
        ).alias("sc2q"),
    )
    return agg.selectExpr(*_cucconi_final("DIV"))


def _cucconi_sql() -> str:
    final = ",\n       ".join(_cucconi_final("//"))
    return f"""
WITH {_TWO_SAMPLE_HIST_SQL},
cum AS (
  SELECT v_c, a_n, b_n,
         SUM(a_n) OVER w AS ca,
         SUM(b_n) OVER w AS cb
  FROM byval
  WINDOW w AS (ORDER BY v_c
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
totals AS (
  SELECT CAST(SUM(a_n) AS BIGINT) AS n_a,
         CAST(SUM(b_n) AS BIGINT) AS n_b
  FROM byval
),
g AS (
  SELECT b_n, n_a, n_b, n_a + n_b AS nn,
         2 * (ca + cb - a_n - b_n) + (a_n + b_n) + 1 AS r2
  FROM cum CROSS JOIN totals
),
agg AS (
  SELECT n_a, n_b, nn,
         SUM(CAST(b_n AS HUGEINT) * r2 * r2) AS sr2q,
         SUM(CAST(b_n AS HUGEINT)
             * (2 * (nn + 1) - r2) * (2 * (nn + 1) - r2)) AS sc2q
  FROM g GROUP BY 1, 2, 3
)
SELECT {final}
FROM agg
"""


REGISTRY["cucconi_value"] = {
    "fn": cucconi_value,
    "sql": _cucconi_sql(),
}


# --------------------------------------------------------------------------
# Theil's uncertainty coefficient U(type | weekday) — the
# information-theoretic companion of cramers_v (symmetric) and
# gk_lambda (error-reduction): U = I(X;Y)/H(X) with
# H(X) = Σ_x (c_x/N)·ln(N/c_x) and I = Σ_xy (c_xy/N)·ln(N·c_xy/
# (c_x·c_y)). Every ln rides the portable-ln on exact integer
# rationals, micro-quantized, weighted by exact counts — the final
# value is one ratio of two exact micro-sums. Cell frame is
# 7 × k-bounded.
# --------------------------------------------------------------------------

_UNCERT_FINAL = [
    "n_events",
    "CAST(mi_u AS DOUBLE) / NULLIF(CAST(hx_u AS DOUBLE), 0.0)"
    " AS uncertainty_coefficient",
    "CAST(mi_u AS DOUBLE)"
    " / NULLIF(CAST(n_events AS DOUBLE) * 1000000.0, 0.0)"
    " AS mutual_info_nats",
]


def uncertainty_coeff_dow_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import with_portable_ln

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    cells = ev.groupBy(
        F.expr("dayofweek(CAST(ts AS DATE))").alias("dow"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    rows_ = cells.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("cx")
    )
    cols = cells.groupBy("dow").agg(
        F.sum("c").cast("bigint").alias("cy")
    )
    tot = cells.agg(F.sum("c").cast("bigint").alias("nn"))
    j = (
        cells.join(F.broadcast(rows_), "event_type")
        .join(F.broadcast(cols), "dow")
        .crossJoin(F.broadcast(tot))
    )
    # I-term: ln(N·c_xy / (c_x·c_y)) — sign varies, ordered-pair ln
    ji = j.selectExpr(
        "c",
        "nn",
        "CAST(nn AS DECIMAL(38,0)) * c AS p_num",
        "CAST(cx AS DECIMAL(38,0)) * cy AS p_den",
    )
    li = with_portable_ln(
        ji,
        "CASE WHEN p_num >= p_den THEN p_num ELSE p_den END",
        "CASE WHEN p_num >= p_den THEN p_den ELSE p_num END",
        "__lnr",
    ).selectExpr(
        "nn",
        "CAST(c AS DECIMAL(38,0))"
        " * CAST(floor((CASE WHEN p_num >= p_den THEN __lnr"
        " ELSE -__lnr END) * 1000000.0 + 0.5) AS BIGINT) AS mi_term",
    )
    mi = li.groupBy("nn").agg(
        F.sum("mi_term").alias("mi_w")
    ).selectExpr("nn", "CAST(mi_w AS DECIMAL(38,0)) AS mi_u")
    # H(X): Σ c_x · ln(N / c_x), micro-quantized
    hx_j = rows_.crossJoin(F.broadcast(tot))
    hx = with_portable_ln(hx_j, "nn", "cx", "__lnh").selectExpr(
        "CAST(cx AS DECIMAL(38,0))"
        " * CAST(floor(__lnh * 1000000.0 + 0.5) AS BIGINT) AS h_term"
    ).agg(F.sum("h_term").alias("hx_w"))
    out = mi.crossJoin(F.broadcast(hx)).selectExpr(
        "nn AS n_events",
        "mi_u",
        "CAST(hx_w AS DECIMAL(38,0)) AS hx_u",
    )
    return out.selectExpr(*_UNCERT_FINAL)


def _uncert_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
    )

    lni = portable_ln_duck_ctes(
        "ji",
        "c, nn, p_num, p_den",
        "CASE WHEN p_num >= p_den THEN p_num ELSE p_den END",
        "CASE WHEN p_num >= p_den THEN p_den ELSE p_num END",
        "__lnr",
        "ui",
    )
    lnh = portable_ln_duck_ctes(
        "hx_j", "cx", "nn", "cx", "__lnh", "uh"
    )
    final = ",\n       ".join(_UNCERT_FINAL)
    return f"""
WITH cells AS (
  SELECT dayofweek(CAST(ts AS DATE)) + 1 AS dow, event_type,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type IS NOT NULL
  GROUP BY 1, 2
),
rows_ AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS cx
  FROM cells GROUP BY 1
),
cols AS (
  SELECT dow, CAST(SUM(c) AS BIGINT) AS cy FROM cells GROUP BY 1
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM cells),
ji AS (
  SELECT c, nn,
         CAST(nn AS HUGEINT) * c AS p_num,
         CAST(cx AS HUGEINT) * cy AS p_den
  FROM cells JOIN rows_ USING (event_type) JOIN cols USING (dow)
  CROSS JOIN tot
),
{lni},
mi AS (
  SELECT nn,
         CAST(SUM(CAST(c AS HUGEINT)
              * CAST(floor((CASE WHEN p_num >= p_den THEN __lnr
                ELSE -__lnr END) * 1000000.0 + 0.5) AS BIGINT))
              AS HUGEINT) AS mi_u
  FROM ui_out GROUP BY 1
),
hx_j AS (SELECT cx, nn FROM rows_ CROSS JOIN tot),
{lnh},
hx AS (
  SELECT CAST(SUM(CAST(cx AS HUGEINT)
              * CAST(floor(__lnh * 1000000.0 + 0.5) AS BIGINT))
              AS HUGEINT) AS hx_u
  FROM uh_out
)
SELECT {final}
FROM (SELECT nn AS n_events, mi_u, hx_u FROM mi CROSS JOIN hx)
"""


REGISTRY["uncertainty_coeff_dow_type"] = {
    "fn": uncertainty_coeff_dow_type,
    "sql": _uncert_sql(),
}


# --------------------------------------------------------------------------
# Youden-J optimal threshold separating click vs purchase on `value`:
# J(θ) = TPR(θ) − FPR(θ) is maximized exactly where the class-
# conditional CDF gap |F_a − F_b| peaks (the KS argmax), so the
# threshold pops out of the SAME bounded-histogram cum window —
# integer argmax, ties broken to the smallest cents value
# (deterministic). Emits the threshold, J, and the confusion counts
# at the optimum — the operating-point report an ML pipeline
# publishes beside auc_roc_events.
# --------------------------------------------------------------------------

_YOUDEN_FINAL = [
    "threshold_cents",
    "n_a",
    "n_b",
    "tp",
    "fp",
    "CAST(j_num AS DOUBLE)"
    " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS youden_j",
]


def youden_threshold_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # shared persisted two-sample cum frame (operators/pairhist.py)
    from de4ml_spark.operators.pairhist import two_sample_cums

    g = two_sample_cums(spark, sf_dir).selectExpr(
        "v_c",
        "na_tot AS n_a",
        "nb_tot AS n_b",
        # classify "> v_c" as predicted-purchase: TP = purchases
        # above, FP = clicks above
        "nb_tot - cb AS tp",
        "na_tot - ca AS fp",
        "abs(ca * nb_tot - cb * na_tot) AS j_num",
    )
    best = g.agg(
        F.max(
            F.struct(
                F.col("j_num"),
                (-F.col("v_c")).alias("neg_v"),
                F.col("v_c").alias("threshold_cents"),
                F.col("n_a"),
                F.col("n_b"),
                F.col("tp"),
                F.col("fp"),
            )
        ).alias("s")
    ).filter(
        # empty input: MAX(struct) over zero rows is NULL — drop the
        # row so both engines return zero rows (oracle: LIMIT 1 over
        # an empty frame); free filter on a 1-row aggregate
        F.col("s").isNotNull()
    ).selectExpr(
        "s.threshold_cents",
        "s.n_a",
        "s.n_b",
        "s.tp",
        "s.fp",
        "s.j_num",
    )
    return best.selectExpr(*_YOUDEN_FINAL)


def _youden_sql() -> str:
    final = ",\n       ".join(_YOUDEN_FINAL)
    return f"""
WITH {_TWO_SAMPLE_HIST_SQL},
cum AS (
  SELECT v_c, a_n, b_n,
         SUM(a_n) OVER w AS ca,
         SUM(b_n) OVER w AS cb
  FROM byval
  WINDOW w AS (ORDER BY v_c
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
totals AS (
  SELECT CAST(SUM(a_n) AS BIGINT) AS n_a,
         CAST(SUM(b_n) AS BIGINT) AS n_b
  FROM byval
),
g AS (
  SELECT v_c, n_a, n_b,
         CAST(n_b - cb AS BIGINT) AS tp,
         CAST(n_a - ca AS BIGINT) AS fp,
         CAST(ABS(ca * n_b - cb * n_a) AS BIGINT) AS j_num
  FROM cum CROSS JOIN totals
),
best AS (
  SELECT v_c AS threshold_cents, n_a, n_b, tp, fp, j_num
  FROM g
  ORDER BY j_num DESC, v_c ASC
  LIMIT 1
)
SELECT {final}
FROM best
"""


REGISTRY["youden_threshold_value"] = {
    "fn": youden_threshold_value,
    "sql": _youden_sql(),
}


# --------------------------------------------------------------------------
# Mahalanobis-distance anomaly ranking of days in the (click count,
# purchase count) plane: d²_t = (x_t−μ)ᵀ C⁻¹ (x_t−μ) with the 2×2
# population covariance inverted in closed form. With integer
# n-scaled residuals z = n·x − Σx and A = Σz_x², B = Σz_x z_y,
# D = Σz_y²:  d²_t = n·(D·z_x² − 2B·z_x z_y + A·z_y²)/(AD − B²)
# — the per-day numerator is an exact 128-bit integer, so the top-5
# ranking (ties by day) is engine-deterministic BEFORE any float.
# --------------------------------------------------------------------------

MAHAL_TOPK = 5


def _mahal_final(div: str) -> list[str]:
    return [
        "day",
        "clicks",
        "purchases",
        f"CAST(n_days AS DOUBLE) * {_w2d('d2_num', div)}"
        f" / NULLIF({_w2d('det2', div)}, 0.0) AS mahal_d2",
    ]


def mahalanobis_anomalous_days(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # CASE..ELSE 0, not CAST(bool AS BIGINT): a day whose only rows
    # carry NULL event_type (round-15 nullepochs composed shape — a
    # NULL-typed row isolated on its own clock-skewed day) must count
    # 0, not SUM-of-all-NULL = NULL, matching the oracle's CASE
    # (a NULL-typed event is not a click).
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.expr("CASE WHEN event_type = 'click' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("x"),
        F.sum(
            F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
        )
        .cast("bigint")
        .alias("y"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    z = daily.crossJoin(F.broadcast(tot)).selectExpr(
        "day",
        "x",
        "y",
        "n_days",
        "CAST(n_days AS DECIMAL(38,0)) * x - sx AS zx",
        "CAST(n_days AS DECIMAL(38,0)) * y - sy AS zy",
    )
    mom = z.agg(
        F.sum(F.expr("zx * zx")).alias("a_m"),
        F.sum(F.expr("zx * zy")).alias("b_m"),
        F.sum(F.expr("zy * zy")).alias("d_m"),
    )
    scored = z.crossJoin(F.broadcast(mom)).selectExpr(
        "day",
        "x AS clicks",
        "y AS purchases",
        "n_days",
        "d_m * zx * zx - 2 * b_m * zx * zy + a_m * zy * zy"
        " AS d2_num",
        "a_m * d_m - b_m * b_m AS det2",
    )
    w = Window.orderBy(F.desc("d2_num"), F.asc("day"))
    top = scored.withColumn("rk", F.row_number().over(w)).filter(
        f"rk <= {MAHAL_TOPK}"
    )
    return top.selectExpr(*_mahal_final("DIV")).orderBy("day")


def _mahal_sql() -> str:
    final = ",\n       ".join(_mahal_final("//"))
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy
  FROM daily
),
z AS (
  SELECT day, x, y, n_days,
         CAST(n_days AS HUGEINT) * x - sx AS zx,
         CAST(n_days AS HUGEINT) * y - sy AS zy
  FROM daily CROSS JOIN tot
),
mom AS (
  SELECT SUM(zx * zx) AS a_m,
         SUM(zx * zy) AS b_m,
         SUM(zy * zy) AS d_m
  FROM z
),
scored AS (
  SELECT day, x AS clicks, y AS purchases, n_days,
         d_m * zx * zx - 2 * b_m * zx * zy + a_m * zy * zy AS d2_num,
         a_m * d_m - b_m * b_m AS det2
  FROM z CROSS JOIN mom
),
top AS (
  SELECT * FROM scored ORDER BY d2_num DESC, day ASC
  LIMIT {MAHAL_TOPK}
)
SELECT {final}
FROM top
ORDER BY day
"""


REGISTRY["mahalanobis_anomalous_days"] = {
    "fn": mahalanobis_anomalous_days,
    "sql": _mahal_sql(),
}


# --------------------------------------------------------------------------
# Cohen's d and Hedges' g (click vs purchase `value`): standardized
# mean difference with the pooled sample SD, plus Hedges' small-
# sample correction g = d·(1 − 3/(4N−9)). Exact integer moments
# (n-scaled variance numerators), one IEEE chain.
# --------------------------------------------------------------------------


def _cohen_final(div: str) -> list[str]:
    va = _w2d("v_a", div)
    vb = _w2d("v_b", div)
    # pooled s² = (Va/(na) + Vb/(nb)) scale algebra: Va = na·Σx²−(Σx)²
    # → Σ(x−x̄)² = Va/na; s²_p = (Va/na + Vb/nb)/(na+nb−2)
    # NULLIF: both classes all-tied (round-14 ties sweep) gives pooled
    # s = 0 — d is undefined, degrade to NULL on both engines
    d = (
        "((CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " - CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE))"
        f" / NULLIF(sqrt(({va} / CAST(n_a AS DOUBLE)"
        f" + {vb} / CAST(n_b AS DOUBLE))"
        " / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2.0)), 0.0))"
    )
    return [
        "n_a",
        "n_b",
        f"{d} AS cohens_d",
        f"{d} * (1.0 - 3.0 / (4.0 * (CAST(n_a AS DOUBLE)"
        " + CAST(n_b AS DOUBLE)) - 9.0)) AS hedges_g",
    ]


def cohens_d_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shared persisted two-sample cum frame (operators/pairhist.py):
    # only the histogram columns are used, but riding the shared scan
    # drops the per-entry events pass
    from de4ml_spark.operators.pairhist import two_sample_cums

    byval = two_sample_cums(spark, sf_dir)
    agg = byval.agg(
        F.sum("a_n").cast("bigint").alias("n_a"),
        F.sum("b_n").cast("bigint").alias("n_b"),
        F.sum(F.expr("a_n * v_c")).cast("bigint").alias("sa"),
        F.sum(F.expr("b_n * v_c")).cast("bigint").alias("sb"),
        F.sum(F.expr("CAST(a_n AS DECIMAL(38,0)) * v_c * v_c")).alias(
            "sa2"
        ),
        F.sum(F.expr("CAST(b_n AS DECIMAL(38,0)) * v_c * v_c")).alias(
            "sb2"
        ),
    )
    staged = agg.selectExpr(
        "n_a",
        "n_b",
        "sa",
        "sb",
        "CAST(n_a AS DECIMAL(38,0)) * sa2"
        " - CAST(sa AS DECIMAL(38,0)) * sa AS v_a",
        "CAST(n_b AS DECIMAL(38,0)) * sb2"
        " - CAST(sb AS DECIMAL(38,0)) * sb AS v_b",
    )
    return staged.selectExpr(*_cohen_final("DIV"))


def _cohen_sql() -> str:
    final = ",\n       ".join(_cohen_final("//"))
    return f"""
WITH {_TWO_SAMPLE_HIST_SQL},
agg AS (
  SELECT CAST(SUM(a_n) AS BIGINT) AS n_a,
         CAST(SUM(b_n) AS BIGINT) AS n_b,
         CAST(SUM(a_n * v_c) AS BIGINT) AS sa,
         CAST(SUM(b_n * v_c) AS BIGINT) AS sb,
         SUM(CAST(a_n AS HUGEINT) * v_c * v_c) AS sa2,
         SUM(CAST(b_n AS HUGEINT) * v_c * v_c) AS sb2
  FROM byval
),
staged AS (
  SELECT n_a, n_b, sa, sb,
         CAST(n_a AS HUGEINT) * sa2
         - CAST(sa AS HUGEINT) * sa AS v_a,
         CAST(n_b AS HUGEINT) * sb2
         - CAST(sb AS HUGEINT) * sb AS v_b
  FROM agg
)
SELECT {final}
FROM staged
"""


REGISTRY["cohens_d_value"] = {
    "fn": cohens_d_value,
    "sql": _cohen_sql(),
}


# --------------------------------------------------------------------------
# Matthews correlation coefficient at the Youden-optimal threshold —
# the full binary confusion report complementing
# youden_threshold_value: at the same exactly-selected operating
# point, MCC = (TP·TN − FP·FN)/√((TP+FP)(TP+FN)(TN+FP)(TN+FN)).
# Confusion counts are exact integers off the histogram cums; one
# IEEE chain.
# --------------------------------------------------------------------------

_MCC_FINAL = [
    "threshold_cents",
    "tp",
    "fp",
    "tn",
    "fn",
    # NULLIF: an all-tied shard puts every row on one side of the only
    # threshold (tp = fp = 0; round-14 ties sweep) — MCC undefined, NULL
    "(CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)"
    " - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))"
    " / NULLIF(sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)"
    " * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 0.0) AS mcc",
]


def mcc_threshold_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # shared persisted two-sample cum frame (operators/pairhist.py)
    from de4ml_spark.operators.pairhist import two_sample_cums

    g = two_sample_cums(spark, sf_dir).selectExpr(
        "v_c",
        "nb_tot - cb AS tp",
        "na_tot - ca AS fp",
        "ca AS tn",
        "cb AS fn",
        "abs(ca * nb_tot - cb * na_tot) AS j_num",
    )
    best = g.agg(
        F.max(
            F.struct(
                F.col("j_num"),
                (-F.col("v_c")).alias("neg_v"),
                F.col("v_c").alias("threshold_cents"),
                F.col("tp"),
                F.col("fp"),
                F.col("tn"),
                F.col("fn"),
            )
        ).alias("s")
    ).filter(
        # empty-input parity with the oracle's LIMIT-1 shape (see
        # youden_threshold_value)
        F.col("s").isNotNull()
    ).selectExpr(
        "s.threshold_cents",
        "CAST(s.tp AS BIGINT) AS tp",
        "CAST(s.fp AS BIGINT) AS fp",
        "CAST(s.tn AS BIGINT) AS tn",
        "CAST(s.fn AS BIGINT) AS fn",
    )
    return best.selectExpr(*_MCC_FINAL)


def _mcc_sql() -> str:
    final = ",\n       ".join(_MCC_FINAL)
    return f"""
WITH {_TWO_SAMPLE_HIST_SQL},
cum AS (
  SELECT v_c, a_n, b_n,
         SUM(a_n) OVER w AS ca,
         SUM(b_n) OVER w AS cb
  FROM byval
  WINDOW w AS (ORDER BY v_c
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
totals AS (
  SELECT CAST(SUM(a_n) AS BIGINT) AS n_a,
         CAST(SUM(b_n) AS BIGINT) AS n_b
  FROM byval
),
best AS (
  SELECT v_c AS threshold_cents,
         CAST(n_b - cb AS BIGINT) AS tp,
         CAST(n_a - ca AS BIGINT) AS fp,
         CAST(ca AS BIGINT) AS tn,
         CAST(cb AS BIGINT) AS fn,
         ABS(ca * n_b - cb * n_a) AS j_num
  FROM cum CROSS JOIN totals
  ORDER BY j_num DESC, v_c ASC
  LIMIT 1
)
SELECT {final}
FROM best
"""


REGISTRY["mcc_threshold_value"] = {
    "fn": mcc_threshold_value,
    "sql": _mcc_sql(),
}
