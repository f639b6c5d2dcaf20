"""Round-12 statistics additions: stationarity / market-efficiency
diagnostics on the daily event series, DeLong AUC uncertainty, and
Krippendorff's alpha — the remaining standard members of the drift /
eval / agreement batteries the reference's dataops loop implies
(continuous re-profiling: dataops/app/profile.py:61-78; this repo's
batteries extend it per SURVEY §2.5-2.8).

Every entry follows the exactness tier (operators/portable_hash.py):
all data-dependent reductions are exact 128-bit integers on n-scaled
residuals or micro-quantized grids, and the only floating-point is a
single fixed IEEE tail both engines evaluate identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.operators.portable_hash import (
    wide_halfup_div_sql as _whd,
    wide_to_double_sql as _w2d,
)
from de4ml_spark.session import load_events_finite, load_table

REGISTRY: dict = {}


def _big(div: str) -> str:
    return "DECIMAL(38,0)" if div.upper() == "DIV" else "HUGEINT"


# --------------------------------------------------------------------------
# KPSS level-stationarity test of the daily event-count series — the
# standard complement to trend tests (Mann-Kendall et al. reject a
# trend; KPSS rejects STATIONARITY, the property every drift monitor
# upstream assumes). eta = T^-2 Σ_t S_t² / lrv with S_t the partial
# sums of demeaned counts and lrv the Bartlett long-run variance at
# lag window L = 7 (the newey_west_daily numerator, reused verbatim).
#
# Exactness: with integer n-scaled residuals e_t = n·y_t − Σy the
# partial sums S'_t = Σ_{i≤t} e_i, their square-sum, and the HAC
# numerator (L+1)C₀ + 2Σ(L+1−k)C_k are all exact 128-bit integers; the
# scale factors cancel to eta = [ΣS'²·(L+1)] / [T · nw_num] — ONE
# division of two wide_to_double conversions. Bound: ΣS'² ≤ T·(T·Σy)²
# needs < 1e38, true for any event log below ~3e16 rows (beyond 100 TB).
# Scale: one map-side-combined groupBy to the calendar-bounded day
# spine; the cum window and k ≤ 7 lag explode run over days, never rows.
# --------------------------------------------------------------------------

KPSS_LAGS = 7


def _kpss_final(div: str) -> list[str]:
    big = _big(div)
    num = f"CAST(sum_s2 AS {big}) * {KPSS_LAGS + 1}"
    den = f"CAST(n_days AS {big}) * nw_num"
    return [
        "n_days",
        f"{_w2d(num, div)} / NULLIF({_w2d(den, div)}, 0.0)"
        " AS kpss_stat",
    ]


def kpss_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.cache import release_after

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y")).persist()
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    e = daily.crossJoin(F.broadcast(tot)).selectExpr(
        "t", "n", "CAST(n AS DECIMAL(38,0)) * y - s AS e"
    )
    # partial-sum square sum over the day spine (calendar-bounded
    # single-partition window — the documented exactness-tier frame)
    wcum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    s2 = (
        e.withColumn("sc", F.sum("e").over(wcum))
        .agg(
            F.sum(F.expr("sc * sc")).alias("sum_s2"),
            F.max("n").alias("n_days"),
        )
    )
    # Bartlett/HAC numerator — newey_west_daily's exact lag machinery
    lags = e.selectExpr(
        "t",
        "e AS e_lag",
        f"explode(sequence(0, {KPSS_LAGS})) AS k",
    ).selectExpr("t + k AS t", "k", "e_lag")
    prod = e.join(lags, "t").groupBy("k").agg(
        F.sum(F.expr("e * e_lag")).alias("ck")
    )
    nw = prod.agg(
        F.sum(
            F.expr(
                f"CASE WHEN k = 0 THEN CAST({KPSS_LAGS + 1} AS"
                " DECIMAL(38,0)) * ck"
                f" ELSE 2 * CAST({KPSS_LAGS + 1} - k AS DECIMAL(38,0))"
                " * ck END"
            )
        ).alias("nw_num")
    )
    out = s2.crossJoin(F.broadcast(nw)).selectExpr(
        *_kpss_final("DIV")
    )
    return release_after(out, daily)


def _kpss_sql() -> str:
    final = ",\n       ".join(_kpss_final("//"))
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
cums AS (
  SELECT n, SUM(e) OVER (ORDER BY t
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sc
  FROM e
),
s2 AS (
  SELECT SUM(sc * sc) AS sum_s2, MAX(n) AS n_days FROM cums
),
lags AS (
  SELECT t + k AS t, k, e AS e_lag
  FROM e CROSS JOIN (
    SELECT unnest(range(0, {KPSS_LAGS + 1})) AS k
  )
),
prod AS (
  SELECT k, SUM(e.e * l.e_lag) AS ck
  FROM e JOIN lags l USING (t)
  GROUP BY 1
),
nw AS (
  SELECT SUM(CASE WHEN k = 0 THEN CAST({KPSS_LAGS + 1} AS HUGEINT) * ck
         ELSE 2 * CAST({KPSS_LAGS + 1} - k AS HUGEINT) * ck END)
           AS nw_num
  FROM prod
)
SELECT {final}
FROM s2 CROSS JOIN nw
"""


REGISTRY["kpss_daily_events"] = {
    "fn": kpss_daily_events,
    "sql": _kpss_sql(),
}


# --------------------------------------------------------------------------
# Lo-MacKinlay variance-ratio test (q = 5) on the daily event-count
# series: VR(q) = Var(y_t − y_{t−q}) / (q · Var(y_t − y_{t−1})). A
# random walk gives VR = 1; mean reversion < 1; momentum/drift > 1 —
# the standard "is this series integrating or oscillating" diagnostic
# a forecasting pipeline runs before choosing differencing order.
#
# Exactness: both difference populations are exact integers off
# day-index equi-joins (t vs t−1 / t−q on the observed spine); each
# variance uses n-scaled residuals z = n·d − Σd, so
# VR = (Σz_q² · n1³) / (q · n_q³ · Σz1²) is a ratio of exact 128-bit
# integers — one IEEE division. The asymptotic null variance
# phi = 2(2q−1)(q−1)/(3q·n_q) and z-statistic are a fixed constant
# chain. Scale: calendar-bounded spine joins, nothing row-sized.
# --------------------------------------------------------------------------

VR_Q = 5


def _vr_final(div: str) -> list[str]:
    big = _big(div)
    num = f"CAST(sum_zq2 AS {big}) * n1 * n1 * n1"
    den = f"CAST(sum_z12 AS {big}) * {VR_Q} * nq * nq * nq"
    vr = f"({_w2d(num, div)} / {_w2d(den, div)})"
    phi = (
        f"(CAST({2 * (2 * VR_Q - 1) * (VR_Q - 1)} AS DOUBLE)"
        f" / CAST({3 * VR_Q} * nq AS DOUBLE))"
    )
    return [
        "n1",
        "nq",
        f"{vr} AS variance_ratio",
        f"({vr} - 1.0) / SQRT({phi}) AS z_vr",
    ]


def _diff_moments(daily: DataFrame, lag: int, pfx: str) -> DataFrame:
    a, b = daily.alias("a"), daily.alias("b")
    d = a.join(
        b, F.col("a.t") == F.col("b.t") + F.lit(lag)
    ).selectExpr("a.y - b.y AS d")
    tot = d.agg(
        F.count(F.lit(1)).cast("bigint").alias(f"{pfx}_n"),
        F.sum("d").cast("bigint").alias(f"{pfx}_s"),
    )
    return (
        d.crossJoin(F.broadcast(tot))
        .selectExpr(
            f"{pfx}_n",
            f"CAST({pfx}_n AS DECIMAL(38,0)) * d - {pfx}_s AS z",
        )
        .groupBy(f"{pfx}_n")
        .agg(F.sum(F.expr("z * z")).alias(f"{pfx}_zz"))
    )


def variance_ratio_daily_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.cache import release_after

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y")).persist()
    m1 = _diff_moments(daily, 1, "d1")
    mq = _diff_moments(daily, VR_Q, "dq")
    out = (
        m1.crossJoin(F.broadcast(mq))
        .selectExpr(
            "d1_n AS n1",
            "dq_n AS nq",
            "d1_zz AS sum_z12",
            "dq_zz AS sum_zq2",
        )
        .selectExpr(*_vr_final("DIV"))
    )
    return release_after(out, daily)


def _vr_sql() -> str:
    final = ",\n       ".join(_vr_final("//"))

    def diff(lag: int, pfx: str) -> str:
        return f"""
{pfx}_d AS (
  SELECT a.y - b.y AS d
  FROM daily a JOIN daily b ON a.t = b.t + {lag}
),
{pfx}_t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS {pfx}_n,
         CAST(SUM(d) AS BIGINT) AS {pfx}_s
  FROM {pfx}_d
),
{pfx}_m AS (
  SELECT {pfx}_n, SUM(z * z) AS {pfx}_zz FROM (
    SELECT {pfx}_n,
           CAST({pfx}_n AS HUGEINT) * d - {pfx}_s AS z
    FROM {pfx}_d CROSS JOIN {pfx}_t
  ) GROUP BY 1
)"""

    return f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),{diff(1, "d1")},{diff(VR_Q, "dq")},
j AS (
  SELECT d1_n AS n1, dq_n AS nq, d1_zz AS sum_z12, dq_zz AS sum_zq2
  FROM d1_m CROSS JOIN dq_m
)
SELECT {final}
FROM j
"""


REGISTRY["variance_ratio_daily_events"] = {
    "fn": variance_ratio_daily_events,
    "sql": _vr_sql(),
}


# --------------------------------------------------------------------------
# DeLong variance of the ROC-AUC (value scoring event_type='purchase',
# the auc_roc_events frame) — the standard AUC confidence machinery:
# Var(AUC) = S10/n_pos + S01/n_neg with S10/S01 the sample variances of
# the positive/negative structural components V10/V01. On the cents
# histogram V10(v) = (#neg<v + q_v/2)/n_neg is a per-VALUE quantity, so
# the whole computation stays histogram-bounded (never per-row).
#
# Exactness: doubled components u10 = 2(cum_q − q) + q and
# u01 = 2(n_pos − cum_p) + p are exact ints; deviations are n-scaled
# (n_pos·u10 − u2, exact 128-bit, where u2 is the shared doubled-U) and
# requantized SIGNED-HALF-UP to the 1e-6 grid of (V10 − AUC) before
# squaring — raw squares would pass 1e38 beyond ~sf10 (the
# participation-ratio lesson); the quantized square-sums are exact
# int64-grid integers both engines agree on, and the variance tail is
# one fixed IEEE chain. se = sqrt, z vs the 0.5 null rides along.
# --------------------------------------------------------------------------


def _signed_whd(num: str, den: str, div: str) -> str:
    pos = _whd(num, den, div)
    neg = _whd(f"-({num})", den, div)
    return (
        f"CASE WHEN ({num}) >= 0 THEN CAST({pos} AS BIGINT)"
        f" ELSE -CAST({neg} AS BIGINT) END"
    )


def _delong_terms(div: str) -> list[str]:
    big = _big(div)
    w10 = f"CAST(n_pos AS {big}) * u10 * 1000000 - u2 * 1000000"
    w01 = f"CAST(n_neg AS {big}) * u01 * 1000000 - u2 * 1000000"
    den10 = "2 * n_pos * n_neg"
    return [
        "p",
        "q",
        "n_pos",
        "n_neg",
        "u2",
        f"{_signed_whd(w10, den10, div)} AS d10_u",
        f"{_signed_whd(w01, den10, div)} AS d01_u",
    ]


def _delong_final(div: str) -> list[str]:
    big = _big(div)
    # NULLIF degenerate guards: one-class samples (n_pos or n_neg =
    # 0) and single-member classes (the n-1 variance terms) -> NULL
    auc = (
        f"({_w2d('u2', div)} / NULLIF(2.0 * CAST(n_pos AS DOUBLE)"
        " * CAST(n_neg AS DOUBLE), 0.0))"
    )
    var = (
        f"({_w2d(f'CAST(s10 AS {big})', div)}"
        " / NULLIF(CAST(n_pos - 1 AS DOUBLE) * 1000000000000.0"
        " * CAST(n_pos AS DOUBLE), 0.0)"
        f" + {_w2d(f'CAST(s01 AS {big})', div)}"
        " / NULLIF(CAST(n_neg - 1 AS DOUBLE) * 1000000000000.0"
        " * CAST(n_neg AS DOUBLE), 0.0))"
    )
    return [
        "n_pos",
        "n_neg",
        f"{auc} AS auc",
        f"SQRT({var}) AS se_auc",
        f"({auc} - 0.5) / NULLIF(SQRT({var}), 0.0) AS z_null_half",
    ]


def delong_auc_variance_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.cache import release_after

    ev = load_table(spark, sf_dir, "events")
    hist = (
        load_events_finite(spark, sf_dir)
        .filter(F.col("event_type").isNotNull())
        .groupBy(
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v_c")
        )
        .agg(
            F.sum(
                F.expr("CAST(event_type = 'purchase' AS BIGINT)")
            ).alias("p"),
            F.sum(
                F.expr("CAST(event_type <> 'purchase' AS BIGINT)")
            ).alias("q"),
        )
        .persist()
    )
    wcum = Window.orderBy("v_c").rowsBetween(
        Window.unboundedPreceding, 0
    )
    comp = hist.select(
        "v_c",
        "p",
        "q",
        (2 * (F.sum("q").over(wcum) - F.col("q")) + F.col("q")).alias(
            "u10"
        ),
        F.sum("p").over(wcum).alias("cum_p"),
    )
    # u2 (the shared doubled-U) comes off the SAME cum frame
    totals = comp.agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum("q").cast("bigint").alias("n_neg"),
        F.sum(F.expr("CAST(p AS DECIMAL(38,0)) * u10")).alias("u2"),
    )
    terms = (
        comp.crossJoin(F.broadcast(totals))
        .selectExpr(
            "p",
            "q",
            "n_pos",
            "n_neg",
            "u2",
            "u10",
            "2 * (n_pos - cum_p) + p AS u01",
        )
        .selectExpr(*_delong_terms("DIV"))
    )
    agg = terms.groupBy("n_pos", "n_neg", "u2").agg(
        F.sum(
            F.expr("p * CAST(d10_u AS DECIMAL(38,0)) * d10_u")
        ).alias("s10"),
        F.sum(
            F.expr("q * CAST(d01_u AS DECIMAL(38,0)) * d01_u")
        ).alias("s01"),
    )
    out = agg.selectExpr(*_delong_final("DIV"))
    return release_after(out, hist)


def _delong_sql() -> str:
    terms = ",\n         ".join(_delong_terms("//"))
    final = ",\n       ".join(_delong_final("//"))
    return f"""
WITH hist AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS p,
         CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS q
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
),
comp AS (
  SELECT v_c, p, q,
         2 * (SUM(q) OVER w - q) + q AS u10,
         SUM(p) OVER w AS cum_p
  FROM hist
  WINDOW w AS (ORDER BY v_c
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
totals AS (
  SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
         CAST(SUM(q) AS BIGINT) AS n_neg,
         SUM(CAST(p AS HUGEINT) * u10) AS u2
  FROM comp
),
terms AS (
  SELECT {terms}
  FROM (
    SELECT p, q, n_pos, n_neg, u2, u10,
           2 * (n_pos - cum_p) + p AS u01
    FROM comp CROSS JOIN totals
  )
),
agg AS (
  SELECT n_pos, n_neg, u2,
         SUM(p * CAST(d10_u AS HUGEINT) * d10_u) AS s10,
         SUM(q * CAST(d01_u AS HUGEINT) * d01_u) AS s01
  FROM terms
  GROUP BY 1, 2, 3
)
SELECT {final}
FROM agg
"""


REGISTRY["delong_auc_variance_events"] = {
    "fn": delong_auc_variance_events,
    "sql": _delong_sql(),
}


# --------------------------------------------------------------------------
# Krippendorff's alpha (nominal, two raters, no missing) between the
# same deterministic document-quality annotators as cohens_kappa_docs
# (rule A: n_chars >= 300; rule B: >= 50 whitespace tokens).
# Kappa corrects chance per-RATER-marginal; alpha pools both raters'
# values into one coincidence distribution — the measure reported when
# annotators are interchangeable (label-rule audits, crowdsourcing).
# alpha = 1 − D_o/D_e = 1 − [O/n] / [2·n1·n0 / (N(N−1))], N = 2n —
# an exact integer rational (one 128-bit ratio, one IEEE tail).
# Scale: map-only flags + one 4-cell aggregate, like kappa.
# --------------------------------------------------------------------------


def _kripp_final(div: str) -> list[str]:
    big = _big(div)
    num = (
        f"CAST(n_units - agree AS {big}) * (2 * n_units)"
        " * (2 * n_units - 1)"
    )
    den = (
        f"2 * CAST(n_units AS {big}) * (a1 + b1)"
        " * (2 * n_units - a1 - b1)"
    )
    return [
        "n_units",
        "n_units - agree AS disagree",
        f"1.0 - {_w2d(num, div)} / NULLIF({_w2d(den, div)}, 0.0)"
        " AS kripp_alpha",
    ]


def krippendorff_alpha_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # CASE ... ELSE 0: NULL-field docs fail each rule on both engines
    # (round-14 nulldocs parity sweep; see cohens_kappa_docs)
    flags = docs.selectExpr(
        "CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ra",
        "CASE WHEN size(split(text, ' ')) >= 50 THEN 1 ELSE 0 END AS rb",
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum(F.expr("CAST(ra = rb AS BIGINT)"))
        .cast("bigint")
        .alias("agree"),
        F.sum("ra").cast("bigint").alias("a1"),
        F.sum("rb").cast("bigint").alias("b1"),
    )
    return agg.selectExpr(*_kripp_final("DIV"))


def _kripp_sql() -> str:
    final = ",\n       ".join(_kripp_final("//"))
    return f"""
WITH flags AS (
  SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ra,
         CASE WHEN len(string_split(text, ' ')) >= 50 THEN 1 ELSE 0 END
           AS rb
  FROM documents
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
         CAST(SUM(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT)
           AS agree,
         CAST(SUM(ra) AS BIGINT) AS a1,
         CAST(SUM(rb) AS BIGINT) AS b1
  FROM flags
)
SELECT {final}
FROM agg
"""


REGISTRY["krippendorff_alpha_docs"] = {
    "fn": krippendorff_alpha_docs,
    "sql": _kripp_sql(),
}


# --------------------------------------------------------------------------
# Dickey-Fuller unit-root test (constant, no lag augmentation) on the
# daily event-count series — KPSS's complementary null: DF's H0 is
# "unit root" (non-stationary), KPSS's H0 is "stationary"; pipelines
# report the pair and difference the series only when both agree it
# integrates. Regression Δy_t = α + ρ·y_{t−1}: with n-scaled demeaned
# moments Sxx' = ΣX², Sxy' = ΣXD, Syy' = ΣD² (exact 128-bit integers
# off the t/t−1 day-index equi-join), the common n³ scale cancels and
#   ρ̂ = Sxy'/Sxx',   t_DF = Sxy'·√(n−2) / √(Sxx'·Syy' − Sxy'²).
# The cross products would need 256 bits, so each primed moment goes
# through ONE exact wide_to_double conversion and the tail is a fixed
# IEEE chain — bit-identical both engines, no overflow at any scale.
# Scale: calendar-bounded spine join, like the rest of the daily tier.
# --------------------------------------------------------------------------


def _adf_final(div: str) -> list[str]:
    sxx = _w2d("sxx", div)
    sxy = _w2d("sxy", div)
    syy = _w2d("syy", div)
    return [
        "n_pairs",
        f"{sxy} / {sxx} AS rho_hat",
        f"{sxy} * SQRT(CAST(n_pairs - 2 AS DOUBLE))"
        f" / SQRT({sxx} * {syy} - {sxy} * {sxy}) AS adf_t",
    ]


def adf_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.cache import release_after

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y")).persist()
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b, F.col("a.t") == F.col("b.t") + F.lit(1)
    ).selectExpr("b.y AS x", "a.y - b.y AS d")
    tot = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("d").cast("bigint").alias("sd"),
    )
    z = pairs.crossJoin(F.broadcast(tot)).selectExpr(
        "n_pairs",
        "CAST(n_pairs AS DECIMAL(38,0)) * x - sx AS zx",
        "CAST(n_pairs AS DECIMAL(38,0)) * d - sd AS zd",
    )
    agg = z.groupBy("n_pairs").agg(
        F.sum(F.expr("zx * zx")).alias("sxx"),
        F.sum(F.expr("zx * zd")).alias("sxy"),
        F.sum(F.expr("zd * zd")).alias("syy"),
    )
    return release_after(agg.selectExpr(*_adf_final("DIV")), daily)


def _adf_sql() -> str:
    final = ",\n       ".join(_adf_final("//"))
    return f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
pairs AS (
  SELECT b.y AS x, a.y - b.y AS d
  FROM daily a JOIN daily b ON a.t = b.t + 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(d) AS BIGINT) AS sd
  FROM pairs
),
agg AS (
  SELECT n_pairs,
         SUM(zx * zx) AS sxx,
         SUM(zx * zd) AS sxy,
         SUM(zd * zd) AS syy
  FROM (
    SELECT n_pairs,
           CAST(n_pairs AS HUGEINT) * x - sx AS zx,
           CAST(n_pairs AS HUGEINT) * d - sd AS zd
    FROM pairs CROSS JOIN tot
  )
  GROUP BY 1
)
SELECT {final}
FROM agg
"""


REGISTRY["adf_daily_events"] = {
    "fn": adf_daily_events,
    "sql": _adf_sql(),
}


# --------------------------------------------------------------------------
# Rousseeuw-Croux Qn robust scale estimator of `value`: the k-th order
# statistic (k = C(h,2), h = n/2+1) of all pairwise distances
# |x_i − x_j|, i<j — 50% breakdown point and 82% Gaussian efficiency
# (vs MAD's 37%), the scale a drift monitor should alarm on when the
# distribution has heavy tails. The O(n²) pair definition collapses on
# the cents histogram: same-value pairs contribute c(c−1)/2 at
# distance 0, cross-value cells c_a·c_b at distance v_b−v_a — a
# |support|² bounded cell join (the hoeffding_d frame), never row
# pairs. The selection is an exact integer cum-threshold argmin; the
# asymptotic consistency constant 2.21914 is one fixed IEEE multiply.
# --------------------------------------------------------------------------

_QN_CONST = "2.21914"  # asymptotic Gaussian consistency factor


def _qn_final() -> list[str]:
    return [
        "n_values",
        "k_pairs",
        "qn_raw_cents",
        f"{_QN_CONST} * (CAST(qn_raw_cents AS DOUBLE) / 100.0)"
        " AS qn_scale",
    ]


def qn_scale_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.cache import release_after

    ev = load_table(spark, sf_dir, "events")
    hist = (
        load_events_finite(spark, sf_dir)
        .groupBy(
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .persist()
    )
    tot = hist.agg(
        F.sum("c").cast("bigint").alias("n_values"),
    ).selectExpr(
        "n_values",
        "((n_values DIV 2 + 1) * (n_values DIV 2))"
        " DIV 2 AS k_pairs",
    )
    zero = hist.selectExpr(
        "CAST(0 AS BIGINT) AS d", "c * (c - 1) DIV 2 AS cnt"
    )
    a, b = hist.alias("a"), hist.alias("b")
    cross = (
        a.join(b, F.col("a.v") < F.col("b.v"))
        .selectExpr("b.v - a.v AS d", "a.c * b.c AS cnt")
    )
    byd = (
        zero.unionAll(cross)
        .groupBy("d")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    wcum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = byd.withColumn("cum", F.sum("cnt").over(wcum))
    out = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("cum") >= F.col("k_pairs"))
        .groupBy("n_values", "k_pairs")
        .agg(F.min("d").cast("bigint").alias("qn_raw_cents"))
        .selectExpr(*_qn_final())
    )
    return release_after(out, hist)


def _qn_sql() -> str:
    final = ",\n       ".join(_qn_final())
    return f"""
WITH hist AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
tot AS (
  SELECT n_values,
         ((n_values // 2 + 1) * (n_values // 2)) // 2 AS k_pairs
  FROM (SELECT CAST(SUM(c) AS BIGINT) AS n_values FROM hist)
),
byd AS (
  SELECT d, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
    SELECT CAST(0 AS BIGINT) AS d, c * (c - 1) // 2 AS cnt FROM hist
    UNION ALL
    SELECT b.v - a.v AS d, a.c * b.c AS cnt
    FROM hist a JOIN hist b ON a.v < b.v
  ) GROUP BY 1
),
cum AS (
  SELECT d, SUM(cnt) OVER (ORDER BY d
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM byd
),
sel AS (
  SELECT n_values, k_pairs,
         CAST(MIN(d) AS BIGINT) AS qn_raw_cents
  FROM cum CROSS JOIN tot
  WHERE cum >= k_pairs
  GROUP BY 1, 2
)
SELECT {final}
FROM sel
"""


REGISTRY["qn_scale_value"] = {
    "fn": qn_scale_value,
    "sql": _qn_sql(),
}


# --------------------------------------------------------------------------
# CUPED variance reduction on per-user value (pre-period covariate
# adjustment — the standard experiment-sensitivity technique): split
# the corpus at the midpoint day; x_u = user's pre-period value sum,
# y_u = post-period sum (0 when absent — every observed user is a
# unit). theta = Cov(x,y)/Var(x) is the adjustment coefficient and
# 1 − rho² the achievable variance reduction. All three moments are
# exact 128-bit square/cross sums of n-scaled integer cents residuals;
# theta and rho² are fixed IEEE tails of wide_to_double conversions.
# Scale: one groupBy to per-user (x, y) pairs (map-side partial), one
# 3-sum aggregate — nothing beyond the user dimension.
# --------------------------------------------------------------------------


def _cuped_final(div: str) -> list[str]:
    sxx = _w2d("sxx", div)
    sxy = _w2d("sxy", div)
    syy = _w2d("syy", div)
    # NULLIF degenerate guards: a constant covariate or metric
    # (sxx/syy = 0 at n = 1) yields NULL, not DIVIDE_BY_ZERO
    rho2 = f"(({sxy} * {sxy}) / NULLIF({sxx} * {syy}, 0.0))"
    return [
        "n_users",
        f"{sxy} / NULLIF({sxx}, 0.0) AS theta",
        f"{rho2} AS rho_sq",
        f"1.0 - {rho2} AS var_reduction_factor",
    ]


def cuped_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.cache import release_after

    ev = load_events_finite(spark, sf_dir).filter(
        F.col("user_id").isNotNull()
    )
    days = ev.agg(
        F.expr(
            "MIN(CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT))"
        ).alias("t0"),
        F.expr(
            "MAX(CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT))"
        ).alias("t1"),
    ).selectExpr("(t0 + t1) DIV 2 AS mid")
    per_user = (
        ev.crossJoin(F.broadcast(days))
        .selectExpr(
            "user_id",
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " AS v_c",
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT) <= mid AS is_pre",
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CASE WHEN is_pre THEN v_c ELSE 0 END"))
            .cast("bigint")
            .alias("x"),
            F.sum(F.expr("CASE WHEN is_pre THEN 0 ELSE v_c END"))
            .cast("bigint")
            .alias("y"),
        )
        .persist()
    )
    tot = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    agg = (
        per_user.crossJoin(F.broadcast(tot))
        .selectExpr(
            "n_users",
            "CAST(n_users AS DECIMAL(38,0)) * x - sx AS zx",
            "CAST(n_users AS DECIMAL(38,0)) * y - sy AS zy",
        )
        .groupBy("n_users")
        .agg(
            F.sum(F.expr("zx * zx")).alias("sxx"),
            F.sum(F.expr("zx * zy")).alias("sxy"),
            F.sum(F.expr("zy * zy")).alias("syy"),
        )
    )
    return release_after(
        agg.selectExpr(*_cuped_final("DIV")), per_user
    )


def _cuped_sql() -> str:
    final = ",\n       ".join(_cuped_final("//"))
    return f"""
WITH ev AS (
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS t
  FROM events
  WHERE value IS NOT NULL AND user_id IS NOT NULL
),
days AS (
  SELECT (MIN(t) + MAX(t)) // 2 AS mid FROM ev
),
per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN t <= mid THEN v_c ELSE 0 END) AS BIGINT)
           AS x,
         CAST(SUM(CASE WHEN t <= mid THEN 0 ELSE v_c END) AS BIGINT)
           AS y
  FROM ev CROSS JOIN days
  GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy
  FROM per_user
),
agg AS (
  SELECT n_users,
         SUM(zx * zx) AS sxx,
         SUM(zx * zy) AS sxy,
         SUM(zy * zy) AS syy
  FROM (
    SELECT n_users,
           CAST(n_users AS HUGEINT) * x - sx AS zx,
           CAST(n_users AS HUGEINT) * y - sy AS zy
    FROM per_user CROSS JOIN tot
  )
  GROUP BY 1
)
SELECT {final}
FROM agg
"""


REGISTRY["cuped_user_value"] = {
    "fn": cuped_user_value,
    "sql": _cuped_sql(),
}


# --------------------------------------------------------------------------
# Hill tail-index estimator on `value` (k = 100 upper order
# statistics): alpha = k / Σ_{i<=k} ln(x_(i) / x_(k+1)) — the standard
# heavy-tail diagnostic (alpha <~ 2 means infinite variance: winsorize
# before averaging; complements power_law_alpha's degree-domain MLE).
# On the cents histogram the top-k sum collapses to Σ_{v > t} c_v ·
# ln(v/t) with t the (k+1)-th largest value off a descending cum
# window (values tied WITH t contribute ln 1 = 0, exactly the
# order-statistic definition under ties). Each ln(v/t) is the portable
# integer-rational ln (bit-identical both engines), micro-quantized
# and integer-summed; alpha is one IEEE division. Scale: histogram
# cum window + a <=k-cell tail frame.
# --------------------------------------------------------------------------

HILL_K = 100


def hill_tail_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.cache import release_after
    from de4ml_spark.operators.portable_hash import with_portable_ln

    ev = load_table(spark, sf_dir, "events")
    hist = (
        load_events_finite(spark, sf_dir).filter(F.col("value") > 0)
        .groupBy(
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .persist()
    )
    wdesc = Window.orderBy(F.desc("v")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    thr = (
        hist.withColumn("ct", F.sum("c").over(wdesc))
        .filter(F.col("ct") >= HILL_K + 1)
        .agg(F.max("v").cast("bigint").alias("t"))
    )
    n = hist.agg(F.sum("c").cast("bigint").alias("n_values"))
    top = (
        hist.crossJoin(F.broadcast(thr))
        .filter(F.col("v") > F.col("t"))
    )
    lned = with_portable_ln(top, "v", "t", "__ln")
    agg = lned.selectExpr(
        "t",
        "c * CAST(floor(__ln * 1000000.0 + 0.5) AS BIGINT) AS lnu",
    ).groupBy("t").agg(
        F.sum("lnu").cast("bigint").alias("sum_lnu")
    )
    # Degenerate tails (fewer than HILL_K+1 positive values, or every
    # top-k item tied with t) leave `top` — and therefore `agg` —
    # EMPTY. Emit one row with NULL hill_alpha instead of zero rows,
    # so "undefined alpha" is distinguishable from "query never ran"
    # (ADVICE r12): left-join agg onto the always-one-row n CTE.
    out = (
        n.join(F.broadcast(agg), F.lit(True), "left")
        .selectExpr(
            "n_values",
            f"CAST({HILL_K} AS BIGINT) AS k_top",
            "t AS tail_threshold_cents",
            f"CASE WHEN sum_lnu IS NULL OR sum_lnu = 0 THEN NULL"
            f" ELSE CAST({HILL_K} * 1000000 AS DOUBLE)"
            " / CAST(sum_lnu AS DOUBLE) END AS hill_alpha",
        )
    )
    return release_after(out, hist)


def _hill_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
    )

    ln_ctes = portable_ln_duck_ctes(
        "top", "v, c, t", "v", "t", "__ln", "lnh"
    )
    return f"""
WITH hist AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE value IS NOT NULL AND value > 0
  GROUP BY 1
),
thr AS (
  SELECT CAST(MAX(v) AS BIGINT) AS t FROM (
    SELECT v, SUM(c) OVER (ORDER BY v DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct
    FROM hist
  ) WHERE ct >= {HILL_K + 1}
),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_values FROM hist),
top AS (
  SELECT v, c, t FROM hist CROSS JOIN thr WHERE v > t
),
{ln_ctes},
agg AS (
  SELECT t,
         CAST(SUM(c * CAST(floor(__ln * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS sum_lnu
  FROM lnh_out GROUP BY 1
)
SELECT n_values,
       CAST({HILL_K} AS BIGINT) AS k_top,
       t AS tail_threshold_cents,
       CASE WHEN sum_lnu IS NULL OR sum_lnu = 0 THEN NULL
            ELSE CAST({HILL_K} * 1000000 AS DOUBLE)
                 / CAST(sum_lnu AS DOUBLE) END AS hill_alpha
FROM n LEFT JOIN agg ON TRUE
"""


REGISTRY["hill_tail_value"] = {
    "fn": hill_tail_value,
    "sql": _hill_sql(),
}


# --------------------------------------------------------------------------
# Yuen's trimmed-mean t-test (click vs purchase `value`, 20% trim) —
# the robust-location member completing the two-sample battery:
# Welch's t on trimmed means with winsorized variances, the
# recommended test when tails are heavy enough that means mislead but
# a pure rank test throws away effect size. Everything reduces on the
# per-type cents histogram: kept-mass per cell by positional overlap
# (the trimmed_mean_value_types arithmetic), winsorization bounds
# lo = x_(g+1) / hi = x_(n−g) by conditional-min over the cum window,
# winsorized moments as exact integers (sw = st + g·lo + g·hi,
# sw2 likewise with squares), and
#   d_s = (n·sw2 − sw²) / (n·h·(h−1)),  t = (mt_a − mt_b)/√(d_a+d_b)
# with Welch-Satterthwaite df — a fixed IEEE tail over exact 128-bit
# integers. Scale: one histogram shuffle, windows partitioned by type.
# --------------------------------------------------------------------------

YUEN_TRIM_PCT = 5  # g = n DIV 5 (20% per tail)


def _yuen_stats(div: str) -> list[str]:
    """Per-sample exact moments -> (mt, d, h) as shared SQL text."""
    big = _big(div)
    sw = f"(st + g * lo + g * hi)"
    sw2 = (
        f"(skc2 + CAST(g AS {big}) * lo * lo"
        f" + CAST(g AS {big}) * hi * hi)"
    )
    var_num = f"(CAST(n AS {big}) * {sw2} - CAST({sw} AS {big}) * {sw})"
    return [
        "event_type",
        "n",
        "h",
        f"CAST(st AS DOUBLE) / CAST(h AS DOUBLE) AS mt",
        # NULLIF: h = 1 (one untrimmed value in a tiny shard) zeroes
        # the h-1 factor — ANSI DIVIDE_BY_ZERO on Spark; the Winsorized
        # variance is undefined there, NULL on both engines (round-14
        # small-sample parity sweep)
        f"{_w2d(var_num, div)}"
        " / NULLIF(CAST(n AS DOUBLE) * CAST(h AS DOUBLE)"
        " * CAST(h - 1 AS DOUBLE), 0.0) AS d",
    ]


_YUEN_FINAL = [
    "n_a",
    "n_b",
    "h_a",
    "h_b",
    "mt_a - mt_b AS trimmed_mean_diff",
    # NULLIF guards: zero pooled variance (constant trimmed samples)
    # and h = 1 sides degrade t/df to NULL identically on both engines
    "(mt_a - mt_b) / NULLIF(SQRT(d_a + d_b), 0.0) AS yuen_t",
    "((d_a + d_b) * (d_a + d_b))"
    " / NULLIF(d_a * d_a / NULLIF(CAST(h_a - 1 AS DOUBLE), 0.0)"
    " + d_b * d_b / NULLIF(CAST(h_b - 1 AS DOUBLE), 0.0), 0.0)"
    " AS yuen_df",
]


def yuen_trimmed_ttest_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.cache import release_after

    ev = load_table(spark, sf_dir, "events")
    hist = (
        load_events_finite(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            "event_type",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .persist()
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    g = (
        hist.withColumn("cum", F.sum("c").over(wcum))
        .withColumn("n", F.sum("c").over(wall).cast("bigint"))
        .selectExpr(
            "event_type",
            "v",
            "c",
            "cum",
            "n",
            f"n DIV {YUEN_TRIM_PCT} AS g",
        )
    )
    per = g.selectExpr(
        "event_type",
        "n",
        "g",
        "n - 2 * g AS h",
        "GREATEST(CAST(0 AS BIGINT),"
        " LEAST(cum, n - g) - GREATEST(cum - c + 1, g + 1) + 1)"
        " AS kc",
        "CASE WHEN cum >= g + 1 THEN v END AS lo_cand",
        "CASE WHEN cum >= n - g THEN v END AS hi_cand",
        "v",
    ).groupBy("event_type", "n", "g", "h").agg(
        F.sum(F.expr("kc * v")).cast("bigint").alias("st"),
        F.sum(
            F.expr("CAST(kc AS DECIMAL(38,0)) * v * v")
        ).alias("skc2_mid"),
        F.min("lo_cand").cast("bigint").alias("lo"),
        F.min("hi_cand").cast("bigint").alias("hi"),
    ).selectExpr(
        "event_type", "n", "g", "h", "st", "lo", "hi",
        "skc2_mid AS skc2",
    )
    stats = per.selectExpr(*_yuen_stats("DIV"))
    one = stats.groupBy().agg(
        F.max(
            F.expr("CASE WHEN event_type = 'click' THEN n END")
        ).alias("n_a"),
        F.max(
            F.expr("CASE WHEN event_type = 'purchase' THEN n END")
        ).alias("n_b"),
        F.max(
            F.expr("CASE WHEN event_type = 'click' THEN h END")
        ).alias("h_a"),
        F.max(
            F.expr("CASE WHEN event_type = 'purchase' THEN h END")
        ).alias("h_b"),
        F.max(
            F.expr("CASE WHEN event_type = 'click' THEN mt END")
        ).alias("mt_a"),
        F.max(
            F.expr("CASE WHEN event_type = 'purchase' THEN mt END")
        ).alias("mt_b"),
        F.max(
            F.expr("CASE WHEN event_type = 'click' THEN d END")
        ).alias("d_a"),
        F.max(
            F.expr("CASE WHEN event_type = 'purchase' THEN d END")
        ).alias("d_b"),
    )
    return release_after(one.selectExpr(*_YUEN_FINAL), hist)


def _yuen_sql() -> str:
    stats = ",\n         ".join(_yuen_stats("//"))
    final = ",\n       ".join(_YUEN_FINAL)
    return f"""
WITH hist AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
  GROUP BY 1, 2
),
g AS (
  SELECT event_type, v, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT)
           // {YUEN_TRIM_PCT} AS g
  FROM hist
),
per AS (
  SELECT event_type, n, g, n - 2 * g AS h,
         CAST(SUM(GREATEST(CAST(0 AS BIGINT),
           LEAST(cum, n - g) - GREATEST(cum - c + 1, g + 1) + 1) * v)
           AS BIGINT) AS st,
         SUM(CAST(GREATEST(CAST(0 AS BIGINT),
           LEAST(cum, n - g) - GREATEST(cum - c + 1, g + 1) + 1)
           AS HUGEINT) * v * v) AS skc2,
         CAST(MIN(CASE WHEN cum >= g + 1 THEN v END) AS BIGINT) AS lo,
         CAST(MIN(CASE WHEN cum >= n - g THEN v END) AS BIGINT) AS hi
  FROM g
  GROUP BY 1, 2, 3, 4
),
stats AS (
  SELECT {stats}
  FROM per
),
one AS (
  SELECT MAX(CASE WHEN event_type = 'click' THEN n END) AS n_a,
         MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n_b,
         MAX(CASE WHEN event_type = 'click' THEN h END) AS h_a,
         MAX(CASE WHEN event_type = 'purchase' THEN h END) AS h_b,
         MAX(CASE WHEN event_type = 'click' THEN mt END) AS mt_a,
         MAX(CASE WHEN event_type = 'purchase' THEN mt END) AS mt_b,
         MAX(CASE WHEN event_type = 'click' THEN d END) AS d_a,
         MAX(CASE WHEN event_type = 'purchase' THEN d END) AS d_b
  FROM stats
)
SELECT {final}
FROM one
"""


REGISTRY["yuen_trimmed_ttest_value"] = {
    "fn": yuen_trimmed_ttest_value,
    "sql": _yuen_sql(),
}


# --------------------------------------------------------------------------
# Greenwood variance for the Kaplan-Meier retention curve — the CI
# machinery kaplan_meier_retention (statq.py) publishes its point
# estimate without: Var(Ŝ_t)/Ŝ_t² = Σ_{j<=t} d_j/(n_j(n_j−d_j)), the
# standard-error ratio every survival plot's band comes from. Same
# user-span life-table model as the KM entry (churned = last event
# before the corpus horizon, daily intervals). Each step's hazard-
# variance term is an exact integer rational, half-up quantized on
# the 1e-12 grid (terms reach ~1/n² — micro would truncate them to
# zero) and integer-summed along the day spine; the SE ratio is one
# sqrt. Terminal steps (d = n) have undefined variance and are masked
# NULL, matching the KM entry's convention. Scale: one groupBy to the
# duration spine; the explode is per-user-day like the KM entry.
# --------------------------------------------------------------------------


def km_greenwood_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.cache import release_after

    ev = load_table(spark, sf_dir, "events")
    # spans feeds BOTH the horizon scalar and the per_user frame —
    # persist so the per-user min/max aggregation runs once, matching
    # the shared-frame pattern of the other round-12 entries
    # (ADVICE r12). Per-user sized, released after the job drains.
    spans = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("date")).alias("d0"),
            F.max(F.col("ts").cast("date")).alias("d1"),
        )
        .persist()
    )
    horizon = spans.agg(F.max("d1").alias("hmax"))
    per_user = spans.crossJoin(F.broadcast(horizon)).selectExpr(
        "datediff(d1, d0) AS dur",
        "datediff(hmax, d0) AS obs",
        "CAST(d1 < hmax AS INT) AS churned",
    )
    at_risk = (
        per_user.selectExpr(
            "churned",
            "dur",
            "explode(sequence(0, least(dur, obs))) AS t",
        )
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_risk"),
            F.expr(
                "CAST(SUM(CASE WHEN churned = 1 AND dur = t THEN 1"
                " ELSE 0 END) AS BIGINT)"
            ).alias("d_churn"),
        )
    )
    term = _whd(
        "CAST(d_churn AS DECIMAL(38,0)) * 1000000000000",
        "n_risk * GREATEST(n_risk - d_churn, 1)",
        "DIV",
    )
    steps = at_risk.selectExpr(
        "t",
        "n_risk",
        "d_churn",
        "CASE WHEN n_risk = d_churn THEN NULL"
        f" ELSE CAST({term} AS BIGINT) END AS term_p",
    )
    out = steps.selectExpr(
        "t",
        "n_risk",
        "d_churn",
        "CASE WHEN term_p IS NULL THEN NULL ELSE"
        " CAST(SUM(term_p) OVER (ORDER BY t ROWS BETWEEN"
        " UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) END"
        " AS cum_term_p",
    ).selectExpr(
        "t",
        "n_risk",
        "d_churn",
        "cum_term_p",
        "SQRT(CAST(cum_term_p AS DOUBLE) / 1000000000000.0)"
        " AS greenwood_se_ratio",
    )
    return release_after(out, spans)


def _km_greenwood_sql() -> str:
    term = _whd(
        "CAST(d_churn AS HUGEINT) * 1000000000000",
        "n_risk * GREATEST(n_risk - d_churn, 1)",
        "//",
    )
    return f"""
WITH spans AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0,
         MAX(CAST(ts AS DATE)) AS d1
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1
),
horizon AS (SELECT MAX(d1) AS hmax FROM spans),
per_user AS (
  SELECT datediff('day', d0, d1) AS dur,
         datediff('day', d0, h.hmax) AS obs,
         CAST(d1 < h.hmax AS INT) AS churned
  FROM spans CROSS JOIN horizon h
),
exploded AS (
  SELECT churned, dur,
         unnest(generate_series(0, least(dur, obs))) AS t
  FROM per_user
),
at_risk AS (
  SELECT t,
         CAST(COUNT(*) AS BIGINT) AS n_risk,
         CAST(SUM(CASE WHEN churned = 1 AND dur = t
                       THEN 1 ELSE 0 END) AS BIGINT) AS d_churn
  FROM exploded
  GROUP BY 1
),
steps AS (
  SELECT t, n_risk, d_churn,
         CASE WHEN n_risk = d_churn THEN NULL
         ELSE CAST({term} AS BIGINT) END AS term_p
  FROM at_risk
),
cums AS (
  SELECT t, n_risk, d_churn,
         CASE WHEN term_p IS NULL THEN NULL ELSE
         CAST(SUM(term_p) OVER (ORDER BY t ROWS BETWEEN
           UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) END
           AS cum_term_p
  FROM steps
)
SELECT t, n_risk, d_churn, cum_term_p,
       SQRT(CAST(cum_term_p AS DOUBLE) / 1000000000000.0)
         AS greenwood_se_ratio
FROM cums
"""


REGISTRY["km_greenwood_retention"] = {
    "fn": km_greenwood_retention,
    "sql": _km_greenwood_sql(),
}


# --------------------------------------------------------------------------
# Median-of-means estimator of `value` — the heavy-tail-safe mean a
# large-scale quality pipeline should report next to the plain mean
# (sub-Gaussian concentration under ANY finite-variance distribution;
# one adversarial shard cannot move it). k = 32 deterministic buckets
# by portable hash of event_id, bucket means as single IEEE divisions
# of exact integer sums, median of the 32 means by row_number
# selection over the bucket-bounded frame (even k -> average of the
# two middle means, one more IEEE op). Scale: one map-side-combined
# groupBy to 32 rows.
# --------------------------------------------------------------------------

MOM_K = 32


def median_of_means_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        md5_hex_sql,
        phash_from_hex_sql,
    )

    ev = load_table(spark, sf_dir, "events")
    # two-step digest projection: ONE md5 per row, then byte extracts
    # (the documented hot-path form; here the 0.11 s at sf0.1 is scan
    # parallelism, not hash fan-out — map-only, so it splits with the
    # input at scale)
    buckets = (
        load_events_finite(spark, sf_dir)
        .selectExpr(
            f"{md5_hex_sql('CAST(event_id AS STRING)')} AS __hx",
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " AS v_c",
        )
        .selectExpr(
            f"{phash_from_hex_sql('__hx', 40)} % {MOM_K} AS b",
            "v_c",
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_b"),
            F.sum("v_c").cast("bigint").alias("s_b"),
        )
        .selectExpr(
            "b",
            "n_b",
            "s_b",
            "CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b",
        )
    )
    w = Window.orderBy("mean_b", "b")
    ranked = buckets.withColumn("rk", F.row_number().over(w))
    tot = buckets.agg(
        F.sum("n_b").cast("bigint").alias("n_values"),
        F.sum("s_b").cast("bigint").alias("s_all"),
        F.count(F.lit(1)).cast("bigint").alias("k_buckets"),
    )
    mid = ranked.crossJoin(F.broadcast(tot)).filter(
        F.expr("rk = (k_buckets + 1) DIV 2")
        | F.expr("rk = (k_buckets + 2) DIV 2")
    )
    out = mid.groupBy("n_values", "s_all", "k_buckets").agg(
        F.sum("mean_b").alias("mid_sum"),
        F.count(F.lit(1)).alias("mid_n"),
    ).selectExpr(
        "n_values",
        "k_buckets",
        "mid_sum / CAST(mid_n AS DOUBLE) AS mom_cents",
        "CAST(s_all AS DOUBLE) / CAST(n_values AS DOUBLE)"
        " AS mean_cents",
    )
    return out


def _mom_sql() -> str:
    from de4ml_spark.operators.portable_hash import phash_duck_sql

    return f"""
WITH buckets AS (
  SELECT b, n_b, s_b,
         CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b
  FROM (
    SELECT {phash_duck_sql("CAST(event_id AS VARCHAR)", 40)}
             % {MOM_K} AS b,
           CAST(COUNT(*) AS BIGINT) AS n_b,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                AS BIGINT)) AS BIGINT) AS s_b
    FROM events WHERE value IS NOT NULL
    GROUP BY 1
  )
),
ranked AS (
  SELECT b, mean_b,
         ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rk
  FROM buckets
),
tot AS (
  SELECT CAST(SUM(n_b) AS BIGINT) AS n_values,
         CAST(SUM(s_b) AS BIGINT) AS s_all,
         CAST(COUNT(*) AS BIGINT) AS k_buckets
  FROM buckets
),
mid AS (
  SELECT n_values, s_all, k_buckets, mean_b
  FROM ranked CROSS JOIN tot
  WHERE rk = (k_buckets + 1) // 2 OR rk = (k_buckets + 2) // 2
)
SELECT n_values,
       k_buckets,
       SUM(mean_b) / CAST(COUNT(*) AS DOUBLE) AS mom_cents,
       CAST(s_all AS DOUBLE) / CAST(n_values AS DOUBLE)
         AS mean_cents
FROM mid
GROUP BY 1, 2, s_all
"""


REGISTRY["median_of_means_value"] = {
    "fn": median_of_means_value,
    "sql": _mom_sql(),
}


# --------------------------------------------------------------------------
# Siegel repeated-medians trend of the daily event-count series — the
# 50%-breakdown robust slope (Theil-Sen, already in the catalog as
# theil_sen_daily, breaks down at 29%): slope = median_i median_{j≠i}
# (y_i−y_j)/(t_i−t_j), intercept = median_i (y_i − slope·t_i). Every
# pairwise slope is ONE IEEE division of exact integers (bit-identical
# both engines), so medians are order statistics of identical doubles:
# inner medians by row_number selection within day (days² pair frame,
# calendar-bounded), outer median over the |days| medians, each
# even-count median averaging the two middle values. Scale: the pair
# explode is days² (~10⁵ rows for a year), never row-sized.
# --------------------------------------------------------------------------


def siegel_slope_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.cache import release_after

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y")).persist()
    a, b = daily.alias("a"), daily.alias("b")
    slopes = (
        a.join(b, F.col("a.t") != F.col("b.t"))
        .selectExpr(
            "a.t AS t_i",
            "b.t AS t_j",
            "CAST(a.y - b.y AS DOUBLE)"
            " / CAST(a.t - b.t AS DOUBLE) AS s",
        )
    )
    wi = Window.partitionBy("t_i").orderBy("s", "t_j")
    inner = (
        slopes.withColumn("rk", F.row_number().over(wi))
        .withColumn(
            "m", F.count(F.lit(1)).over(Window.partitionBy("t_i"))
        )
        .filter(
            F.expr("rk = (m + 1) DIV 2 OR rk = (m + 2) DIV 2")
        )
        .groupBy("t_i")
        .agg(
            (F.sum("s") / F.count(F.lit(1))).alias("med_i"),
            F.max("m").alias("m"),
        )
    )
    wo = Window.orderBy("med_i", "t_i")
    outer = (
        inner.withColumn("rk", F.row_number().over(wo))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy()))
        .filter(
            F.expr("rk = (n + 1) DIV 2 OR rk = (n + 2) DIV 2")
        )
        .agg(
            (F.sum("med_i") / F.count(F.lit(1))).alias("slope"),
            F.max("n").cast("bigint").alias("n_days"),
        )
    )
    resid = daily.crossJoin(F.broadcast(outer)).selectExpr(
        "n_days",
        "slope",
        "CAST(y AS DOUBLE) - slope * CAST(t AS DOUBLE) AS r",
        "t",
    )
    wr = Window.orderBy("r", "t")
    out = (
        resid.withColumn("rk", F.row_number().over(wr))
        .filter(
            F.expr("rk = (n_days + 1) DIV 2 OR rk = (n_days + 2) DIV 2")
        )
        .groupBy("n_days", "slope")
        .agg(
            (F.sum("r") / F.count(F.lit(1))).alias("intercept")
        )
        .selectExpr(
            "n_days",
            "slope AS siegel_slope",
            "intercept AS siegel_intercept",
        )
    )
    return release_after(out, daily)


def _siegel_sql() -> str:
    return """
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
slopes AS (
  SELECT a.t AS t_i, b.t AS t_j,
         CAST(a.y - b.y AS DOUBLE) / CAST(a.t - b.t AS DOUBLE) AS s
  FROM daily a JOIN daily b ON a.t <> b.t
),
inner_ranked AS (
  SELECT t_i, s,
         ROW_NUMBER() OVER (PARTITION BY t_i ORDER BY s, t_j) AS rk,
         COUNT(*) OVER (PARTITION BY t_i) AS m
  FROM slopes
),
inner_med AS (
  SELECT t_i, SUM(s) / CAST(COUNT(*) AS DOUBLE) AS med_i
  FROM inner_ranked
  WHERE rk = (m + 1) // 2 OR rk = (m + 2) // 2
  GROUP BY 1
),
outer_ranked AS (
  SELECT t_i, med_i,
         ROW_NUMBER() OVER (ORDER BY med_i, t_i) AS rk,
         COUNT(*) OVER () AS n
  FROM inner_med
),
outer_med AS (
  SELECT SUM(med_i) / CAST(COUNT(*) AS DOUBLE) AS slope,
         CAST(MAX(n) AS BIGINT) AS n_days
  FROM outer_ranked
  WHERE rk = (n + 1) // 2 OR rk = (n + 2) // 2
),
resid AS (
  SELECT n_days, slope,
         CAST(y AS DOUBLE) - slope * CAST(t AS DOUBLE) AS r,
         t,
         ROW_NUMBER() OVER (ORDER BY
           CAST(y AS DOUBLE) - slope * CAST(t AS DOUBLE), t) AS rk
  FROM daily CROSS JOIN outer_med
)
SELECT n_days,
       slope AS siegel_slope,
       SUM(r) / CAST(COUNT(*) AS DOUBLE) AS siegel_intercept
FROM resid
WHERE rk = (n_days + 1) // 2 OR rk = (n_days + 2) // 2
GROUP BY 1, 2
"""


REGISTRY["siegel_slope_daily"] = {
    "fn": siegel_slope_daily,
    "sql": _siegel_sql(),
}


# --------------------------------------------------------------------------
# Phillips-Perron unit-root test (Z_tau, constant, Bartlett L = 7) on
# the daily event-count series — completes the canonical unit-root
# trio with adf_daily_events and kpss_daily_events: PP keeps the plain
# DF regression but corrects the t-statistic nonparametrically for
# serial correlation (Hamilton 17.6.12):
#   Z_tau = sqrt(g0/l2)·t_rho − (l2 − g0)·T·se(rho) / (2·sqrt(l2)·s²)
# with g0 = (1/T)Σû², l2 the Bartlett long-run variance of û, and
# s² the OLS residual variance.
#
# Exactness: the regression moments are the ADF entry's exact n-scaled
# 128-bit integers; residuals need the estimated slope, so the
# n-scaled residual Û_t = zd_t − β̂·zx_t (one IEEE chain per row from
# exact ints and the engine-identical β̂) is SIGNED-half-up quantized
# to the 1e-6 grid before any sum — the autocovariance products and
# HAC numerator are then exact integers again (shuffle order can
# never reorder a float sum), and Z_tau is a fixed IEEE tail.
# Scale: calendar-bounded spine joins, k ≤ 7 lag explode over days.
# --------------------------------------------------------------------------

PP_LAGS = 7


def _pp_final(div: str) -> list[str]:
    big = _big(div)
    sxx = _w2d("sxx", div)
    sxy = _w2d("sxy", div)
    syy = _w2d("syy", div)
    # scale bookkeeping: zx/zd are n-scaled, Û_u additionally 1e6-
    # quantized; every ratio below clears the common scales exactly
    n3 = (
        "(CAST(n_pairs AS DOUBLE) * CAST(n_pairs AS DOUBLE)"
        " * CAST(n_pairs AS DOUBLE))"
    )
    g0 = f"({_w2d('uu0', div)} / ({n3} * 1000000000000.0))"
    l2 = (
        f"({_w2d('nw_num', div)}"
        f" / ({PP_LAGS + 1}.0 * {n3} * 1000000000000.0))"
    )
    t_df = (
        f"({sxy} * SQRT(CAST(n_pairs - 2 AS DOUBLE))"
        f" / SQRT({sxx} * {syy} - {sxy} * {sxy}))"
    )
    s2 = (
        f"({_w2d('uu0', div)} / (CAST(n_pairs AS DOUBLE)"
        " * CAST(n_pairs AS DOUBLE)"
        " * CAST(n_pairs - 2 AS DOUBLE) * 1000000000000.0))"
    )
    # se(rho)^2 = s^2 / Σ(x−x̄)^2; the n-scaled Sxx' = n^2·Σ(x−x̄)^2
    se_rho = (
        f"(SQRT({s2}) * CAST(n_pairs AS DOUBLE) / SQRT({sxx}))"
    )
    return [
        "n_pairs",
        f"{g0} AS gamma0",
        f"{l2} AS lambda2",
        f"{t_df} AS adf_t",
        f"SQRT({g0} / {l2}) * {t_df}"
        f" - ({l2} - {g0}) * CAST(n_pairs AS DOUBLE) * {se_rho}"
        f" / (2.0 * SQRT({l2}) * {s2}) AS pp_z_tau",
    ]


def phillips_perron_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.cache import release_after

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y")).persist()
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b, F.col("a.t") == F.col("b.t") + F.lit(1)
    ).selectExpr("a.t AS t", "b.y AS x", "a.y - b.y AS d").persist()
    tot = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("d").cast("bigint").alias("sd"),
    )
    z = pairs.crossJoin(F.broadcast(tot)).selectExpr(
        "t",
        "n_pairs",
        "CAST(n_pairs AS DECIMAL(38,0)) * x - sx AS zx",
        "CAST(n_pairs AS DECIMAL(38,0)) * d - sd AS zd",
    )
    mom = z.groupBy("n_pairs").agg(
        F.sum(F.expr("zx * zx")).alias("sxx"),
        F.sum(F.expr("zx * zd")).alias("sxy"),
        F.sum(F.expr("zd * zd")).alias("syy"),
    )
    beta = mom.selectExpr(
        "n_pairs",
        "sxx",
        "sxy",
        "syy",
        f"{_w2d('sxy', 'DIV')} / {_w2d('sxx', 'DIV')} AS beta",
    )
    u = z.crossJoin(
        F.broadcast(beta.select("beta"))
    ).selectExpr(
        "t",
        "CASE WHEN CAST(zd AS DOUBLE) - beta * CAST(zx AS DOUBLE)"
        " >= 0.0 THEN CAST(FLOOR((CAST(zd AS DOUBLE)"
        " - beta * CAST(zx AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
        " ELSE -CAST(FLOOR((beta * CAST(zx AS DOUBLE)"
        " - CAST(zd AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) END"
        " AS uu",
    )
    lags = u.selectExpr(
        "t",
        "uu AS uu_lag",
        f"explode(sequence(0, {PP_LAGS})) AS k",
    ).selectExpr("t + k AS t", "k", "uu_lag")
    prod = u.join(lags, "t").groupBy("k").agg(
        F.sum(
            F.expr("CAST(uu AS DECIMAL(38,0)) * uu_lag")
        ).alias("ck")
    )
    nw = prod.agg(
        F.sum(
            F.expr(
                f"CASE WHEN k = 0 THEN CAST({PP_LAGS + 1} AS"
                " DECIMAL(38,0)) * ck"
                f" ELSE 2 * CAST({PP_LAGS + 1} - k AS DECIMAL(38,0))"
                " * ck END"
            )
        ).alias("nw_num"),
        F.sum(F.expr("CASE WHEN k = 0 THEN ck END")).alias("uu0"),
    )
    out = beta.crossJoin(F.broadcast(nw)).selectExpr(
        *_pp_final("DIV")
    )
    return release_after(out, daily, pairs)


def _pp_sql() -> str:
    final = ",\n       ".join(_pp_final("//"))
    beta = f"{_w2d('sxy', '//')} / {_w2d('sxx', '//')}"
    return f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
pairs AS (
  SELECT a.t AS t, b.y AS x, a.y - b.y AS d
  FROM daily a JOIN daily b ON a.t = b.t + 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(d) AS BIGINT) AS sd
  FROM pairs
),
z AS (
  SELECT t, n_pairs,
         CAST(n_pairs AS HUGEINT) * x - sx AS zx,
         CAST(n_pairs AS HUGEINT) * d - sd AS zd
  FROM pairs CROSS JOIN tot
),
mom AS (
  SELECT n_pairs,
         SUM(zx * zx) AS sxx,
         SUM(zx * zd) AS sxy,
         SUM(zd * zd) AS syy
  FROM z GROUP BY 1
),
beta_t AS (
  SELECT n_pairs, sxx, sxy, syy, {beta} AS beta
  FROM mom
),
u AS (
  SELECT t,
         CASE WHEN CAST(zd AS DOUBLE) - beta * CAST(zx AS DOUBLE)
         >= 0.0 THEN CAST(FLOOR((CAST(zd AS DOUBLE)
         - beta * CAST(zx AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         ELSE -CAST(FLOOR((beta * CAST(zx AS DOUBLE)
         - CAST(zd AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) END
           AS uu
  FROM z CROSS JOIN (SELECT beta FROM beta_t)
),
lags AS (
  SELECT t + k AS t, k, uu AS uu_lag
  FROM u CROSS JOIN (
    SELECT unnest(range(0, {PP_LAGS + 1})) AS k
  )
),
prod AS (
  SELECT k, SUM(CAST(u.uu AS HUGEINT) * l.uu_lag) AS ck
  FROM u JOIN lags l USING (t)
  GROUP BY 1
),
nw AS (
  SELECT SUM(CASE WHEN k = 0 THEN CAST({PP_LAGS + 1} AS HUGEINT) * ck
         ELSE 2 * CAST({PP_LAGS + 1} - k AS HUGEINT) * ck END)
           AS nw_num,
         SUM(CASE WHEN k = 0 THEN ck END) AS uu0
  FROM prod
)
SELECT {final}
FROM beta_t CROSS JOIN nw
"""


REGISTRY["phillips_perron_daily"] = {
    "fn": phillips_perron_daily,
    "sql": _pp_sql(),
}


# --------------------------------------------------------------------------
# CUSUM-of-squares variance-stability test on the daily event-count
# series — the second-moment companion to pettitt/cusum_change (mean
# shifts): S_t = Σ_{i<=t} w_i / Σw with w_i the squared demeaned
# counts; the statistic is max_t |S_t − t/T|, spiking when volatility
# regime-shifts even if the mean holds. With n-scaled residuals the
# weights w'_i = (n·y_i − Σy)² are exact 128-bit integers, and the
# argmax compares |cum·T − t·total| — an exact integer — so the
# break-day selection is engine-deterministic before any float; the
# statistic is one wide-to-double ratio. Scale: day-spine cum window.
# --------------------------------------------------------------------------


def _cusumsq_final(div: str) -> list[str]:
    return [
        "n_days",
        "break_t",
        f"{_w2d('max_num', div)}"
        f" / NULLIF(CAST(n_days AS DOUBLE) * {_w2d('total_w', div)},"
        " 0.0) AS cusumsq_stat",
    ]


def cusum_squares_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.cache import defer_release

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y")).persist()
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    w = daily.crossJoin(F.broadcast(tot)).selectExpr(
        "t",
        "n",
        "(CAST(n AS DECIMAL(38,0)) * y - s)"
        " * (CAST(n AS DECIMAL(38,0)) * y - s) AS w",
    )
    wcum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wrank = Window.orderBy("t")
    cums = (
        w.withColumn("cw", F.sum("w").over(wcum))
        .withColumn("rk", F.row_number().over(wrank))
        .withColumn(
            "tw", F.sum("w").over(Window.partitionBy())
        )
    )
    dev = cums.selectExpr(
        "t",
        "n AS n_days",
        "tw AS total_w",
        "CASE WHEN cw * n >= CAST(rk AS DECIMAL(38,0)) * tw"
        " THEN cw * n - CAST(rk AS DECIMAL(38,0)) * tw"
        " ELSE CAST(rk AS DECIMAL(38,0)) * tw - cw * n END"
        " AS dev_num",
    )
    best = dev.groupBy("n_days", "total_w").agg(
        F.max(F.struct(F.col("dev_num"), (-F.col("t")).alias("neg_t")))
        .alias("s")
    ).selectExpr(
        "n_days",
        "total_w",
        "s.dev_num AS max_num",
        "-s.neg_t AS break_t",
    )
    # defer_release, NOT release_after: this entry twice (and alone,
    # out of 27 release_after sites) collected 0 rows from its eager
    # localCheckpoint deep into a long 16-thread parity session —
    # serial re-runs and 128 self-concurrent stress runs never
    # reproduce it. Skipping the checkpoint removes the block-read
    # path entirely; the 1-row result re-executes over the persisted
    # daily frame and the run loop unpersists it via drain_deferred.
    defer_release(daily)
    return best.selectExpr(*_cusumsq_final("DIV"))


def _cusumsq_sql() -> str:
    final = ",\n       ".join(_cusumsq_final("//"))
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
w AS (
  SELECT t, n,
         (CAST(n AS HUGEINT) * y - s)
         * (CAST(n AS HUGEINT) * y - s) AS w
  FROM daily CROSS JOIN tot
),
cums AS (
  SELECT t, n,
         SUM(w) OVER (ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         ROW_NUMBER() OVER (ORDER BY t) AS rk,
         SUM(w) OVER () AS tw
  FROM w
),
dev AS (
  SELECT t, n AS n_days, tw AS total_w,
         CASE WHEN cw * n >= CAST(rk AS HUGEINT) * tw
         THEN cw * n - CAST(rk AS HUGEINT) * tw
         ELSE CAST(rk AS HUGEINT) * tw - cw * n END AS dev_num
  FROM cums
),
best AS (
  SELECT n_days, total_w, dev_num AS max_num, t AS break_t
  FROM dev
  ORDER BY dev_num DESC, t ASC
  LIMIT 1
)
SELECT {final}
FROM best
"""


REGISTRY["cusum_squares_daily"] = {
    "fn": cusum_squares_daily,
    "sql": _cusumsq_sql(),
}


# --------------------------------------------------------------------------
# Engle's ARCH LM test (1 lag) on the daily event-count series —
# volatility clustering: regress the squared demeaned count on its
# lag; LM = m·R² is chi-square(1) under "no ARCH". Squared residuals
# are exact integers requantized by half-up n² division (keeping the
# second-level moment sums inside 128 bits at any corpus size), the
# R² moments are n-scaled exact integers over the t/t−1 day-index
# join, and LM is one IEEE tail. Complements cusum_squares_daily:
# that locates a variance BREAK, this detects variance MEMORY.
# --------------------------------------------------------------------------


def _arch_final(div: str) -> list[str]:
    sxx = _w2d("sxx", div)
    sxy = _w2d("sxy", div)
    syy = _w2d("syy", div)
    r2 = f"(({sxy} * {sxy}) / ({sxx} * {syy}))"
    return [
        "n_pairs",
        f"{r2} AS r2",
        f"CAST(n_pairs AS DOUBLE) * {r2} AS arch_lm",
    ]


def arch_lm_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.cache import release_after

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y")).persist()
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    sq = daily.crossJoin(F.broadcast(tot)).selectExpr(
        "t",
        # a_t = round(((n·y − s)/n)²) = half-up((n·y−s)², n²) — exact
        # integer u-hat-squared, bounded by y² not (n·y)²
        f"""CAST({_whd(
            '(CAST(n AS DECIMAL(38,0)) * y - s)'
            ' * (CAST(n AS DECIMAL(38,0)) * y - s)',
            'n * n', 'DIV')} AS BIGINT) AS a""",
    ).persist()
    x, yv = sq.alias("x"), sq.alias("y")
    pairs = yv.join(
        x, F.col("y.t") == F.col("x.t") + F.lit(1)
    ).selectExpr("x.a AS ax", "y.a AS ay")
    ptot = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("ax").cast("bigint").alias("sax"),
        F.sum("ay").cast("bigint").alias("say"),
    )
    z = pairs.crossJoin(F.broadcast(ptot)).selectExpr(
        "n_pairs",
        "CAST(n_pairs AS DECIMAL(38,0)) * ax - sax AS zx",
        "CAST(n_pairs AS DECIMAL(38,0)) * ay - say AS zy",
    )
    mom = z.groupBy("n_pairs").agg(
        F.sum(F.expr("zx * zx")).alias("sxx"),
        F.sum(F.expr("zx * zy")).alias("sxy"),
        F.sum(F.expr("zy * zy")).alias("syy"),
    )
    return release_after(
        mom.selectExpr(*_arch_final("DIV")), daily, sq
    )


def _arch_sql() -> str:
    final = ",\n       ".join(_arch_final("//"))
    a = _whd(
        "(CAST(n AS HUGEINT) * y - s) * (CAST(n AS HUGEINT) * y - s)",
        "n * n",
        "//",
    )
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
sq AS (
  SELECT t, CAST({a} AS BIGINT) AS a
  FROM daily CROSS JOIN tot
),
pairs AS (
  SELECT x.a AS ax, y.a AS ay
  FROM sq y JOIN sq x ON y.t = x.t + 1
),
ptot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(ax) AS BIGINT) AS sax,
         CAST(SUM(ay) AS BIGINT) AS say
  FROM pairs
),
z AS (
  SELECT n_pairs,
         CAST(n_pairs AS HUGEINT) * ax - sax AS zx,
         CAST(n_pairs AS HUGEINT) * ay - say AS zy
  FROM pairs CROSS JOIN ptot
),
mom AS (
  SELECT n_pairs,
         SUM(zx * zx) AS sxx,
         SUM(zx * zy) AS sxy,
         SUM(zy * zy) AS syy
  FROM z GROUP BY 1
)
SELECT {final}
FROM mom
"""


REGISTRY["arch_lm_daily"] = {
    "fn": arch_lm_daily,
    "sql": _arch_sql(),
}


# --------------------------------------------------------------------------
# Wasserstein-2 distance between click and purchase `value` — the
# quadratic-transport member completing the drift family (EMD/W1
# integrates |mass moved|; W2 punishes moving mass FAR, the right
# metric when tail excursions matter). Quantile-axis identity:
# W2² = ∫(Q_a(u) − Q_b(u))² du, with both inverse CDFs step functions
# whose breakpoints live on the common 1/(n_a·n_b) grid — so segment
# starts p = (cum−mass)·n_other are exact integers, segment values
# forward-fill over the ≤2·|support| merged breakpoint frame, and
# W2²·n_a·n_b = Σ (v_a − v_b)²·Δp is an exact 128-bit integer. The
# same segments yield Σ|v_a − v_b|·Δp, which must equal the
# value-axis EMD integer of emd_value_types EXACTLY (two independent
# formulations of W1 — pinned in tests). Scale: one histogram
# shuffle, bounded-domain windows.
# --------------------------------------------------------------------------


def _w2_final(div: str) -> list[str]:
    return [
        "n_a",
        "n_b",
        f"{_w2d('w1_num', div)} AS w1_scaled_d",
        f"SQRT({_w2d('w2_num', div)}"
        " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))"
        " AS w2_cents",
    ]


def wasserstein2_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.cache import release_after

    ev = load_table(spark, sf_dir, "events")
    hist = (
        load_events_finite(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v")
        )
        .agg(
            F.sum(
                F.expr("CAST(event_type = 'click' AS BIGINT)")
            ).cast("bigint").alias("a_n"),
            F.sum(
                F.expr("CAST(event_type = 'purchase' AS BIGINT)")
            ).cast("bigint").alias("b_n"),
        )
        .persist()
    )
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cums = (
        hist.withColumn("ca", F.sum("a_n").over(wcum))
        .withColumn("cb", F.sum("b_n").over(wcum))
        .withColumn(
            "na", F.sum("a_n").over(Window.partitionBy())
        )
        .withColumn(
            "nb", F.sum("b_n").over(Window.partitionBy())
        )
    )
    starts = cums.filter("a_n > 0").selectExpr(
        "(ca - a_n) * nb AS p", "v AS va", "CAST(NULL AS BIGINT) AS vb",
        "na", "nb",
    ).unionAll(
        cums.filter("b_n > 0").selectExpr(
            "(cb - b_n) * na AS p",
            "CAST(NULL AS BIGINT) AS va",
            "v AS vb",
            "na", "nb",
        )
    )
    perp = starts.groupBy("p", "na", "nb").agg(
        F.max("va").alias("va_s"), F.max("vb").alias("vb_s")
    )
    wp = Window.orderBy("p").rowsBetween(
        Window.unboundedPreceding, 0
    )
    filled = (
        perp.withColumn(
            "va", F.last("va_s", ignorenulls=True).over(wp)
        )
        .withColumn(
            "vb", F.last("vb_s", ignorenulls=True).over(wp)
        )
        .withColumn(
            "p_next", F.lead("p").over(Window.orderBy("p"))
        )
    )
    agg = filled.selectExpr(
        "na AS n_a",
        "nb AS n_b",
        "COALESCE(p_next, na * nb) - p AS dp",
        "va - vb AS dv",
    ).groupBy("n_a", "n_b").agg(
        F.sum(
            F.expr("CAST(abs(dv) AS DECIMAL(38,0)) * dp")
        ).alias("w1_num"),
        F.sum(
            F.expr("CAST(dv AS DECIMAL(38,0)) * dv * dp")
        ).alias("w2_num"),
    )
    return release_after(agg.selectExpr(*_w2_final("DIV")), hist)


def _w2_sql() -> str:
    final = ",\n       ".join(_w2_final("//"))
    return f"""
WITH hist AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS a_n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS b_n
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
  GROUP BY 1
),
cums AS (
  SELECT v, a_n, b_n,
         SUM(a_n) OVER w AS ca,
         SUM(b_n) OVER w AS cb,
         CAST(SUM(a_n) OVER () AS BIGINT) AS na,
         CAST(SUM(b_n) OVER () AS BIGINT) AS nb
  FROM hist
  WINDOW w AS (ORDER BY v
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
starts AS (
  SELECT (ca - a_n) * nb AS p, v AS va,
         CAST(NULL AS BIGINT) AS vb, na, nb
  FROM cums WHERE a_n > 0
  UNION ALL
  SELECT (cb - b_n) * na AS p, CAST(NULL AS BIGINT) AS va,
         v AS vb, na, nb
  FROM cums WHERE b_n > 0
),
perp AS (
  SELECT p, na, nb, MAX(va) AS va_s, MAX(vb) AS vb_s
  FROM starts GROUP BY 1, 2, 3
),
filled AS (
  SELECT p, na, nb,
         LAST_VALUE(va_s IGNORE NULLS) OVER wf AS va,
         LAST_VALUE(vb_s IGNORE NULLS) OVER wf AS vb,
         LEAD(p) OVER (ORDER BY p) AS p_next
  FROM perp
  WINDOW wf AS (ORDER BY p
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
agg AS (
  SELECT na AS n_a, nb AS n_b,
         SUM(CAST(ABS(va - vb) AS HUGEINT)
             * (COALESCE(p_next, na * nb) - p)) AS w1_num,
         SUM(CAST(va - vb AS HUGEINT) * (va - vb)
             * (COALESCE(p_next, na * nb) - p)) AS w2_num
  FROM filled
  GROUP BY 1, 2
)
SELECT {final}
FROM agg
"""


REGISTRY["wasserstein2_value"] = {
    "fn": wasserstein2_value,
    "sql": _w2_sql(),
}
