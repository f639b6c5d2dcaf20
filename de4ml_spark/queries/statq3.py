"""Statistical-testing tier III (round 9b): distribution-equality,
change-point, and digit-law diagnostics over the event log — the
remaining "did this batch come from the same process" monitors a
training-data QA pipeline runs between ingest and mixture curation:
Kolmogorov-Smirnov two-sample, Mood's k-sample median test, the
Pettitt change-point test, CUSUM / Buishand homogeneity, and the
Theil-Sen robust trend slope (Benford conformance already lives in
sketchq.benford_audit_totalprice).

Reference parity: the reference derives validation rules from
per-column profiles (dataops/app/profile.py) and alerts on windowed
drift (dataops/app/alerts.py); these entries are the test-statistic
layer those monitors consume.

Exactness discipline (operators/portable_hash.py): all mass moves
through integer histograms (value cents / daily counts); 128-bit
intermediates stay INTERNAL; every 128-bit → DOUBLE conversion uses
wide_to_double_sql; micro-quantized per-term integer sums replace any
cross-row DOUBLE summation (engine sum order differs); the
post-aggregate scalar chain is the SAME SQL text on both engines.
Result schemas stay on the driver-safe whitelist (BIGINT / DOUBLE /
STRING / DATE-as-string).

Scale posture (100 TB): the raw log is reduced by ONE groupBy to
either a value histogram (bounded by distinct cents values) or a
calendar-day series (bounded by the retention window — 30-365 rows at
ANY corpus scale); every window / pair join after that reduction runs
on the bounded frame, never the log.
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

_PICO = 1_000_000_000_000
_MICRO = 1_000_000


def _big(div: str) -> str:
    return "DECIMAL(38,0)" if div.upper() == "DIV" else "HUGEINT"


# --------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample test: click vs purchase on `value`.
# D = max_v |F_a(v) − F_b(v)| over the pooled value histogram; the
# numerator max_v |cumA·n_b − cumB·n_a| is an exact int64 (cum counts
# ≤ n, products ≤ n² < 2^63 up to n ~ 3e9 per class; the histogram
# groupBy upstream is what a 100 TB run shuffles, not the pairs).
# The asymptotic scaling sqrt(n_a·n_b/(n_a+n_b))·D is one IEEE chain.
# The cum window runs over the pooled VALUE HISTOGRAM (bounded by
# distinct cents values), not the raw log.
# --------------------------------------------------------------------------

_KS_FINAL = [
    "n_a",
    "n_b",
    "d_num",
    "CAST(d_num AS DOUBLE)"
    " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS ks_d",
    "(CAST(d_num AS DOUBLE)"
    " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))"
    " * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)"
    " / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) AS ks_scaled",
]


def ks_two_sample_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shared persisted two-sample cum frame (operators/pairhist.py)
    from de4ml_spark.operators.pairhist import two_sample_cums

    dmax = (
        two_sample_cums(spark, sf_dir)
        .selectExpr(
            "na_tot AS n_a",
            "nb_tot AS n_b",
            "abs(ca * nb_tot - cb * na_tot) AS dn",
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("dn").cast("bigint").alias("d_num"))
    )
    return dmax.selectExpr(*_KS_FINAL)


def _ks_sql() -> str:
    final = ",\n       ".join(_KS_FINAL)
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
dmax AS (
  SELECT n_a, n_b,
         CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_num
  FROM cum CROSS JOIN totals
  GROUP BY 1, 2
)
SELECT {final}
FROM dmax
"""


REGISTRY["ks_two_sample_value"] = {
    "fn": ks_two_sample_value,
    "sql": _ks_sql(),
}


# --------------------------------------------------------------------------
# Mood's k-sample median test on `value` across event types: counts
# above vs not-above the grand median per type (ties lump BELOW, the
# scipy ties='below' convention, documented), then the chi-square of
# the 2×k table via the same pico-quantized identity as
# cramers_v_events: chi²/N = Σ o²/(r·c) − 1, every o²·PICO/(r·c) an
# exact half-up 128-bit quotient. The grand median comes from one cum
# window over the value histogram; everything after is k-bounded.
# --------------------------------------------------------------------------


def _mood_term(div: str) -> str:
    big = _big(div)
    o2p = f"CAST(o AS {big}) * o * {_PICO}"
    step1 = _whd(o2p, "r_i", div)
    return _whd(step1, "c_j", div)


_MOOD_FINAL = [
    "k_types",
    "n_tot",
    "grand_median_c",
    "{PHI2} * CAST(n_tot AS DOUBLE) AS chi2_mood",
]


def mood_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = (
        load_events_finite(spark, sf_dir)
        .filter(F.col("event_type").isNotNull())
        .selectExpr(
            "event_type",
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c",
        )
    )
    hist = base.groupBy("v_c").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wcum = (
        Window.partitionBy(F.lit(1))
        .orderBy("v_c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = hist.agg(F.sum("cnt").cast("bigint").alias("n_tot"))
    med = (
        hist.withColumn("cum", F.sum("cnt").over(wcum))
        .crossJoin(F.broadcast(tot))
        .filter("2 * cum >= n_tot")
        .agg(F.min("v_c").cast("bigint").alias("grand_median_c"))
    )
    cells = (
        base.crossJoin(F.broadcast(med))
        .selectExpr(
            "event_type",
            "CAST(v_c > grand_median_c AS BIGINT) AS above",
            "grand_median_c",
        )
        .groupBy("event_type", "above", "grand_median_c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    rows = cells.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("r_i")
    )
    cols = cells.groupBy("above").agg(
        F.sum("o").cast("bigint").alias("c_j")
    )
    j = cells.join(F.broadcast(rows), "event_type").join(
        F.broadcast(cols), "above"
    )
    terms = j.selectExpr(
        "grand_median_c", f"{_mood_term('DIV')} AS term_p"
    )
    dims = cells.agg(
        F.countDistinct("event_type").cast("bigint").alias("k_types"),
        F.sum("o").cast("bigint").alias("n_tot"),
    )
    summed = (
        terms.groupBy("grand_median_c")
        .agg(F.sum("term_p").alias("sum_p"))
        .crossJoin(F.broadcast(dims))
    )
    phi2 = f"({_w2d(f'sum_p - {_PICO}', 'DIV')} / {float(_PICO)!r})"
    return summed.selectExpr(
        *[e.replace("{PHI2}", phi2) for e in _MOOD_FINAL]
    )


def _mood_sql() -> str:
    phi2 = f"({_w2d(f'sum_p - {_PICO}', '//')} / {float(_PICO)!r})"
    final = ",\n       ".join(
        e.replace("{PHI2}", phi2) for e in _MOOD_FINAL
    )
    return f"""
WITH base AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
),
hist AS (
  SELECT v_c, CAST(COUNT(*) AS BIGINT) AS cnt FROM base GROUP BY 1
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_tot FROM hist),
med AS (
  SELECT CAST(MIN(v_c) AS BIGINT) AS grand_median_c
  FROM (
    SELECT v_c,
           SUM(cnt) OVER (ORDER BY v_c
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM hist
  ) CROSS JOIN tot
  WHERE 2 * cum >= n_tot
),
cells AS (
  SELECT event_type,
         CASE WHEN v_c > grand_median_c THEN 1 ELSE 0 END AS above,
         grand_median_c,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM base CROSS JOIN med
  GROUP BY 1, 2, 3
),
rws AS (
  SELECT event_type, CAST(SUM(o) AS BIGINT) AS r_i FROM cells GROUP BY 1
),
cls AS (
  SELECT above, CAST(SUM(o) AS BIGINT) AS c_j FROM cells GROUP BY 1
),
j AS (
  SELECT c.grand_median_c, c.o, r.r_i, l.c_j
  FROM cells c JOIN rws r USING (event_type) JOIN cls l USING (above)
),
terms AS (
  SELECT grand_median_c, {_mood_term("//")} AS term_p FROM j
),
dims AS (
  SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k_types,
         CAST(SUM(o) AS BIGINT) AS n_tot
  FROM cells
),
summed AS (
  SELECT grand_median_c, SUM(term_p) AS sum_p FROM terms GROUP BY 1
)
SELECT {final}
FROM summed CROSS JOIN dims
"""


REGISTRY["mood_median_value"] = {
    "fn": mood_median_value,
    "sql": _mood_sql(),
}




# --------------------------------------------------------------------------
# Pettitt change-point test on the daily event-count series — the
# rank-based "did the traffic level shift, and when" monitor (pairs
# with mann_kendall: that detects monotone TREND, this locates a step
# CHANGE). Doubled midranks r2ᵢ = 2·#below + #ties + 1 come from the
# days² broadcast pair join (calendar-bounded at any corpus scale);
# U_t = Σ_{i≤t} r2ᵢ − t(n+1) is exact int64; K = max_{t<n} |U_t| with
# the EARLIEST argmax day reported. pettitt_lambda = 6K²/(n³+n²) is
# the exponent of the asymptotic p-value (p ≈ 2e^{−λ}; exp is left to
# the consumer — no portable exp primitive, documented).
# --------------------------------------------------------------------------

_PETTITT_FINAL = [
    "n_days",
    "k_pettitt",
    "t_star",
    "change_day",
    "6.0 * CAST(k_pettitt AS DOUBLE) * CAST(k_pettitt AS DOUBLE)"
    " / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)"
    " * CAST(n_days AS DOUBLE)"
    " + CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE))"
    " AS pettitt_lambda",
]


def pettitt_change_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    a = daily.selectExpr("day AS da", "c AS ca")
    b = daily.selectExpr("day AS db", "c AS cb")
    # doubled midrank per day: 2·#below + #ties(incl self) over ALL days
    r2 = (
        a.crossJoin(F.broadcast(b))
        .groupBy("da", "ca")
        .agg(
            F.sum(
                F.expr("2 * CAST(cb < ca AS BIGINT)"
                       " + CAST(cb = ca AS BIGINT)")
            )
            .cast("bigint")
            .alias("r2m1")
        )
        .selectExpr("da AS day", "r2m1 + 1 AS r2")
    )
    # prefix sums + day index via a second days² join (i.day <= t.day)
    i = r2.selectExpr("day AS di", "r2 AS r2i")
    u = (
        r2.alias("t")
        .crossJoin(F.broadcast(i))
        .filter(F.expr("di <= t.day"))
        .groupBy(F.col("t.day").alias("day"))
        .agg(
            F.sum("r2i").cast("bigint").alias("s2_t"),
            F.count(F.lit(1)).cast("bigint").alias("t_idx"),
        )
    )
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    ut = (
        u.crossJoin(F.broadcast(n))
        .filter("t_idx < n_days")
        .selectExpr(
            "n_days",
            "day",
            "t_idx",
            "abs(s2_t - t_idx * (n_days + 1)) AS abs_u",
        )
    )
    k = ut.groupBy("n_days").agg(
        F.max("abs_u").cast("bigint").alias("k_pettitt")
    )
    best = (
        ut.join(F.broadcast(k), "n_days")
        .filter("abs_u = k_pettitt")
        .groupBy("n_days", "k_pettitt")
        .agg(
            F.min("t_idx").cast("bigint").alias("t_star"),
            F.expr("CAST(MIN(day) AS STRING)").alias("change_day"),
        )
    )
    return best.selectExpr(*_PETTITT_FINAL)


def _pettitt_sql() -> str:
    final = ",\n       ".join(_PETTITT_FINAL)
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
r2 AS (
  SELECT a.day,
         CAST(SUM(2 * CASE WHEN b.c < a.c THEN 1 ELSE 0 END
                  + CASE WHEN b.c = a.c THEN 1 ELSE 0 END)
              AS BIGINT) + 1 AS r2
  FROM daily a CROSS JOIN daily b
  GROUP BY 1
),
u AS (
  SELECT t.day, CAST(SUM(i.r2) AS BIGINT) AS s2_t,
         CAST(COUNT(*) AS BIGINT) AS t_idx
  FROM r2 t JOIN r2 i ON i.day <= t.day
  GROUP BY 1
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
ut AS (
  SELECT n_days, day, t_idx,
         ABS(s2_t - t_idx * (n_days + 1)) AS abs_u
  FROM u CROSS JOIN n
  WHERE t_idx < n_days
),
k AS (
  SELECT n_days, CAST(MAX(abs_u) AS BIGINT) AS k_pettitt
  FROM ut GROUP BY 1
)
SELECT {final}
FROM (
  SELECT ut.n_days, k_pettitt,
         CAST(MIN(t_idx) AS BIGINT) AS t_star,
         CAST(MIN(day) AS VARCHAR) AS change_day
  FROM ut JOIN k ON ut.n_days = k.n_days AND abs_u = k_pettitt
  GROUP BY 1, 2
)
"""


REGISTRY["pettitt_change_daily"] = {
    "fn": pettitt_change_daily,
    "sql": _pettitt_sql(),
}


# --------------------------------------------------------------------------
# CUSUM / Buishand homogeneity on the daily series: partial sums of
# deviations from the grand mean, carried EXACTLY as n·S_t = n·cum_t −
# t·ΣC (int64 — counts ≤ 2^31 per day and days ≤ 365 keep n·cum well
# inside range even at 100 TB); Buishand's Q = max|S_t|/s and
# R = (max S_t − min S_t)/s, both rescaled by √n (the tabulated form).
# s from the exact moment pair (n·Σc² − S² wide). The prefix sums ride
# the same days² broadcast join as pettitt.
# --------------------------------------------------------------------------


def _buishand_final(div: str) -> list[str]:
    big = _big(div)
    varnum = f"CAST(n_days AS {big}) * ssq - CAST(s_tot AS {big}) * s_tot"
    # NULLIF degenerate guards: n = 1 (no dof) or a constant series
    # (zero sd) yield NULL, not DIVIDE_BY_ZERO
    s_std = (
        f"NULLIF(sqrt({_w2d(varnum, div)}"
        " / NULLIF(CAST(n_days AS DOUBLE)"
        " * CAST(n_days - 1 AS DOUBLE), 0.0)), 0.0)"
    )
    return [
        "n_days",
        "max_ns",
        "min_ns",
        f"(CAST(max_abs_ns AS DOUBLE) / CAST(n_days AS DOUBLE))"
        f" / ({s_std}) / sqrt(CAST(n_days AS DOUBLE))"
        " AS q_over_sqrt_n",
        f"(CAST(max_ns - min_ns AS DOUBLE) / CAST(n_days AS DOUBLE))"
        f" / ({s_std}) / sqrt(CAST(n_days AS DOUBLE))"
        " AS r_over_sqrt_n",
    ]


def cusum_change_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    i = daily.selectExpr("day AS di", "c AS ci")
    cum = (
        daily.alias("t")
        .crossJoin(F.broadcast(i))
        .filter(F.expr("di <= t.day"))
        .groupBy(F.col("t.day").alias("day"))
        .agg(
            F.sum("ci").cast("bigint").alias("cum_t"),
            F.count(F.lit(1)).cast("bigint").alias("t_idx"),
        )
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("c").cast("bigint").alias("s_tot"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("ssq"),
    )
    ns = cum.crossJoin(F.broadcast(tot)).selectExpr(
        "n_days",
        "s_tot",
        "ssq",
        "n_days * cum_t - t_idx * s_tot AS ns_t",
    )
    agg = ns.groupBy("n_days", "s_tot", "ssq").agg(
        F.max("ns_t").cast("bigint").alias("max_ns"),
        F.min("ns_t").cast("bigint").alias("min_ns"),
        F.max(F.expr("abs(ns_t)")).cast("bigint").alias("max_abs_ns"),
    )
    return agg.selectExpr(*_buishand_final("DIV"))


def _cusum_sql() -> str:
    final = ",\n       ".join(_buishand_final("//"))
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
cum AS (
  SELECT t.day, CAST(SUM(i.c) AS BIGINT) AS cum_t,
         CAST(COUNT(*) AS BIGINT) AS t_idx
  FROM daily t JOIN daily i ON i.day <= t.day
  GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(c) AS BIGINT) AS s_tot,
         SUM(CAST(c AS HUGEINT) * c) AS ssq
  FROM daily
),
ns AS (
  SELECT n_days, s_tot, ssq,
         n_days * cum_t - t_idx * s_tot AS ns_t
  FROM cum CROSS JOIN tot
)
SELECT {final}
FROM (
  SELECT n_days, s_tot, ssq,
         CAST(MAX(ns_t) AS BIGINT) AS max_ns,
         CAST(MIN(ns_t) AS BIGINT) AS min_ns,
         CAST(MAX(ABS(ns_t)) AS BIGINT) AS max_abs_ns
  FROM ns GROUP BY 1, 2, 3
)
"""


REGISTRY["cusum_change_daily"] = {
    "fn": cusum_change_daily,
    "sql": _cusum_sql(),
}


# --------------------------------------------------------------------------
# Theil-Sen robust trend slope of the daily series (the ESTIMATE that
# pairs with mann_kendall's trend TEST): median over all day-pair
# slopes (c_j−c_i)/(t_j−t_i), t = calendar index (gaps handled).
# Each slope is half-up-quantized to integer micro-units — pure int64,
# signed via round-half-away-from-zero (documented) — and the median
# of the ≤ days²/2 quantized slopes is the standard lower/upper-middle
# average, assembled with the cum-vs-half pair join (no global sort).
# --------------------------------------------------------------------------

_SEN_FINAL = [
    "n_pairs",
    "m1_u",
    "m2_u",
    "(CAST(m1_u AS DOUBLE) + CAST(m2_u AS DOUBLE))"
    " / 2000000.0 AS sen_slope_per_day",
]


def theil_sen_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    mind = daily.agg(F.min("day").alias("day0"))
    idx = daily.crossJoin(F.broadcast(mind)).selectExpr(
        "CAST(datediff(day, day0) AS BIGINT) AS t", "c"
    )
    a = idx.selectExpr("t AS ti", "c AS ci")
    b = idx.selectExpr("t AS tj", "c AS cj")
    slopes = (
        a.crossJoin(F.broadcast(b))
        .filter("ti < tj")
        .selectExpr(
            # signed half-up in micro-units: round half away from zero.
            # divisor guarded (ANSI): codegen can evaluate this in the
            # same stage as the ti<tj join condition, on unfiltered rows
            "CAST(CASE WHEN cj >= ci"
            " THEN (2 * (cj - ci) * 1000000 + (tj - ti))"
            " DIV (2 * CASE WHEN tj > ti THEN tj - ti ELSE 1 END)"
            " ELSE -((2 * (ci - cj) * 1000000 + (tj - ti))"
            " DIV (2 * CASE WHEN tj > ti THEN tj - ti ELSE 1 END))"
            " END AS BIGINT) AS s_u"
        )
    )
    hist = slopes.groupBy("s_u").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = hist.agg(F.sum("cnt").cast("bigint").alias("n_pairs"))
    i2 = hist.selectExpr("s_u AS su2", "cnt AS cnt2")
    cum = (
        hist.crossJoin(F.broadcast(i2))
        .filter("su2 <= s_u")
        .groupBy("s_u")
        .agg(F.sum("cnt2").cast("bigint").alias("cum"))
        .crossJoin(F.broadcast(tot))
    )
    m1 = cum.filter("2 * cum >= n_pairs").groupBy("n_pairs").agg(
        F.min("s_u").cast("bigint").alias("m1_u")
    )
    m2 = cum.filter("2 * cum >= n_pairs + 2").groupBy("n_pairs").agg(
        F.min("s_u").cast("bigint").alias("m2_u")
    )
    # odd n_pairs: both medians coincide at the middle element
    j = m1.join(m2, "n_pairs", "left").selectExpr(
        "n_pairs",
        "m1_u",
        "CASE WHEN n_pairs % 2 = 1 THEN m1_u"
        " ELSE COALESCE(m2_u, m1_u) END AS m2_u",
    )
    return j.selectExpr(*_SEN_FINAL)


def _sen_sql() -> str:
    final = ",\n       ".join(_SEN_FINAL)
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
idx AS (
  SELECT CAST(date_diff('day', (SELECT MIN(day) FROM daily), day)
              AS BIGINT) AS t, c
  FROM daily
),
slopes AS (
  SELECT CAST(CASE WHEN b.c >= a.c
           THEN (2 * (b.c - a.c) * 1000000 + (b.t - a.t))
                // (2 * CASE WHEN b.t > a.t THEN b.t - a.t ELSE 1 END)
           ELSE -((2 * (a.c - b.c) * 1000000 + (b.t - a.t))
                // (2 * CASE WHEN b.t > a.t THEN b.t - a.t ELSE 1 END))
           END AS BIGINT) AS s_u
  FROM idx a JOIN idx b ON a.t < b.t
),
hist AS (
  SELECT s_u, CAST(COUNT(*) AS BIGINT) AS cnt FROM slopes GROUP BY 1
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_pairs FROM hist),
cum AS (
  SELECT h.s_u, CAST(SUM(i.cnt) AS BIGINT) AS cum, n_pairs
  FROM hist h JOIN hist i ON i.s_u <= h.s_u CROSS JOIN tot
  GROUP BY 1, 3
),
m1 AS (
  SELECT n_pairs, CAST(MIN(s_u) AS BIGINT) AS m1_u
  FROM cum WHERE 2 * cum >= n_pairs GROUP BY 1
),
m2 AS (
  SELECT n_pairs, CAST(MIN(s_u) AS BIGINT) AS m2_u
  FROM cum WHERE 2 * cum >= n_pairs + 2 GROUP BY 1
)
SELECT {final}
FROM (
  SELECT m1.n_pairs, m1_u,
         CASE WHEN m1.n_pairs % 2 = 1 THEN m1_u
              ELSE COALESCE(m2_u, m1_u) END AS m2_u
  FROM m1 LEFT JOIN m2 ON m1.n_pairs = m2.n_pairs
)
"""


REGISTRY["theil_sen_daily"] = {
    "fn": theil_sen_daily,
    "sql": _sen_sql(),
}


# --------------------------------------------------------------------------
# Cross-correlation function between the click and purchase daily
# series at calendar lags 0..7 — "does purchase volume follow click
# volume, and at what delay". Day keys become epoch-day integers; the
# lag join is (days × 8), calendar-bounded. Per-lag Pearson from the
# exact integer moment six-tuple (sums/squares carried 128-bit wide);
# r is one IEEE chain of two wide_to_double conversions.
# --------------------------------------------------------------------------


def _ccf_final(div: str) -> list[str]:
    big = _big(div)
    num = f"CAST(n_l AS {big}) * sxy - CAST(sx AS {big}) * sy"
    dx = f"CAST(n_l AS {big}) * sxx - CAST(sx AS {big}) * sx"
    dy = f"CAST(n_l AS {big}) * syy - CAST(sy AS {big}) * sy"
    return [
        "lag",
        "n_l",
        # NULLIF: a lag with one overlapping day (or constant counts)
        # has zero variance on a side — ANSI DIVIDE_BY_ZERO on Spark;
        # r is undefined there, NULL on both engines (round-14
        # small-sample parity sweep)
        f"{_w2d(num, div)}"
        f" / NULLIF(sqrt({_w2d(dx, div)} * {_w2d(dy, div)}), 0.0)"
        " AS r_ccf",
    ]


def ccf_daily_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.expr(
                "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
                " AS BIGINT)"
            ).alias("t"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    x = daily.filter("event_type = 'click'").selectExpr(
        "t AS tx", "c AS cx"
    )
    y = daily.filter("event_type = 'purchase'").selectExpr(
        "t AS ty", "c AS cy"
    )
    lags = spark.range(8).selectExpr("CAST(id AS BIGINT) AS lag")
    j = (
        x.crossJoin(F.broadcast(lags))
        .join(y, F.expr("ty = tx + lag"))
        .selectExpr("lag", "cx", "cy")
    )
    mom = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_l"),
        F.sum("cx").cast("bigint").alias("sx"),
        F.sum("cy").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(cx AS DECIMAL(38,0)) * cy")).alias("sxy"),
        F.sum(F.expr("CAST(cx AS DECIMAL(38,0)) * cx")).alias("sxx"),
        F.sum(F.expr("CAST(cy AS DECIMAL(38,0)) * cy")).alias("syy"),
    )
    return mom.selectExpr(*_ccf_final("DIV")).orderBy("lag")


def _ccf_sql() -> str:
    final = ",\n       ".join(_ccf_final("//"))
    return f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS t,
         event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY 1, 2
),
x AS (SELECT t AS tx, c AS cx FROM daily WHERE event_type = 'click'),
y AS (SELECT t AS ty, c AS cy FROM daily WHERE event_type = 'purchase'),
lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(8)),
j AS (
  SELECT lag, cx, cy
  FROM x CROSS JOIN lags JOIN y ON ty = tx + lag
),
mom AS (
  SELECT lag,
         CAST(COUNT(*) AS BIGINT) AS n_l,
         CAST(SUM(cx) AS BIGINT) AS sx,
         CAST(SUM(cy) AS BIGINT) AS sy,
         SUM(CAST(cx AS HUGEINT) * cy) AS sxy,
         SUM(CAST(cx AS HUGEINT) * cx) AS sxx,
         SUM(CAST(cy AS HUGEINT) * cy) AS syy
  FROM j GROUP BY 1
)
SELECT {final}
FROM mom
ORDER BY lag
"""


REGISTRY["ccf_daily_lags"] = {
    "fn": ccf_daily_lags,
    "sql": _ccf_sql(),
}


# --------------------------------------------------------------------------
# Partial autocorrelation of the daily event-count series at lags
# 1-3 via Durbin-Levinson — the AR-order diagnostic that pairs with
# acf_value_events. ACF uses the standard biased estimator
# r_k = Σ_{t≤n−k}(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² with the mean
# cleared by n-scaling (n·x_t − S, exact wide ints, calendar-lag
# pairing); the DL recursion is a STAGED fixed IEEE chain (named
# columns per level — nesting blows the codegen tree, round-9 brier
# lesson). One groupBy to the daily series; lag joins are days-bounded.
# --------------------------------------------------------------------------

_PACF_STAGE2 = [
    "phi22 AS pacf2",
    "r1 * (1.0 - phi22) AS phi21",
]

_PACF_STAGE3 = [
    "(r3 - phi21 * r2 - phi22 * r1)"
    " / (1.0 - phi21 * r1 - phi22 * r2) AS pacf3",
]


def pacf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
    )
    cen = daily.crossJoin(F.broadcast(tot)).selectExpr(
        "t", "n", "n * c - s AS z"
    )
    den = cen.groupBy("n").agg(
        F.sum(F.expr("CAST(z AS DECIMAL(38,0)) * z")).alias("den")
    )
    lags = spark.range(1, 4).selectExpr("CAST(id AS BIGINT) AS lag")
    b = cen.selectExpr("t AS tb", "z AS zb")
    nums = (
        cen.crossJoin(F.broadcast(lags))
        .join(b, F.expr("tb = t + lag"))
        .groupBy("lag")
        .agg(
            F.sum(F.expr("CAST(z AS DECIMAL(38,0)) * zb")).alias(
                "num"
            )
        )
    )
    rs = (
        nums.crossJoin(F.broadcast(den))
        .selectExpr(
            "lag",
            f"{_w2d('num', 'DIV')} / {_w2d('den', 'DIV')} AS r",
        )
        .groupBy()
        .pivot("lag", [1, 2, 3])
        .agg(F.first("r"))
        .selectExpr("`1` AS r1", "`2` AS r2", "`3` AS r3")
    )
    s1 = rs.selectExpr(
        "r1",
        "r2",
        "r3",
        "r1 AS pacf1",
        "(r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22",
    )
    s2 = s1.selectExpr("r1", "r2", "r3", "pacf1", "phi22",
                       *_PACF_STAGE2)
    return s2.selectExpr(
        "r1", "r2", "r3", "pacf1", "pacf2", *_PACF_STAGE3
    )


def _pacf_sql() -> str:
    s2 = ",\n         ".join(_PACF_STAGE2)
    s3 = ",\n       ".join(_PACF_STAGE3)
    return f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
  FROM daily
),
cen AS (
  SELECT t, n, n * c - s AS z FROM daily CROSS JOIN tot
),
den AS (
  SELECT n, SUM(CAST(z AS HUGEINT) * z) AS den FROM cen GROUP BY 1
),
lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(1, 4)),
nums AS (
  SELECT lag, SUM(CAST(a.z AS HUGEINT) * b.z) AS num
  FROM cen a CROSS JOIN lags JOIN cen b ON b.t = a.t + lag
  GROUP BY 1
),
rs AS (
  SELECT
    MAX(CASE WHEN lag = 1 THEN r END) AS r1,
    MAX(CASE WHEN lag = 2 THEN r END) AS r2,
    MAX(CASE WHEN lag = 3 THEN r END) AS r3
  FROM (
    SELECT lag, {_w2d('num', '//')} / {_w2d('den', '//')} AS r
    FROM nums CROSS JOIN den
  )
),
s1 AS (
  SELECT r1, r2, r3, r1 AS pacf1,
         (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22
  FROM rs
),
s2 AS (
  SELECT r1, r2, r3, pacf1, phi22,
         {s2}
  FROM s1
)
SELECT r1, r2, r3, pacf1, pacf2,
       {s3}
FROM s2
"""


REGISTRY["pacf_daily"] = {
    "fn": pacf_daily,
    "sql": _pacf_sql(),
}


# --------------------------------------------------------------------------
# Poincaré plot descriptors of the daily series: SD1 (short-term,
# from successive-difference variance) and SD2 (long-term), the HRV
# pair repurposed as a traffic-stability monitor. Successive pairs
# come from a calendar t→t+1 equi-join; both variances from exact
# integer moments (population convention: SD1² = Var_pop(d)/2,
# SD2² = 2·Var_pop(x) − SD1², documented). One IEEE tail.
# --------------------------------------------------------------------------


def _poincare_final(div: str) -> list[str]:
    big = _big(div)
    vard = (
        f"({_w2d(f'CAST(n_d AS {big}) * sdd - CAST(sd AS {big}) * sd', div)}"
        " / (CAST(n_d AS DOUBLE) * CAST(n_d AS DOUBLE)))"
    )
    varx = (
        f"({_w2d(f'CAST(n_x AS {big}) * sxx - CAST(sx AS {big}) * sx', div)}"
        " / (CAST(n_x AS DOUBLE) * CAST(n_x AS DOUBLE)))"
    )
    return [
        "n_x",
        "n_d",
        f"sqrt({vard} / 2.0) AS sd1",
        f"sqrt(2.0 * {varx} - {vard} / 2.0) AS sd2",
    ]


def poincare_sd_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    nxt = daily.selectExpr("t - 1 AS t", "c AS c_next")
    diffs = daily.join(nxt, "t").selectExpr("c_next - c AS d")
    dmom = diffs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_d"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * d")).alias("sdd"),
    )
    xmom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_x"),
        F.sum("c").cast("bigint").alias("sx"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("sxx"),
    )
    return dmom.crossJoin(F.broadcast(xmom)).selectExpr(
        *_poincare_final("DIV")
    )


def _poincare_sql() -> str:
    final = ",\n       ".join(_poincare_final("//"))
    return f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
diffs AS (
  SELECT b.c - a.c AS d
  FROM daily a JOIN daily b ON b.t = a.t + 1
),
dmom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_d,
         CAST(SUM(d) AS BIGINT) AS sd,
         SUM(CAST(d AS HUGEINT) * d) AS sdd
  FROM diffs
),
xmom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_x,
         CAST(SUM(c) AS BIGINT) AS sx,
         SUM(CAST(c AS HUGEINT) * c) AS sxx
  FROM daily
)
SELECT {final}
FROM dmom CROSS JOIN xmom
"""


REGISTRY["poincare_sd_daily"] = {
    "fn": poincare_sd_daily,
    "sql": _poincare_sql(),
}


# --------------------------------------------------------------------------
# Unnormalized Haar wavelet detail energies of the daily series at
# dyadic levels 1-3 — which timescale (2/4/8-day) carries the traffic
# variation. The series is POSITION-indexed (rank of day — calendar
# gaps close up, documented); each level pairs consecutive positions
# (k = pos DIV 2), keeps complete pairs only, emits detail = odd−even
# and approximation = odd+even, and cascades. Detail energies are
# exact 128-bit integer sums reported through wide_to_double; the
# share normalizes by the three-level total. Everything after the
# one daily groupBy is days-bounded.
# --------------------------------------------------------------------------

_HAAR_FINAL = [
    "level",
    "n_detail",
    "energy_d",
    "energy_d / total_e AS energy_share",
]


def haar_energy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    i = daily.selectExpr("day AS di")
    pos = (
        daily.crossJoin(F.broadcast(i))
        .filter(F.expr("di <= day"))
        .groupBy("day", "c")
        .agg((F.count(F.lit(1)) - 1).cast("bigint").alias("pos"))
        .selectExpr("pos", "CAST(c AS DECIMAL(38,0)) AS v")
    )

    def level(df):
        return (
            df.groupBy(F.expr("pos DIV 2").alias("k"))
            .agg(
                F.count(F.lit(1)).alias("m"),
                F.sum(F.expr("CASE WHEN pos % 2 = 0 THEN v END")).alias(
                    "even"
                ),
                F.sum(F.expr("CASE WHEN pos % 2 = 1 THEN v END")).alias(
                    "odd"
                ),
            )
            .filter("m = 2")
            .selectExpr(
                "k AS pos", "odd - even AS d", "odd + even AS v"
            )
        )

    l1 = level(pos)
    l2 = level(l1.select("pos", "v"))
    l3 = level(l2.select("pos", "v"))
    outs = []
    for lvl, df in ((1, l1), (2, l2), (3, l3)):
        outs.append(
            df.agg(
                F.lit(lvl).cast("bigint").alias("level"),
                F.count(F.lit(1)).cast("bigint").alias("n_detail"),
                F.sum(F.expr("d * d")).alias("e_wide"),
            )
        )
    u = outs[0].unionByName(outs[1]).unionByName(outs[2])
    e = u.selectExpr(
        "level", "n_detail", f"{_w2d('e_wide', 'DIV')} AS energy_d"
    )
    tot = e.groupBy().agg(F.sum("energy_d").alias("_t"))
    # three fixed addends — sum them in LEVEL order explicitly to stay
    # engine-deterministic (a 3-row SUM is order-free here because the
    # per-level energies are exact integers < 2^53, but keep the text
    # identical anyway)
    return e.crossJoin(F.broadcast(tot)).selectExpr(
        "level",
        "n_detail",
        "energy_d",
        "energy_d / _t AS energy_share",
    ).orderBy("level")


def _haar_sql() -> str:
    lvl = """
  SELECT k AS pos, odd - even AS d, odd + even AS v
  FROM (
    SELECT pos // 2 AS k, COUNT(*) AS m,
           SUM(CASE WHEN pos % 2 = 0 THEN v END) AS even,
           SUM(CASE WHEN pos % 2 = 1 THEN v END) AS odd
    FROM {src} GROUP BY 1
  ) WHERE m = 2
"""
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
pos AS (
  SELECT CAST(COUNT(*) - 1 AS BIGINT) AS pos,
         CAST(a.c AS HUGEINT) AS v
  FROM daily a JOIN daily i ON i.day <= a.day
  GROUP BY a.day, a.c
),
l1 AS ({lvl.format(src='pos')}),
l2 AS ({lvl.format(src='(SELECT pos, v FROM l1)')}),
l3 AS ({lvl.format(src='(SELECT pos, v FROM l2)')}),
e AS (
  SELECT level, n_detail, {_w2d('e_wide', '//')} AS energy_d
  FROM (
    SELECT CAST(1 AS BIGINT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_detail,
           SUM(d * d) AS e_wide FROM l1
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
           SUM(d * d) FROM l2
    UNION ALL
    SELECT CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT),
           SUM(d * d) FROM l3
  )
),
tot AS (SELECT SUM(energy_d) AS _t FROM e)
SELECT level, n_detail, energy_d,
       energy_d / _t AS energy_share
FROM e CROSS JOIN tot
ORDER BY level
"""


REGISTRY["haar_energy_daily"] = {
    "fn": haar_energy_daily,
    "sql": _haar_sql(),
}


# --------------------------------------------------------------------------
# Sample entropy SampEn(m=2, r=0.2·σ_pop) of the daily series — the
# regularity index (low = predictable traffic, high = noisy). The
# m- and (m+1)-template pair counts B and A are exact integers from a
# (days²) template pair join (Chebyshev tolerance compared in cents of
# the identical IEEE r on both engines); SampEn = ln(B/A) through the
# portable-ln series (B ≥ A always — every 3-match is a 2-match).
# Templates assemble via calendar t→t+1/t+2 equi-joins.
# --------------------------------------------------------------------------

_SAMPEN_FINAL = ["n_days", "b_count", "a_count", "sampen"]


def sample_entropy_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import with_portable_ln

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    mom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("ssq"),
    )
    # r = 0.2 * population std — one fixed IEEE chain, identical text
    rexpr = (
        "0.2 * sqrt("
        + _w2d(
            "CAST(n_days AS {B}) * ssq - CAST(s AS {B}) * s", "DIV"
        ).replace("{B}", "DECIMAL(38,0)")
        + " / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)))"
    )
    rv = mom.selectExpr("n_days", f"{rexpr} AS r_tol")
    t1 = daily.selectExpr("t - 1 AS t", "c AS c1")
    t2 = daily.selectExpr("t - 2 AS t", "c AS c2")
    tpl = daily.join(t1, "t").join(t2, "t")  # (c, c1, c2) at t..t+2
    a_side = tpl.selectExpr(
        "t AS ta", "c AS a0", "c1 AS a1", "c2 AS a2"
    )
    b_side = tpl.selectExpr(
        "t AS tb", "c AS b0", "c1 AS b1", "c2 AS b2"
    )
    pairs = (
        a_side.crossJoin(F.broadcast(b_side))
        .filter("ta < tb")
        .crossJoin(F.broadcast(rv))
    )
    agg = pairs.agg(
        F.max("n_days").alias("n_days"),
        F.sum(
            F.expr(
                "CAST(CAST(abs(b0 - a0) AS DOUBLE) <= r_tol"
                " AND CAST(abs(b1 - a1) AS DOUBLE) <= r_tol"
                " AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("b_count"),
        F.sum(
            F.expr(
                "CAST(CAST(abs(b0 - a0) AS DOUBLE) <= r_tol"
                " AND CAST(abs(b1 - a1) AS DOUBLE) <= r_tol"
                " AND CAST(abs(b2 - a2) AS DOUBLE) <= r_tol"
                " AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("a_count"),
    )
    # A = 0 (no (m+1)-matches) leaves SampEn undefined → NULL on both
    # engines; the ln runs on max(x,1) so the guarded branch is total
    out = with_portable_ln(
        agg,
        "GREATEST(b_count, 1)",
        "GREATEST(a_count, 1)",
        "_sampen_raw",
    ).selectExpr(
        "n_days",
        "b_count",
        "a_count",
        "CASE WHEN a_count >= 1 AND b_count >= 1 THEN _sampen_raw"
        " ELSE NULL END AS sampen",
    )
    return out.selectExpr(*_SAMPEN_FINAL)


def _sampen_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
    )

    rexpr = (
        "0.2 * sqrt("
        + _w2d("CAST(n_days AS HUGEINT) * ssq"
               " - CAST(s AS HUGEINT) * s", "//")
        + " / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)))"
    )
    ln_ctes = portable_ln_duck_ctes(
        "agg",
        "n_days, b_count, a_count",
        "GREATEST(b_count, 1)",
        "GREATEST(a_count, 1)",
        "_sampen_raw",
        "se",
    )
    return f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(c) AS BIGINT) AS s,
         SUM(CAST(c AS HUGEINT) * c) AS ssq
  FROM daily
),
rv AS (SELECT n_days, {rexpr} AS r_tol FROM mom),
tpl AS (
  SELECT d0.t, d0.c AS c0, d1.c AS c1, d2.c AS c2
  FROM daily d0
  JOIN daily d1 ON d1.t = d0.t + 1
  JOIN daily d2 ON d2.t = d0.t + 2
),
agg AS (
  SELECT CAST(MAX(n_days) AS BIGINT) AS n_days,
         CAST(SUM(CASE WHEN CAST(ABS(b.c0 - a.c0) AS DOUBLE) <= r_tol
                        AND CAST(ABS(b.c1 - a.c1) AS DOUBLE) <= r_tol
                  THEN 1 ELSE 0 END) AS BIGINT) AS b_count,
         CAST(SUM(CASE WHEN CAST(ABS(b.c0 - a.c0) AS DOUBLE) <= r_tol
                        AND CAST(ABS(b.c1 - a.c1) AS DOUBLE) <= r_tol
                        AND CAST(ABS(b.c2 - a.c2) AS DOUBLE) <= r_tol
                  THEN 1 ELSE 0 END) AS BIGINT) AS a_count
  FROM tpl a JOIN tpl b ON a.t < b.t CROSS JOIN rv
),
{ln_ctes}
SELECT n_days, b_count, a_count,
       CASE WHEN a_count >= 1 AND b_count >= 1 THEN _sampen_raw
            ELSE NULL END AS sampen
FROM se_out
"""


REGISTRY["sample_entropy_daily"] = {
    "fn": sample_entropy_daily,
    "sql": _sampen_sql(),
}


# --------------------------------------------------------------------------
# Bartels rank von Neumann ratio — the rank test of serial RANDOMNESS
# of the daily series (the nonparametric sibling of durbin_watson).
# Doubled midranks r2ᵢ (exact ints from the days² join, as pettitt);
# RVN = Σ(rᵢ−rᵢ₊₁)² / Σ(rᵢ−r̄)², where with doubled ranks both sums
# scale by 4 and cancel, and Σ(r2ᵢ − (n+1))² uses the doubled-mean
# identity E[r2] = n+1 exactly. z = (RVN − 2)/sqrt(var), var the
# standard 4(n−2)(5n²−2n−9)/(5n(n+1)(n−1)²).
# --------------------------------------------------------------------------

_BARTELS_FINAL = [
    "n_days",
    "num_d2",
    "den_d2",
    "CAST(num_d2 AS DOUBLE) / NULLIF(CAST(den_d2 AS DOUBLE), 0.0)"
    " AS rvn",
    "(CAST(num_d2 AS DOUBLE) / NULLIF(CAST(den_d2 AS DOUBLE), 0.0)"
    " - 2.0)"
    " / NULLIF(sqrt(4.0 * CAST(n_days - 2 AS DOUBLE)"
    " * (5.0 * CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)"
    " - 2.0 * CAST(n_days AS DOUBLE) - 9.0)"
    " / NULLIF(5.0 * CAST(n_days AS DOUBLE)"
    " * CAST(n_days + 1 AS DOUBLE)"
    " * CAST(n_days - 1 AS DOUBLE) * CAST(n_days - 1 AS DOUBLE),"
    " 0.0)), 0.0)"
    " AS z_bartels",
]


def bartels_rank_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    b = daily.selectExpr("day AS db", "c AS cb")
    r2 = (
        daily.crossJoin(F.broadcast(b))
        .groupBy("day")
        .agg(
            F.sum(
                F.expr("2 * CAST(cb < c AS BIGINT)"
                       " + CAST(cb = c AS BIGINT)")
            )
            .cast("bigint")
            .alias("r2m1")
        )
        .selectExpr("day", "r2m1 + 1 AS r2")
    )
    nxt = r2.selectExpr("date_sub(day, 1) AS day", "r2 AS r2n")
    num = r2.join(nxt, "day").agg(
        F.sum(F.expr("(r2 - r2n) * (r2 - r2n)"))
        .cast("bigint")
        .alias("num_d2")
    )
    den = r2.crossJoin(
        F.broadcast(
            r2.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
        )
    ).groupBy("n_days").agg(
        F.sum(
            F.expr("(r2 - (n_days + 1)) * (r2 - (n_days + 1))")
        )
        .cast("bigint")
        .alias("den_d2")
    )
    return num.crossJoin(F.broadcast(den)).selectExpr(
        *_BARTELS_FINAL
    )


def _bartels_sql() -> str:
    final = ",\n       ".join(_BARTELS_FINAL)
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
r2 AS (
  SELECT a.day,
         CAST(SUM(2 * CASE WHEN b.c < a.c THEN 1 ELSE 0 END
                  + CASE WHEN b.c = a.c THEN 1 ELSE 0 END)
              AS BIGINT) + 1 AS r2
  FROM daily a CROSS JOIN daily b
  GROUP BY 1
),
num AS (
  SELECT CAST(SUM((a.r2 - b.r2) * (a.r2 - b.r2)) AS BIGINT) AS num_d2
  FROM r2 a JOIN r2 b ON b.day = a.day + INTERVAL 1 DAY
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM r2),
den AS (
  SELECT n_days,
         CAST(SUM((r2 - (n_days + 1)) * (r2 - (n_days + 1)))
              AS BIGINT) AS den_d2
  FROM r2 CROSS JOIN n GROUP BY 1
)
SELECT {final}
FROM num CROSS JOIN den
"""


REGISTRY["bartels_rank_daily"] = {
    "fn": bartels_rank_daily,
    "sql": _bartels_sql(),
}


# --------------------------------------------------------------------------
# Cox-Stuart trend test on the daily series: pair day i with day
# i+⌈n/2⌉ by POSITION (odd middle dropped, the standard convention),
# count rises vs falls among non-tied pairs, and take the binomial
# normal approximation with continuity correction. Exact integer
# sign counts off the position pair join; one IEEE tail.
# --------------------------------------------------------------------------

# NULLIF: every compared pair tied (round-14 epochs sweep hit this
# with a 5-day series of equal counts) gives m_pairs = 0 — z undefined,
# degrade to NULL identically on both engines
_COX_FINAL = [
    "n_days",
    "s_plus",
    "s_minus",
    "m_pairs",
    "CASE WHEN s_plus >= s_minus"
    " THEN (CAST(s_plus AS DOUBLE) - CAST(m_pairs AS DOUBLE) / 2.0"
    " - 0.5) / NULLIF(sqrt(CAST(m_pairs AS DOUBLE) / 4.0), 0.0)"
    " ELSE (CAST(s_plus AS DOUBLE) - CAST(m_pairs AS DOUBLE) / 2.0"
    " + 0.5) / NULLIF(sqrt(CAST(m_pairs AS DOUBLE) / 4.0), 0.0)"
    " END AS z_cox_stuart",
]


def cox_stuart_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    i = daily.selectExpr("day AS di")
    pos = (
        daily.crossJoin(F.broadcast(i))
        .filter(F.expr("di <= day"))
        .groupBy("day", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pos"))
    )
    n = pos.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    # classic convention: odd n drops the MIDDLE observation — pair
    # pos i (i ≤ n DIV 2) with pos i + n DIV 2 + (n % 2)
    shifted = pos.crossJoin(F.broadcast(n)).selectExpr(
        "n_days",
        "pos",
        "c",
        "pos - (n_days DIV 2 + n_days % 2) AS pos_first",
    )
    first = shifted.filter(
        "pos <= n_days DIV 2"
    ).selectExpr("n_days", "pos AS p", "c AS c_first")
    second = shifted.filter("pos_first >= 1").selectExpr(
        "pos_first AS p", "c AS c_second"
    )
    agg = first.join(second, "p").groupBy("n_days").agg(
        F.sum(F.expr("CAST(c_second > c_first AS BIGINT)"))
        .cast("bigint")
        .alias("s_plus"),
        F.sum(F.expr("CAST(c_second < c_first AS BIGINT)"))
        .cast("bigint")
        .alias("s_minus"),
    )
    return agg.selectExpr(
        "n_days",
        "s_plus",
        "s_minus",
        "s_plus + s_minus AS m_pairs",
    ).selectExpr(*_COX_FINAL)


def _cox_sql() -> str:
    final = ",\n       ".join(_COX_FINAL)
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
pos AS (
  SELECT a.day, a.c, CAST(COUNT(*) AS BIGINT) AS pos
  FROM daily a JOIN daily i ON i.day <= a.day
  GROUP BY a.day, a.c
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM pos),
agg AS (
  SELECT n_days,
         CAST(SUM(CASE WHEN b.c > a.c THEN 1 ELSE 0 END) AS BIGINT)
           AS s_plus,
         CAST(SUM(CASE WHEN b.c < a.c THEN 1 ELSE 0 END) AS BIGINT)
           AS s_minus
  FROM pos a
  JOIN n ON a.pos <= n_days // 2
  JOIN pos b ON b.pos = a.pos + n_days // 2 + n_days % 2
  GROUP BY 1
)
SELECT {final}
FROM (
  SELECT n_days, s_plus, s_minus, s_plus + s_minus AS m_pairs
  FROM agg
)
"""


REGISTRY["cox_stuart_daily"] = {
    "fn": cox_stuart_daily,
    "sql": _cox_sql(),
}


# --------------------------------------------------------------------------
# Lognormal fit + higher-moment consistency check on l_extendedprice:
# fit (μ̂, σ̂²) from per-row portable-ln of the cents value, then test
# the fit against the SECOND moment the lognormal implies —
# ln(E[X²]/E[X]²) should equal σ². The gap is the misfit statistic
# (0 for a true lognormal; price columns fail it when they're capped
# or mixed). Per-row lns are micro-quantized before the moment sums
# (cross-row double sums are engine-order dependent); the empirical
# moment ratio n·ΣX² / (ΣX)² is a wide-integer rational through a
# SECOND portable-ln. Map-only + one aggregate.
# --------------------------------------------------------------------------


def _lognorm_final(div: str) -> list[str]:
    big = _big(div)
    mu = "(CAST(s_l AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0))"
    # sample variance of ln: (n·Σl² − (Σl)²) / (n·(n−1)), micro² scale
    varnum = f"(CAST(n AS {big}) * s_ll - CAST(s_l AS {big}) * s_l)"
    sigma2 = (
        f"({_w2d(varnum, div)} / NULLIF(CAST(n AS DOUBLE)"
        " * CAST(n - 1 AS DOUBLE) * 1000000.0 * 1000000.0, 0.0))"
    )
    return [
        "n",
        f"{mu} - 4.605170185988091 AS mu_hat_dollars",  # − ln(100)
        f"{sigma2} AS sigma2_hat",
        "ln_moment_ratio",
        f"ln_moment_ratio - {sigma2} AS lognormal_gap",
    ]


def lognormal_fit_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import with_portable_ln

    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " AS x"
    ).filter("x >= 1")
    lned = with_portable_ln(li, "x", "1", "__ln").selectExpr(
        "x", "CAST(floor(__ln * 1000000.0 + 0.5) AS BIGINT) AS l_u"
    )
    mom = lned.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("l_u").cast("bigint").alias("s_l"),
        F.sum(F.expr("CAST(l_u AS DECIMAL(38,0)) * l_u")).alias(
            "s_ll"
        ),
        F.sum("x").cast("bigint").alias("s_x"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("s_xx"),
    )
    # empirical ln(E[X²]/E[X]²) = ln(n·ΣX² / (ΣX)²) — wide rational
    ratio = with_portable_ln(
        mom,
        "CAST(n AS DECIMAL(38,0)) * s_xx",
        "CAST(s_x AS DECIMAL(38,0)) * s_x",
        "ln_moment_ratio",
    )
    return ratio.selectExpr(*_lognorm_final("DIV"))


def _lognorm_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
    )

    ln1 = portable_ln_duck_ctes(
        "li", "x", "x", "1", "__ln", "lg"
    )
    ln2 = portable_ln_duck_ctes(
        "mom",
        "n, s_l, s_ll, s_x, s_xx",
        "CAST(n AS HUGEINT) * s_xx",
        "CAST(s_x AS HUGEINT) * s_x",
        "ln_moment_ratio",
        "lr",
    )
    final = ",\n       ".join(_lognorm_final("//"))
    return f"""
WITH li AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS x
  FROM lineitem
  WHERE CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        >= 1
),
{ln1},
lned AS (
  SELECT x, CAST(floor(__ln * 1000000.0 + 0.5) AS BIGINT) AS l_u
  FROM lg_out
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(l_u) AS BIGINT) AS s_l,
         SUM(CAST(l_u AS HUGEINT) * l_u) AS s_ll,
         CAST(SUM(x) AS BIGINT) AS s_x,
         SUM(CAST(x AS HUGEINT) * x) AS s_xx
  FROM lned
),
{ln2}
SELECT {final}
FROM lr_out
"""


REGISTRY["lognormal_fit_price"] = {
    "fn": lognormal_fit_price,
    "sql": _lognorm_sql(),
}


# --------------------------------------------------------------------------
# Wald-Wolfowitz two-sample runs test: click vs purchase values
# pooled and sorted (v_c, then click-before-purchase WITHIN a tied
# value — the documented deterministic tie convention), count runs
# of the group label, z against the exact run-count null moments.
# Runs are counted on the VALUE HISTOGRAM: within a value, a
# boundary iff both groups occupy it; between adjacent occupied
# values, a boundary iff trailing and leading groups differ — a lag
# window over the histogram, never the raw log.
# --------------------------------------------------------------------------

_WW_FINAL = [
    "n_a",
    "n_b",
    "n_runs",
    # NULLIF guards (round-14 one-class parity sweep): with one empty
    # class the variance is 0 (sigma 0 -> ANSI DIVIDE_BY_ZERO on
    # Spark), and with N = 1 the N-1 factor is 0 — z degrades to NULL
    # identically on both engines; z is undefined there anyway
    "(CAST(n_runs AS DOUBLE) - (2.0 * CAST(n_a AS DOUBLE)"
    " * CAST(n_b AS DOUBLE) / (CAST(n_a AS DOUBLE)"
    " + CAST(n_b AS DOUBLE)) + 1.0))"
    " / NULLIF(sqrt(2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)"
    " * (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)"
    " - CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))"
    " / NULLIF((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))"
    " * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))"
    " * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0), 0.0)), 0.0)"
    " AS z_ww_runs",
]


def ww_runs_two_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    byval = (
        load_events_finite(spark, sf_dir)
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
    w = Window.partitionBy(F.lit(1)).orderBy("v_c")
    # leading group of this value (a if any clicks), trailing group
    # (b if any purchases), internal boundary if both present
    lagged = byval.withColumn(
        "prev_trail",
        F.lag(F.expr("CASE WHEN b_n > 0 THEN 1 ELSE 0 END")).over(w),
    )
    agg = lagged.agg(
        F.sum("a_n").cast("bigint").alias("n_a"),
        F.sum("b_n").cast("bigint").alias("n_b"),
        (
            F.lit(1)
            + F.sum(
                F.expr("CAST(a_n > 0 AND b_n > 0 AS BIGINT)")
            )
            + F.sum(
                F.expr(
                    "CASE WHEN prev_trail IS NULL THEN 0"
                    " WHEN prev_trail <> (CASE WHEN a_n > 0 THEN 0"
                    " ELSE 1 END) THEN 1 ELSE 0 END"
                )
            )
        )
        .cast("bigint")
        .alias("n_runs"),
    )
    return agg.selectExpr(*_WW_FINAL)


def _ww_sql() -> str:
    final = ",\n       ".join(_WW_FINAL)
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
lagged AS (
  SELECT a_n, b_n,
         LAG(CASE WHEN b_n > 0 THEN 1 ELSE 0 END)
           OVER (ORDER BY v_c) AS prev_trail
  FROM byval
)
SELECT {final}
FROM (
  SELECT CAST(SUM(a_n) AS BIGINT) AS n_a,
         CAST(SUM(b_n) AS BIGINT) AS n_b,
         CAST(1 + SUM(CASE WHEN a_n > 0 AND b_n > 0 THEN 1 ELSE 0 END)
              + SUM(CASE WHEN prev_trail IS NULL THEN 0
                    WHEN prev_trail <> (CASE WHEN a_n > 0 THEN 0
                                        ELSE 1 END) THEN 1
                    ELSE 0 END) AS BIGINT) AS n_runs
  FROM lagged
)
"""


REGISTRY["ww_runs_two_sample"] = {
    "fn": ww_runs_two_sample,
    "sql": _ww_sql(),
}


# --------------------------------------------------------------------------
# Hodges-Lehmann shift estimator between the click and purchase
# daily-count series: median of all pairwise differences
# (purchase_day_j − click_day_i) — the robust "how much higher does
# one stream run" companion to the KS test's "do they differ at
# all". The days² difference grid is calendar-bounded; the median is
# the cum-vs-half pair join over the difference histogram, exact
# integers throughout (lower/upper-middle average, as theil_sen).
# --------------------------------------------------------------------------

_HL_FINAL = [
    "n_pairs",
    "m1_d",
    "m2_d",
    "(CAST(m1_d AS DOUBLE) + CAST(m2_d AS DOUBLE)) / 2.0"
    " AS hl_shift",
]


def hodges_lehmann_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    a = daily.filter("event_type = 'click'").selectExpr("c AS ca")
    b = daily.filter("event_type = 'purchase'").selectExpr("c AS cb")
    diffs = (
        a.crossJoin(F.broadcast(b))
        .selectExpr("cb - ca AS d")
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tot = diffs.agg(F.sum("cnt").cast("bigint").alias("n_pairs"))
    i2 = diffs.selectExpr("d AS d2", "cnt AS cnt2")
    cum = (
        diffs.crossJoin(F.broadcast(i2))
        .filter("d2 <= d")
        .groupBy("d")
        .agg(F.sum("cnt2").cast("bigint").alias("cum"))
        .crossJoin(F.broadcast(tot))
    )
    m1 = cum.filter("2 * cum >= n_pairs").groupBy("n_pairs").agg(
        F.min("d").cast("bigint").alias("m1_d")
    )
    m2 = cum.filter("2 * cum >= n_pairs + 2").groupBy(
        "n_pairs"
    ).agg(F.min("d").cast("bigint").alias("m2_d"))
    j = m1.join(m2, "n_pairs", "left").selectExpr(
        "n_pairs",
        "m1_d",
        "CASE WHEN n_pairs % 2 = 1 THEN m1_d"
        " ELSE COALESCE(m2_d, m1_d) END AS m2_d",
    )
    return j.selectExpr(*_HL_FINAL)


def _hl_sql() -> str:
    final = ",\n       ".join(_HL_FINAL)
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY 1, 2
),
a AS (SELECT c AS ca FROM daily WHERE event_type = 'click'),
b AS (SELECT c AS cb FROM daily WHERE event_type = 'purchase'),
diffs AS (
  SELECT cb - ca AS d, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM a CROSS JOIN b
  GROUP BY 1
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_pairs FROM diffs),
cum AS (
  SELECT h.d, CAST(SUM(i.cnt) AS BIGINT) AS cum, n_pairs
  FROM diffs h JOIN diffs i ON i.d <= h.d CROSS JOIN tot
  GROUP BY 1, 3
),
m1 AS (
  SELECT n_pairs, CAST(MIN(d) AS BIGINT) AS m1_d
  FROM cum WHERE 2 * cum >= n_pairs GROUP BY 1
),
m2 AS (
  SELECT n_pairs, CAST(MIN(d) AS BIGINT) AS m2_d
  FROM cum WHERE 2 * cum >= n_pairs + 2 GROUP BY 1
)
SELECT {final}
FROM (
  SELECT m1.n_pairs, m1_d,
         CASE WHEN m1.n_pairs % 2 = 1 THEN m1_d
              ELSE COALESCE(m2_d, m1_d) END AS m2_d
  FROM m1 LEFT JOIN m2 ON m1.n_pairs = m2.n_pairs
)
"""


REGISTRY["hodges_lehmann_daily"] = {
    "fn": hodges_lehmann_daily,
    "sql": _hl_sql(),
}
