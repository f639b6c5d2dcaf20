"""Statistical-testing tier III (round 9b): distribution-equality,
change-point, and digit-law diagnostics over the event log — the
remaining "did this batch come from the same process" monitors a
training-data QA pipeline runs between ingest and mixture curation:
Kolmogorov-Smirnov two-sample, Mood's k-sample median test, Benford
first-digit conformance, the Pettitt change-point test, CUSUM /
Buishand homogeneity, and the Theil-Sen robust trend slope.

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
    portable_ln_const,
    wide_halfup_div_sql as _whd,
    wide_to_double_sql as _w2d,
)
from de4ml_spark.session import load_table

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
    # the numerator needs n_a/n_b before the max — two-pass: totals
    # first (broadcast scalar), then the max over the histogram
    totals = byval.agg(
        F.sum("a_n").cast("bigint").alias("n_a"),
        F.sum("b_n").cast("bigint").alias("n_b"),
    )
    dmax = (
        cum.crossJoin(F.broadcast(totals))
        .selectExpr(
            "n_a", "n_b", "abs(cum_a * n_b - cum_b * n_a) AS dn"
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("dn").cast("bigint").alias("d_num"))
    )
    return dmax.selectExpr(*_KS_FINAL)


def _ks_sql() -> str:
    final = ",\n       ".join(_KS_FINAL)
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
        ev.filter(F.col("value").isNotNull())
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
# Benford first-digit conformance of o_totalprice: the classic
# fabricated-data / unit-mix detector. Expected p_d = ln(1+1/d)/ln 10
# is PRECOMPUTED through the portable-ln series at module import (the
# same doubles are embedded as literals in BOTH engine texts, so no
# runtime transcendental). Per-digit chi-square terms
# (O_d − N·p_d)²/(N·p_d) are micro-quantized to integer units and
# integer-summed (a cross-row DOUBLE SUM would be engine-order
# dependent). First digit via the decimal string of the cents value
# (leading digit is scale-invariant). One groupBy to 9 rows.
# --------------------------------------------------------------------------

_LN10 = portable_ln_const(10)
_BENFORD_P = [portable_ln_const(d + 1, d) / _LN10 for d in range(1, 10)]


def _benford_cases() -> str:
    return (
        "CASE digit "
        + " ".join(
            f"WHEN {d} THEN {_BENFORD_P[d - 1]!r}" for d in range(1, 10)
        )
        + " ELSE 0.0 END"
    )


_BENFORD_FINAL = [
    "n_tot",
    "CAST(SUM(term_u) AS DOUBLE) / 1000000.0 AS chi2_benford",
    "CAST(MAX(CASE WHEN term_u = max_term_u THEN digit END) AS BIGINT)"
    " AS worst_digit",
]


def benford_first_digit_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    digits = (
        orders.filter(F.col("o_totalprice").isNotNull())
        .selectExpr(
            "CAST(SUBSTRING(CAST(CAST(CAST(o_totalprice"
            " AS DECIMAL(18,2)) * 100 AS BIGINT) AS STRING), 1, 1)"
            " AS BIGINT) AS digit"
        )
        .filter("digit >= 1")
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    tot = digits.agg(F.sum("o").cast("bigint").alias("n_tot"))
    terms = digits.crossJoin(F.broadcast(tot)).selectExpr(
        "digit",
        "n_tot",
        f"CAST(floor((CAST(o AS DOUBLE)"
        f" - CAST(n_tot AS DOUBLE) * ({_benford_cases()}))"
        f" * (CAST(o AS DOUBLE)"
        f" - CAST(n_tot AS DOUBLE) * ({_benford_cases()}))"
        f" / (CAST(n_tot AS DOUBLE) * ({_benford_cases()}))"
        f" * 1000000.0 + 0.5) AS BIGINT) AS term_u",
    )
    wmax = Window.partitionBy("n_tot")
    ranked = terms.withColumn(
        "max_term_u", F.max("term_u").over(wmax)
    )
    return ranked.groupBy("n_tot").agg(
        F.expr(
            "CAST(SUM(term_u) AS DOUBLE) / 1000000.0"
        ).alias("chi2_benford"),
        F.expr(
            "CAST(MAX(CASE WHEN term_u = max_term_u THEN digit END)"
            " AS BIGINT)"
        ).alias("worst_digit"),
    )


def _benford_sql() -> str:
    cases = _benford_cases()
    return f"""
WITH digits AS (
  SELECT CAST(SUBSTRING(CAST(CAST(CAST(o_totalprice
           AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1)
           AS BIGINT) AS digit,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM orders
  WHERE o_totalprice IS NOT NULL
  GROUP BY 1
),
d2 AS (SELECT * FROM digits WHERE digit >= 1),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n_tot FROM d2),
terms AS (
  SELECT digit, n_tot,
         CAST(floor((CAST(o AS DOUBLE)
           - CAST(n_tot AS DOUBLE) * ({cases}))
           * (CAST(o AS DOUBLE)
           - CAST(n_tot AS DOUBLE) * ({cases}))
           / (CAST(n_tot AS DOUBLE) * ({cases}))
           * 1000000.0 + 0.5) AS BIGINT) AS term_u
  FROM d2 CROSS JOIN tot
),
ranked AS (
  SELECT *, MAX(term_u) OVER (PARTITION BY n_tot) AS max_term_u
  FROM terms
)
SELECT n_tot,
       CAST(SUM(term_u) AS DOUBLE) / 1000000.0 AS chi2_benford,
       CAST(MAX(CASE WHEN term_u = max_term_u THEN digit END) AS BIGINT)
         AS worst_digit
FROM ranked
GROUP BY n_tot
"""


REGISTRY["benford_first_digit_orders"] = {
    "fn": benford_first_digit_orders,
    "sql": _benford_sql(),
}
