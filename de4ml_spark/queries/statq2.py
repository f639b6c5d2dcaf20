"""Statistical-testing tier II (round 9): the parametric and
association-measure battery that complements statq.py's rank tests —
Welch's t, one-way ANOVA, Cramér's V, ROC-AUC, and Spearman rank
correlation. These are the remaining standard "did the cohorts
diverge / how associated are these columns" questions a training-data
QA pipeline asks of an event log.

Reference parity: the reference's dataops loop derives validation
rules from per-column profiles (dataops/app/profile.py); comparing a
new batch's profile against history is exactly a two-sample /
k-sample test, and feature-association measures gate leakage checks.

Exactness discipline (operators/portable_hash.py): all mass moves
through integer cents histograms; 128-bit intermediates stay INTERNAL
(DECIMAL(38,0) on Spark / HUGEINT in DuckDB); every 128-bit → DOUBLE
conversion uses wide_to_double_sql; the post-aggregate scalar chain is
the SAME SQL text on both engines (one correctly-rounded IEEE op per
step, fixed association), so results are bit-identical. Result
schemas stay on the driver-safe whitelist (BIGINT / DOUBLE / STRING).

Scale posture (100 TB): one groupBy reduces the log to a value
histogram (or a k-element per-group moment table); all windows run
over histogram-bounded frames, never the raw log. The only cross
joins are k×k type-pair expansions (k = event-type count, tiny).
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
# Welch's unequal-variance t-test between every unordered pair of
# event types on `value` — the parametric sibling of the pairwise
# Mann-Whitney in statq.py. Moments are exact integers in cents
# (n, Σv, Σv² per type; Σv² carried 128-bit internally), the variance
# numerator n·Σv² − (Σv)² is a 128-bit integer converted through
# wide_to_double_sql, and the t statistic and Welch–Satterthwaite df
# are a fixed-association IEEE chain evaluated from the SAME SQL text
# on both engines. Scale: one groupBy to a k-row moment table; the
# pair expansion is k(k-1)/2 rows on the driver-side broadcast.
# --------------------------------------------------------------------------


def _welch_stage1(div: str) -> list[str]:
    big = _big(div)
    out = []
    for s in ("a", "b"):
        vnum = (
            f"CAST(n_{s} AS {big}) * ss_{s}"
            f" - CAST(s_{s} AS {big}) * s_{s}"
        )
        out.append(
            f"CAST(s_{s} AS DOUBLE) / (100.0 * CAST(n_{s} AS DOUBLE))"
            f" AS mean_{s}"
        )
        # SE² of the DOLLAR mean: sample variance is vnum/(n(n-1)) in
        # cents² (vnum = n·Σx² − (Σx)²), /10⁴ to dollars², /n for the
        # SE² — one left-associated double product denominator
        # n·(n-1)·10⁴·n (caught by the pure-Python recompute in
        # tests/test_round9_queries.py; the cross-engine hash gate
        # alone cannot see a shared-formula error)
        out.append(
            f"{_w2d(vnum, div)} / (CAST(n_{s} AS DOUBLE)"
            f" * CAST(n_{s} - 1 AS DOUBLE)"
            f" * 10000.0 * CAST(n_{s} AS DOUBLE)) AS se2_{s}"
        )
    return out


# NULLIF(..., 0.0) on both denominators: a shard where every value in
# both classes is identical (round-14 ties parity sweep) has se2 = 0 —
# Spark ANSI aborts on the raw division; the guard degrades to NULL on
# both engines (same SQL text), matching the degenerate convention.
_WELCH_STAGE2 = [
    "(mean_a - mean_b) / NULLIF(sqrt(se2_a + se2_b), 0.0) AS t_welch",
    "((se2_a + se2_b) * (se2_a + se2_b))"
    " / NULLIF(se2_a * se2_a / CAST(n_a - 1 AS DOUBLE)"
    " + se2_b * se2_b / CAST(n_b - 1 AS DOUBLE), 0.0) AS df_welch",
]


def welch_ttest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = (
        load_events_finite(spark, sf_dir)
        .filter(F.col("event_type").isNotNull())
        .groupBy(
            "event_type",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v_c"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per = counts.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.expr("v_c * cnt")).cast("bigint").alias("s"),
        F.sum(F.expr("CAST(v_c AS DECIMAL(38,0)) * v_c * cnt")).alias(
            "ss"
        ),
    )
    a = per.selectExpr(
        "event_type AS type_a", "n AS n_a", "s AS s_a", "ss AS ss_a"
    )
    b = per.selectExpr(
        "event_type AS type_b", "n AS n_b", "s AS s_b", "ss AS ss_b"
    )
    pairs = (
        a.crossJoin(b)
        .filter("type_a < type_b AND n_a > 1 AND n_b > 1")
    )
    staged = pairs.selectExpr(
        "type_a", "type_b", "n_a", "n_b", *_welch_stage1("DIV")
    )
    return staged.selectExpr(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        *_WELCH_STAGE2,
    )


def _welch_sql() -> str:
    s1 = ",\n         ".join(_welch_stage1("//"))
    s2 = ",\n       ".join(_WELCH_STAGE2)
    return f"""
WITH counts AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         COUNT(*) AS cnt
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
per AS (
  SELECT event_type,
         CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(v_c * cnt) AS BIGINT) AS s,
         SUM(CAST(v_c AS HUGEINT) * v_c * cnt) AS ss
  FROM counts GROUP BY 1
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.n AS n_a, b.n AS n_b, a.s AS s_a, b.s AS s_b,
         a.ss AS ss_a, b.ss AS ss_b
  FROM per a CROSS JOIN per b
  WHERE a.event_type < b.event_type AND a.n > 1 AND b.n > 1
),
staged AS (
  SELECT type_a, type_b, n_a, n_b,
         {s1}
  FROM pairs
)
SELECT type_a, type_b, n_a, n_b, mean_a, mean_b,
       {s2}
FROM staged
"""


REGISTRY["welch_ttest_value"] = {
    "fn": welch_ttest_value,
    "sql": _welch_sql(),
}


# --------------------------------------------------------------------------
# One-way ANOVA F across event types on `value` (the parametric
# k-sample sibling of Kruskal-Wallis). Between/within sums of squares
# in exact cents²: each per-type s_i²/n_i and the grand S²/N are
# HALF-UP 128-bit quotients (wide_halfup_div_sql — Spark's DIV wraps,
# float floors saturate), integer-summed, so SSB/SSW/SST are exact to
# ±0.5 cents² per term and identical across engines by construction;
# F and η² are then a fixed IEEE chain. Scale: one groupBy to a k-row
# moment table; everything after is k-bounded.
# --------------------------------------------------------------------------


def _anova_stage(div: str) -> list[str]:
    big = _big(div)
    sq = f"CAST(s AS {big}) * s"
    gsq = f"CAST(s_tot AS {big}) * s_tot"
    return [
        f"{_whd(sq, 'n', div)} AS term_q",
        f"{_whd(gsq, 'n_tot', div)} AS grand_q",
    ]


_ANOVA_FINAL = [
    "k_groups",
    "n_tot",
    # NULLIF degenerate guards: k = 1 group or n = k (no within-group
    # dof) or zero total variance yield NULL, not DIVIDE_BY_ZERO
    "{SSB} / NULLIF(CAST(k_groups - 1 AS DOUBLE), 0.0)"
    " / NULLIF({SSW} / NULLIF(CAST(n_tot - k_groups AS DOUBLE), 0.0),"
    " 0.0) AS f_stat",
    "{SSB} / NULLIF({SST}, 0.0) AS eta_sq",
]


def anova_value_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = (
        load_events_finite(spark, sf_dir)
        .filter(F.col("event_type").isNotNull())
        .groupBy(
            "event_type",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v_c"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per = counts.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.expr("v_c * cnt")).cast("bigint").alias("s"),
        F.sum(F.expr("CAST(v_c AS DECIMAL(38,0)) * v_c * cnt")).alias(
            "ss"
        ),
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        F.sum("n").cast("bigint").alias("n_tot"),
        F.sum("s").cast("bigint").alias("s_tot"),
        F.sum("ss").alias("ss_tot"),
    )
    terms = per.crossJoin(F.broadcast(tot)).selectExpr(
        "k_groups",
        "n_tot",
        "s_tot",
        "ss_tot",
        *_anova_stage("DIV"),
    )
    sums = terms.groupBy("k_groups", "n_tot").agg(
        F.sum("term_q").alias("sum_q"),
        F.max("grand_q").alias("grand_q"),
        F.max("ss_tot").alias("ss_tot"),
    )
    ssb = _w2d("sum_q - grand_q", "DIV")
    ssw = _w2d("ss_tot - sum_q", "DIV")
    sst = _w2d("ss_tot - grand_q", "DIV")
    final = [
        e.replace("{SSB}", ssb).replace("{SSW}", ssw).replace(
            "{SST}", sst
        )
        for e in _ANOVA_FINAL
    ]
    return sums.selectExpr(*final)


def _anova_sql() -> str:
    stage = ",\n         ".join(_anova_stage("//"))
    ssb = _w2d("sum_q - grand_q", "//")
    ssw = _w2d("ss_tot - sum_q", "//")
    sst = _w2d("ss_tot - grand_q", "//")
    final = ",\n       ".join(
        e.replace("{SSB}", ssb).replace("{SSW}", ssw).replace(
            "{SST}", sst
        )
        for e in _ANOVA_FINAL
    )
    return f"""
WITH counts AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         COUNT(*) AS cnt
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
per AS (
  SELECT event_type,
         CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(v_c * cnt) AS BIGINT) AS s,
         SUM(CAST(v_c AS HUGEINT) * v_c * cnt) AS ss
  FROM counts GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
         CAST(SUM(n) AS BIGINT) AS n_tot,
         CAST(SUM(s) AS BIGINT) AS s_tot,
         SUM(ss) AS ss_tot
  FROM per
),
terms AS (
  SELECT k_groups, n_tot, s_tot, ss_tot,
         {stage}
  FROM per CROSS JOIN tot
),
sums AS (
  SELECT k_groups, n_tot, SUM(term_q) AS sum_q,
         MAX(grand_q) AS grand_q, MAX(ss_tot) AS ss_tot
  FROM terms GROUP BY 1, 2
)
SELECT {final}
FROM sums
"""


REGISTRY["anova_value_types"] = {
    "fn": anova_value_types,
    "sql": _anova_sql(),
}


# --------------------------------------------------------------------------
# Cramér's V association between event_type and the event's day-of-
# week — "is activity mix day-dependent", the standard contingency
# association gate before using a categorical as a split key. The
# day-of-week is epoch-day % 7 (identical arithmetic on both engines —
# the engines' dayofweek() builtins disagree on origin). φ² = χ²/N is
# computed N-free: Σ o²/(r·c) in pico units via TWO chained half-up
# 128-bit divisions (r·c itself can exceed int64 at corpus scale, so
# divide by r then by c), minus 1. V = sqrt(φ²/min(r-1, c-1)).
# Scale: one groupBy to an (event_type × 7) cell table.
# --------------------------------------------------------------------------

_PICO = 1_000_000_000_000


def _cramer_term(div: str) -> str:
    big = _big(div)
    o2p = f"CAST(o AS {big}) * o * {_PICO}"
    step1 = _whd(o2p, "r_i", div)
    return _whd(step1, "c_j", div)


_CRAMER_FINAL = [
    "n_rows",
    "n_cols",
    "n_tot",
    "{PHI2} * CAST(n_tot AS DOUBLE) AS chi2",
    "sqrt({PHI2} / NULLIF(CAST(CASE WHEN n_rows < n_cols THEN"
    " n_rows - 1 ELSE n_cols - 1 END AS DOUBLE), 0.0)) AS cramers_v",
]


def cramers_v_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.filter(F.col("event_type").isNotNull())
        .selectExpr(
            "event_type",
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') % 7"
            " AS BIGINT) AS dow",
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    rows = cells.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("r_i")
    )
    cols = cells.groupBy("dow").agg(
        F.sum("o").cast("bigint").alias("c_j")
    )
    j = cells.join(F.broadcast(rows), "event_type").join(
        F.broadcast(cols), "dow"
    )
    terms = j.selectExpr(f"{_cramer_term('DIV')} AS term_p")
    dims = cells.agg(
        F.countDistinct("event_type").cast("bigint").alias("n_rows"),
        F.countDistinct("dow").cast("bigint").alias("n_cols"),
        F.sum("o").cast("bigint").alias("n_tot"),
    )
    summed = terms.agg(F.sum("term_p").alias("sum_p")).crossJoin(
        F.broadcast(dims)
    )
    phi2 = f"({_w2d(f'sum_p - {_PICO}', 'DIV')} / {float(_PICO)!r})"
    return summed.selectExpr(
        *[e.replace("{PHI2}", phi2) for e in _CRAMER_FINAL]
    )


def _cramer_sql() -> str:
    phi2 = f"({_w2d(f'sum_p - {_PICO}', '//')} / {float(_PICO)!r})"
    final = ",\n       ".join(
        e.replace("{PHI2}", phi2) for e in _CRAMER_FINAL
    )
    return f"""
WITH cells AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
              AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events
  WHERE event_type IS NOT NULL
  GROUP BY 1, 2
),
rws AS (
  SELECT event_type, CAST(SUM(o) AS BIGINT) AS r_i FROM cells GROUP BY 1
),
cls AS (
  SELECT dow, CAST(SUM(o) AS BIGINT) AS c_j FROM cells GROUP BY 1
),
j AS (
  SELECT c.o, r.r_i, l.c_j
  FROM cells c JOIN rws r USING (event_type) JOIN cls l USING (dow)
),
terms AS (
  SELECT {_cramer_term("//")} AS term_p FROM j
),
dims AS (
  SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT dow) AS BIGINT) AS n_cols,
         CAST(SUM(o) AS BIGINT) AS n_tot
  FROM cells
),
summed AS (
  SELECT SUM(term_p) AS sum_p FROM terms
)
SELECT {final}
FROM summed CROSS JOIN dims
"""


REGISTRY["cramers_v_events"] = {
    "fn": cramers_v_events,
    "sql": _cramer_sql(),
}


# --------------------------------------------------------------------------
# ROC-AUC of `value` as a score for predicting event_type='purchase' —
# the standard threshold-free ranking metric, computed exactly as the
# normalized midrank Mann-Whitney U on the value HISTOGRAM (never
# per-row ranks): AUC = [Σ_v p_v·(2·#neg<v + q_v)] / (2·n_pos·n_neg).
# The doubled-U sum is exact integer (128-bit internally); the final
# normalization is wide_to_double over a fixed double product.
# Gini = 2·AUC − 1 rides along. Scale: one groupBy to the per-value
# (pos,neg) histogram; the cumulative runs over distinct values only
# (the kruskal-wallis histogram-window pattern).
# --------------------------------------------------------------------------


def _auc_final(div: str) -> list[str]:
    return [
        "n_pos",
        "n_neg",
        # NULLIF degenerate guard: a one-class sample (n_pos or n_neg
        # = 0) yields NULL AUC, not a DIVIDE_BY_ZERO abort
        f"{_w2d('u2', div)} / NULLIF(2.0 * CAST(n_pos AS DOUBLE)"
        " * CAST(n_neg AS DOUBLE), 0.0) AS auc",
        f"2.0 * ({_w2d('u2', div)} / NULLIF(2.0 * CAST(n_pos AS DOUBLE)"
        " * CAST(n_neg AS DOUBLE), 0.0)) - 1.0 AS gini",
    ]


def auc_roc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
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
                F.expr(
                    "CAST(event_type = 'purchase' AS BIGINT)"
                )
            ).alias("p"),
            F.sum(
                F.expr(
                    "CAST(event_type <> 'purchase' AS BIGINT)"
                )
            ).alias("q"),
        )
    )
    wcum = Window.orderBy("v_c").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = hist.withColumn(
        "cum_q", F.sum("q").over(wcum)
    ).selectExpr(
        "p",
        "q",
        "CAST(p AS DECIMAL(38,0)) * (2 * (cum_q - q) + q) AS u2_term",
    )
    agg = ranked.agg(
        F.sum("u2_term").alias("u2"),
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum("q").cast("bigint").alias("n_neg"),
    )
    return agg.selectExpr(*_auc_final("DIV"))


def _auc_sql() -> str:
    final = ",\n       ".join(_auc_final("//"))
    return f"""
WITH hist AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p,
         SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS q
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
),
ranked AS (
  SELECT p, q,
         CAST(p AS HUGEINT)
           * (2 * (SUM(q) OVER (ORDER BY v_c
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - q)
              + q) AS u2_term
  FROM hist
),
agg AS (
  SELECT SUM(u2_term) AS u2,
         CAST(SUM(p) AS BIGINT) AS n_pos,
         CAST(SUM(q) AS BIGINT) AS n_neg
  FROM ranked
)
SELECT {final}
FROM agg
"""


REGISTRY["auc_roc_events"] = {
    "fn": auc_roc_events,
    "sql": _auc_sql(),
}


# --------------------------------------------------------------------------
# Spearman rank correlation between l_quantity and l_extendedprice —
# the monotone-association measure (Pearson on midranks). Midranks
# come from per-variable value HISTOGRAMS (the ×2 integer midrank
# trick: 2·rank = 2·(cum−cnt) + cnt + 1), joined back onto the JOINT
# (x,y) histogram — so no per-row rank assignment ever happens. All
# five moment sums (Σw·rx, Σw·ry, Σw·rx², Σw·ry², Σw·rx·ry, ranks
# carried ×2) are exact 128-bit integers; ρ's numerator and the two
# variance factors are 128-bit integer expressions converted through
# wide_to_double_sql, then one divide + sqrt chain. Bound: the ×2
# midrank products stay inside DECIMAL(38) for n ≤ ~3·10⁸ rows per
# partition-set; beyond that, pre-scale the histogram. Scale: two
# tiny histogram windows + one joint-histogram groupBy.
# --------------------------------------------------------------------------


def _spearman_final(div: str) -> list[str]:
    big = _big(div)
    num = (
        f"CAST(n_tot AS {big}) * sxy - CAST(sx AS {big}) * sy"
    )
    fx = f"CAST(n_tot AS {big}) * sxx - CAST(sx AS {big}) * sx"
    fy = f"CAST(n_tot AS {big}) * syy - CAST(sy AS {big}) * sy"
    return [
        "n_tot",
        f"{_w2d(num, div)} / NULLIF(sqrt({_w2d(fx, div)}"
        f" * {_w2d(fy, div)}), 0.0) AS spearman_rho",
    ]


def spearman_quantity_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    joint = (
        li.filter(
            F.col("l_quantity").isNotNull()
            & F.col("l_extendedprice").isNotNull()
        )
        .groupBy(
            (F.col("l_quantity").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("x_c"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("y_c"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )

    def midranks(col: str):
        # the price histogram is NOT fixed-size (distinct prices grow
        # with the catalog), so the cumulative runs on the distributed
        # range-partition cumsum, never a single-partition window; the
        # oracle's plain window is the test-scale twin
        from de4ml_spark.operators.rank import with_global_cumsum

        h = joint.groupBy(F.col(col).alias("v")).agg(
            F.sum("w").cast("bigint").alias("c")
        )
        return with_global_cumsum(h, ["v"], "c", out_col="cum").selectExpr(
            f"v AS {col}", "2 * (cum - c) + c + 1 AS r2"
        )

    j = (
        joint.join(midranks("x_c"), "x_c")
        .withColumnRenamed("r2", "rx2")
        .join(midranks("y_c"), "y_c")
        .withColumnRenamed("r2", "ry2")
    )
    agg = j.agg(
        F.sum("w").cast("bigint").alias("n_tot"),
        F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * rx2")).alias("sx"),
        F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * ry2")).alias("sy"),
        F.sum(
            F.expr("CAST(w AS DECIMAL(38,0)) * rx2 * rx2")
        ).alias("sxx"),
        F.sum(
            F.expr("CAST(w AS DECIMAL(38,0)) * ry2 * ry2")
        ).alias("syy"),
        F.sum(
            F.expr("CAST(w AS DECIMAL(38,0)) * rx2 * ry2")
        ).alias("sxy"),
    )
    return agg.selectExpr(*_spearman_final("DIV"))


def _spearman_sql() -> str:
    final = ",\n       ".join(_spearman_final("//"))
    return f"""
WITH joint AS (
  SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x_c,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS y_c,
         COUNT(*) AS w
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY 1, 2
),
xh AS (
  SELECT x_c, 2 * (SUM(c) OVER (ORDER BY x_c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
           + c + 1 AS rx2
  FROM (SELECT x_c, SUM(w) AS c FROM joint GROUP BY 1)
),
yh AS (
  SELECT y_c, 2 * (SUM(c) OVER (ORDER BY y_c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
           + c + 1 AS ry2
  FROM (SELECT y_c, SUM(w) AS c FROM joint GROUP BY 1)
),
agg AS (
  SELECT CAST(SUM(w) AS BIGINT) AS n_tot,
         SUM(CAST(w AS HUGEINT) * rx2) AS sx,
         SUM(CAST(w AS HUGEINT) * ry2) AS sy,
         SUM(CAST(w AS HUGEINT) * rx2 * rx2) AS sxx,
         SUM(CAST(w AS HUGEINT) * ry2 * ry2) AS syy,
         SUM(CAST(w AS HUGEINT) * rx2 * ry2) AS sxy
  FROM joint j JOIN xh USING (x_c) JOIN yh USING (y_c)
)
SELECT {final}
FROM agg
"""


REGISTRY["spearman_quantity_price"] = {
    "fn": spearman_quantity_price,
    "sql": _spearman_sql(),
}


# --------------------------------------------------------------------------
# Kendall τ-b between the $50 value bucket and the event's day-of-week
# (epoch-day % 7) — the concordance-based association measure that
# complements Spearman (midrank-Pearson) above. Computed ENTIRELY on
# the joint (bucket × dow) cell table: concordant/discordant pair
# masses are a self-join over grid CELLS (grid² pairs — the grid is
# fixed-size regardless of corpus scale, never the log), tie masses
# come from the marginals, and τ-b = 2(C−D)/√((n₀2−n₁2)(n₀2−n₂2))
# with every mass a 128-bit integer (×2-carried to stay integral)
# converted through wide_to_double. Scale: one groupBy to the grid.
# --------------------------------------------------------------------------


def _kendall_final(div: str) -> list[str]:
    return [
        "n_tot",
        "c_mass",
        "d_mass",
        # NULLIF (round-14 one-class parity sweep): when either
        # variable is fully tied (one x bucket / one weekday in the
        # shard) its tie correction equals n0x2 and the denominator is
        # 0 — ANSI DIVIDE_BY_ZERO on Spark, NULL here on both engines
        # (tau-b is undefined under a fully-tied margin)
        f"(2.0 * {_w2d('c_mass - d_mass', div)})"
        f" / NULLIF(sqrt({_w2d('n0x2 - n1x2', div)}"
        f" * {_w2d('n0x2 - n2x2', div)}), 0.0) AS kendall_tau_b",
    ]


def kendall_tau_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = (
        load_events_finite(spark, sf_dir)
        .filter(F.col("event_type").isNotNull())
        .selectExpr(
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 5000 AS x",
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') % 7"
            " AS BIGINT) AS y",
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    a = cells.selectExpr("x AS xa", "y AS ya", "n AS na")
    b = cells.selectExpr("x AS xb", "y AS yb", "n AS nb")
    pairs = a.join(F.broadcast(b), F.expr("xa < xb"))
    cd = pairs.agg(
        F.sum(
            F.expr(
                "CASE WHEN ya < yb THEN CAST(na AS DECIMAL(38,0)) * nb"
                " ELSE CAST(0 AS DECIMAL(38,0)) END"
            )
        ).alias("c_mass_w"),
        F.sum(
            F.expr(
                "CASE WHEN ya > yb THEN CAST(na AS DECIMAL(38,0)) * nb"
                " ELSE CAST(0 AS DECIMAL(38,0)) END"
            )
        ).alias("d_mass_w"),
    )
    xm = cells.groupBy("x").agg(F.sum("n").alias("t"))
    ym = cells.groupBy("y").agg(F.sum("n").alias("u"))
    ties = (
        cells.agg(F.sum("n").cast("bigint").alias("n_tot"))
        .crossJoin(
            F.broadcast(
                xm.agg(
                    F.sum(
                        F.expr("CAST(t AS DECIMAL(38,0)) * (t - 1)")
                    ).alias("n1x2")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                ym.agg(
                    F.sum(
                        F.expr("CAST(u AS DECIMAL(38,0)) * (u - 1)")
                    ).alias("n2x2")
                )
            )
        )
    )
    out = cd.crossJoin(F.broadcast(ties)).selectExpr(
        "n_tot",
        "CAST(c_mass_w AS BIGINT) AS c_mass",
        "CAST(d_mass_w AS BIGINT) AS d_mass",
        "c_mass_w - d_mass_w AS cd_w",
        "CAST(n_tot AS DECIMAL(38,0)) * (n_tot - 1) AS n0x2",
        "n1x2",
        "n2x2",
    )
    # rebind the wide diff under the names the shared tail expects
    staged = out.selectExpr(
        "n_tot",
        "c_mass",
        "d_mass",
        "CAST(c_mass AS DECIMAL(38,0)) AS _cw",
        "CAST(d_mass AS DECIMAL(38,0)) AS _dw",
        "n0x2",
        "n1x2",
        "n2x2",
    ).selectExpr(
        "n_tot",
        "c_mass",
        "d_mass",
        "_cw - _dw AS __cd",
        "n0x2",
        "n1x2",
        "n2x2",
    )
    final = [
        e.replace("c_mass - d_mass", "__cd") for e in _kendall_final("DIV")
    ]
    return staged.selectExpr(*final)


def _kendall_sql() -> str:
    final = ",\n       ".join(
        e.replace("c_mass - d_mass", "__cd")
        for e in _kendall_final("//")
    )
    return f"""
WITH cells AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 5000
           AS x,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
              AS BIGINT) AS y,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
cd AS (
  SELECT SUM(CASE WHEN a.y < b.y THEN CAST(a.n AS HUGEINT) * b.n
                  ELSE CAST(0 AS HUGEINT) END) AS c_mass_w,
         SUM(CASE WHEN a.y > b.y THEN CAST(a.n AS HUGEINT) * b.n
                  ELSE CAST(0 AS HUGEINT) END) AS d_mass_w
  FROM cells a JOIN cells b ON a.x < b.x
),
ties AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_tot FROM cells
),
xm AS (
  SELECT SUM(CAST(t AS HUGEINT) * (t - 1)) AS n1x2
  FROM (SELECT x, CAST(SUM(n) AS BIGINT) AS t FROM cells GROUP BY 1)
),
ym AS (
  SELECT SUM(CAST(u AS HUGEINT) * (u - 1)) AS n2x2
  FROM (SELECT y, CAST(SUM(n) AS BIGINT) AS u FROM cells GROUP BY 1)
),
staged AS (
  SELECT n_tot,
         CAST(c_mass_w AS BIGINT) AS c_mass,
         CAST(d_mass_w AS BIGINT) AS d_mass,
         c_mass_w - d_mass_w AS __cd,
         CAST(n_tot AS HUGEINT) * (n_tot - 1) AS n0x2,
         n1x2, n2x2
  FROM cd CROSS JOIN ties CROSS JOIN xm CROSS JOIN ym
)
SELECT {final}
FROM staged
"""


REGISTRY["kendall_tau_events"] = {
    "fn": kendall_tau_events,
    "sql": _kendall_sql(),
}


# --------------------------------------------------------------------------
# Cliff's delta effect size between every unordered pair of event
# types on `value` — the ordinal "how often does A beat B" companion
# to the Mann-Whitney TEST (statq.py): δ = (#(a>b) − #(a<b))/(nₐ·n_b).
# Same histogram machinery as mann_whitney_value (explode the pair
# membership → one BroadcastHashJoin over a single histogram scan;
# per-pair windows run over the value histogram, never the log):
# δ's numerator is Σ_v aₙ·(2·cum_b − bₙ − n_b) in exact integers
# carried 128-bit, normalized once through wide_to_double.
# --------------------------------------------------------------------------


def _cliffs_final(div: str) -> list[str]:
    return [
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        f"{_w2d('delta_w', div)} / (CAST(n_a AS DOUBLE)"
        " * CAST(n_b AS DOUBLE)) AS cliffs_delta",
    ]


def cliffs_delta_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shared per-pair cum-histogram frame (operators/pairhist.py): cum_b
    # and the side totals are precomputed, so the entry is one groupBy
    # over the persisted histogram-bounded scan.
    from de4ml_spark.operators.pairhist import pair_value_histogram

    ranked = pair_value_histogram(spark, sf_dir).selectExpr(
        "type_a",
        "type_b",
        "a_n",
        "b_n",
        "cum_b",
        "n_b AS nb_tot",
    )
    agg = ranked.groupBy("type_a", "type_b").agg(
        F.sum("a_n").cast("bigint").alias("n_a"),
        F.max("nb_tot").cast("bigint").alias("n_b"),
        F.sum(
            F.expr(
                "CAST(a_n AS DECIMAL(38,0))"
                " * (2 * cum_b - b_n - nb_tot)"
            )
        ).alias("delta_w"),
    )
    return agg.selectExpr(*_cliffs_final("DIV"))


def _cliffs_sql() -> str:
    final = ",\n       ".join(_cliffs_final("//"))
    return f"""
WITH counts AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         COUNT(*) AS cnt
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM counts),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM types a CROSS JOIN types b
  WHERE a.event_type < b.event_type
),
member AS (
  SELECT p.type_a, p.type_b, c.v_c,
         CASE WHEN c.event_type = p.type_a THEN c.cnt ELSE 0 END
           AS cnt_a,
         CASE WHEN c.event_type = p.type_b THEN c.cnt ELSE 0 END
           AS cnt_b
  FROM counts c JOIN pairs p
    ON c.event_type = p.type_a OR c.event_type = p.type_b
),
byval AS (
  SELECT type_a, type_b, v_c,
         SUM(cnt_a) AS a_n, SUM(cnt_b) AS b_n
  FROM member GROUP BY 1, 2, 3
),
ranked AS (
  SELECT type_a, type_b, a_n, b_n,
         SUM(b_n) OVER (PARTITION BY type_a, type_b ORDER BY v_c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
         SUM(b_n) OVER (PARTITION BY type_a, type_b) AS nb_tot
  FROM byval
),
agg AS (
  SELECT type_a, type_b,
         CAST(SUM(a_n) AS BIGINT) AS n_a,
         CAST(MAX(nb_tot) AS BIGINT) AS n_b,
         SUM(CAST(a_n AS HUGEINT) * (2 * cum_b - b_n - nb_tot))
           AS delta_w
  FROM ranked GROUP BY 1, 2
)
SELECT {final}
FROM agg
"""


REGISTRY["cliffs_delta_value"] = {
    "fn": cliffs_delta_value,
    "sql": _cliffs_sql(),
}


# --------------------------------------------------------------------------
# Average precision (PR-AUC) of `value` as a score for
# event_type='purchase', with the deterministic TIED-BLOCK convention:
# values are processed in descending-score blocks, each block
# contributes (block positives / total positives) × (precision AFTER
# the block) — the whole-block variant of sklearn's step
# interpolation, well-defined under ties. Each block term
# p_v·tp_v/(tp_v+fp_v) is a micro-quantized HALF-UP 128-bit quotient,
# integer-summed; one wide_to_double normalization. Scale: histogram
# windows only (the kruskal-wallis pattern).
# --------------------------------------------------------------------------


def _ap_final(div: str) -> list[str]:
    return [
        "n_pos",
        "n_neg",
        f"{_w2d('ap_u', div)} / NULLIF(CAST(n_pos AS DOUBLE)"
        " * 1000000.0, 0.0) AS average_precision",
    ]


def pr_auc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            F.sum(F.expr("CAST(event_type = 'purchase' AS BIGINT)"))
            .alias("p"),
            F.sum(F.expr("CAST(event_type <> 'purchase' AS BIGINT)"))
            .alias("q"),
        )
    )
    wdesc = Window.orderBy(F.col("v_c").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.withColumn("tp", F.sum("p").over(wdesc)).withColumn(
        "fp", F.sum("q").over(wdesc)
    )
    term = f"{_whd('CAST(p AS DECIMAL(38,0)) * tp * 1000000', 'tp + fp', 'DIV')}"
    terms = cum.selectExpr("p", "q", f"{term} AS ap_t")
    agg = terms.agg(
        F.sum("ap_t").alias("ap_u"),
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum("q").cast("bigint").alias("n_neg"),
    )
    return agg.selectExpr(*_ap_final("DIV"))


def _ap_sql() -> str:
    final = ",\n       ".join(_ap_final("//"))
    term = _whd("CAST(p AS HUGEINT) * tp * 1000000", "tp + fp", "//")
    return f"""
WITH hist AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p,
         SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS q
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
),
cum AS (
  SELECT p, q,
         SUM(p) OVER (ORDER BY v_c DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
         SUM(q) OVER (ORDER BY v_c DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
  FROM hist
),
terms AS (
  SELECT p, q, {term} AS ap_t FROM cum
)
SELECT {final}
FROM (
  SELECT SUM(ap_t) AS ap_u,
         CAST(SUM(p) AS BIGINT) AS n_pos,
         CAST(SUM(q) AS BIGINT) AS n_neg
  FROM terms
)
"""


REGISTRY["pr_auc_events"] = {
    "fn": pr_auc_events,
    "sql": _ap_sql(),
}


# --------------------------------------------------------------------------
# Brown-Forsythe test (median-based Levene) for variance homogeneity
# of `value` across event types — the robust "can I pool these
# cohorts' variances" gate that pairs with the ANOVA above. Stage 1
# finds each type's EXACT median from the per-type value histogram
# (carried ×2 so even-count midpoints stay integral; the window runs
# over the histogram, never the log). Stage 2 is literally the ANOVA
# moment machinery applied to z = |2·value − median2| in half-cents:
# 128-bit moment sums, half-up wide quotients, one IEEE tail.
# W = ((N−k)/(k−1)) · SSB_z / SSW_z.
# --------------------------------------------------------------------------

_BF_FINAL = [
    "k_groups",
    "n_tot",
    "({SSB} / NULLIF(CAST(k_groups - 1 AS DOUBLE), 0.0))"
    " / NULLIF({SSW} / NULLIF(CAST(n_tot - k_groups AS DOUBLE), 0.0),"
    " 0.0) AS w_stat",
]


def brown_forsythe_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = (
        load_events_finite(spark, sf_dir)
        .filter(F.col("event_type").isNotNull())
        .groupBy(
            "event_type",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v_c"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("v_c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    cum = (
        counts.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("n_i", F.sum("cnt").over(wall))
    )
    # median2 = v[(n+1) DIV 2] + v[(n+2) DIV 2] (1-based), from the
    # blocks covering those positions — ×2 so even-n midpoints are ints
    med = cum.selectExpr(
        "event_type",
        "v_c",
        "cum - cnt AS lo",
        "cum AS hi",
        "(n_i + 1) DIV 2 AS pos1",
        "(n_i + 2) DIV 2 AS pos2",
    ).selectExpr(
        "event_type",
        "CASE WHEN pos1 > lo AND pos1 <= hi THEN v_c ELSE 0 END"
        " + CASE WHEN pos2 > lo AND pos2 <= hi THEN v_c ELSE 0 END"
        " AS m_part",
    ).groupBy("event_type").agg(
        F.sum("m_part").cast("bigint").alias("median2")
    )
    z = (
        counts.join(F.broadcast(med), "event_type")
        .selectExpr(
            "event_type",
            "abs(2 * v_c - median2) AS z",
            "cnt",
        )
    )
    per = z.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.expr("z * cnt")).cast("bigint").alias("s"),
        F.sum(F.expr("CAST(z AS DECIMAL(38,0)) * z * cnt")).alias("ss"),
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        F.sum("n").cast("bigint").alias("n_tot"),
        F.sum("s").cast("bigint").alias("s_tot"),
        F.sum("ss").alias("ss_tot"),
    )
    terms = per.crossJoin(F.broadcast(tot)).selectExpr(
        "k_groups",
        "n_tot",
        "s_tot",
        "ss_tot",
        *_anova_stage("DIV"),
    )
    sums = terms.groupBy("k_groups", "n_tot").agg(
        F.sum("term_q").alias("sum_q"),
        F.max("grand_q").alias("grand_q"),
        F.max("ss_tot").alias("ss_tot"),
    )
    ssb = _w2d("sum_q - grand_q", "DIV")
    ssw = _w2d("ss_tot - sum_q", "DIV")
    final = [
        e.replace("{SSB}", ssb).replace("{SSW}", ssw)
        for e in _BF_FINAL
    ]
    return sums.selectExpr(*final)


def _bf_sql() -> str:
    stage = ",\n         ".join(_anova_stage("//"))
    ssb = _w2d("sum_q - grand_q", "//")
    ssw = _w2d("ss_tot - sum_q", "//")
    final = ",\n       ".join(
        e.replace("{SSB}", ssb).replace("{SSW}", ssw)
        for e in _BF_FINAL
    )
    return f"""
WITH counts AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         COUNT(*) AS cnt
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT event_type, v_c, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY v_c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n_i
  FROM counts
),
med AS (
  SELECT event_type, CAST(SUM(m_part) AS BIGINT) AS median2
  FROM (
    SELECT event_type,
           CASE WHEN (n_i + 1) // 2 > cum - cnt
                 AND (n_i + 1) // 2 <= cum THEN v_c ELSE 0 END
           + CASE WHEN (n_i + 2) // 2 > cum - cnt
                   AND (n_i + 2) // 2 <= cum THEN v_c ELSE 0 END
             AS m_part
    FROM cum
  )
  GROUP BY 1
),
z AS (
  SELECT c.event_type, abs(2 * c.v_c - m.median2) AS z, c.cnt
  FROM counts c JOIN med m USING (event_type)
),
per AS (
  SELECT event_type,
         CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(z * cnt) AS BIGINT) AS s,
         SUM(CAST(z AS HUGEINT) * z * cnt) AS ss
  FROM z GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
         CAST(SUM(n) AS BIGINT) AS n_tot,
         CAST(SUM(s) AS BIGINT) AS s_tot,
         SUM(ss) AS ss_tot
  FROM per
),
terms AS (
  SELECT k_groups, n_tot, s_tot, ss_tot,
         {stage}
  FROM per CROSS JOIN tot
),
sums AS (
  SELECT k_groups, n_tot, SUM(term_q) AS sum_q,
         MAX(grand_q) AS grand_q, MAX(ss_tot) AS ss_tot
  FROM terms GROUP BY 1, 2
)
SELECT {final}
FROM sums
"""


REGISTRY["brown_forsythe_value"] = {
    "fn": brown_forsythe_value,
    "sql": _bf_sql(),
}


# --------------------------------------------------------------------------
# Wald-Wolfowitz runs test for randomness of `value` around its
# global median along the (ts, event_id) event order — the standard
# "is this sequence i.i.d. or trending/oscillating" check on a metric
# stream. The global median comes from the value histogram (bounded
# window); ties AT the median are dropped (the standard dichotomy).
# The run count needs each sign's PREDECESSOR in a corpus-wide total
# order — computed WITHOUT a single-partition window: the distributed
# range-partition rank (operators/rank.py) assigns global positions,
# and adjacent positions meet by an equi-join on rank = rank+1 (one
# hash shuffle). The z statistic is exact-integer moments through
# wide_to_double. The oracle states the same semantics with a LAG
# window — the test-scale twin of the rank+join plan.
# --------------------------------------------------------------------------


def _runs_final(div: str) -> list[str]:
    big = _big(div)
    two_np = f"(2 * CAST(n1 AS {big}) * n2)"
    mu = (
        f"(1.0 + {_w2d(two_np, div)} / CAST(n1 + n2 AS DOUBLE))"
    )
    var = (
        f"({_w2d(f'{two_np} * ({two_np} - (n1 + n2))', div)}"
        " / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)"
        " * CAST(n1 + n2 - 1 AS DOUBLE)))"
    )
    return [
        "n1",
        "n2",
        "runs",
        f"(CAST(runs AS DOUBLE) - {mu}) / sqrt({var}) AS z_runs",
    ]


def runs_test_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.rank import with_global_rank

    ev = load_table(spark, sf_dir, "events")
    base = load_events_finite(spark, sf_dir).selectExpr(
        "event_id",
        "ts",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c",
    )
    # distributed cumsum over the value histogram (cents grids are
    # value-domain-bounded, but the contract test asserts NO
    # single-partition window anywhere in this entry's plan) + a
    # broadcast total instead of a whole-frame window
    from de4ml_spark.operators.rank import with_global_cumsum

    hist = base.groupBy("v_c").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = hist.agg(F.sum("cnt").cast("bigint").alias("n_i"))
    cum = with_global_cumsum(
        hist, ["v_c"], "cnt", out_col="cum"
    ).crossJoin(F.broadcast(tot))
    med = cum.selectExpr(
        "CASE WHEN (n_i + 1) DIV 2 > cum - cnt"
        " AND (n_i + 1) DIV 2 <= cum THEN v_c ELSE 0 END"
        " + CASE WHEN (n_i + 2) DIV 2 > cum - cnt"
        " AND (n_i + 2) DIV 2 <= cum THEN v_c ELSE 0 END AS m_part"
    ).agg(F.sum("m_part").cast("bigint").alias("median2"))
    signed = (
        base.crossJoin(F.broadcast(med))
        .filter("2 * v_c <> median2")
        .selectExpr(
            "ts",
            "event_id",
            "CAST(2 * v_c > median2 AS BIGINT) AS sgn",
        )
    )
    ranked = with_global_rank(
        signed, ["ts", "event_id"], out_col="pos"
    ).select("pos", "sgn")
    nxt = ranked.selectExpr("pos - 1 AS pos", "sgn AS sgn_next")
    changes = (
        ranked.join(nxt, "pos")
        .agg(
            F.sum(F.expr("CAST(sgn <> sgn_next AS BIGINT)"))
            .cast("bigint")
            .alias("chg")
        )
    )
    tallies = ranked.agg(
        F.sum("sgn").cast("bigint").alias("n1"),
        F.sum(F.expr("1 - sgn")).cast("bigint").alias("n2"),
    )
    agg = changes.crossJoin(F.broadcast(tallies)).selectExpr(
        "n1", "n2", "chg + 1 AS runs"
    )
    return agg.selectExpr(*_runs_final("DIV"))


def _runs_sql() -> str:
    final = ",\n       ".join(_runs_final("//"))
    return f"""
WITH base AS (
  SELECT event_id, ts,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c
  FROM events
  WHERE value IS NOT NULL
),
hist AS (
  SELECT v_c, COUNT(*) AS cnt FROM base GROUP BY 1
),
cum AS (
  SELECT v_c, cnt,
         SUM(cnt) OVER (ORDER BY v_c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER () AS n_i
  FROM hist
),
med AS (
  SELECT CAST(SUM(
           CASE WHEN (n_i + 1) // 2 > cum - cnt
                 AND (n_i + 1) // 2 <= cum THEN v_c ELSE 0 END
           + CASE WHEN (n_i + 2) // 2 > cum - cnt
                   AND (n_i + 2) // 2 <= cum THEN v_c ELSE 0 END)
           AS BIGINT) AS median2
  FROM cum
),
signed AS (
  SELECT ts, event_id,
         CASE WHEN 2 * v_c > median2 THEN 1 ELSE 0 END AS sgn
  FROM base CROSS JOIN med
  WHERE 2 * v_c <> median2
),
seq AS (
  SELECT sgn,
         LAG(sgn) OVER (ORDER BY ts, event_id) AS sgn_prev
  FROM signed
),
agg AS (
  SELECT CAST(SUM(sgn) AS BIGINT) AS n1,
         CAST(SUM(1 - sgn) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN sgn_prev IS NOT NULL AND sgn <> sgn_prev
                       THEN 1 ELSE 0 END) + 1 AS BIGINT) AS runs
  FROM seq
)
SELECT {final}
FROM agg
"""


REGISTRY["runs_test_value"] = {
    "fn": runs_test_value,
    "sql": _runs_sql(),
}


# --------------------------------------------------------------------------
# Actuarial life table over 7-day intervals — the grouped-interval
# member of the survival family (Nelson-Aalen hazard, Kaplan-Meier,
# log-rank live in statq/tsq2): per interval, entrants n_i, churns
# d_i, within-interval censorings w_i, and the actuarial adjustment
# n'_i = n_i − w_i/2 (carried ×2 to stay integral). The cumulative
# log-survival is Σ ln(n2'/(n2'−2d)) with the portable ln,
# micro-quantized (the Kaplan-Meier spine pattern, including the
# provably-terminal NULL mask when an interval absorbs everyone).
# The spine is calendar-bounded, so every window is tiny; the only
# corpus-sized work is one groupBy to per-user spans.
# --------------------------------------------------------------------------


def life_table_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import with_portable_ln

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
            F.sum(
                F.expr("CAST(churned = 0 AND iv = i AS BIGINT)")
            ).cast("bigint").alias("w_i"),
        )
    )
    adj = table.selectExpr(
        "i", "n_enter", "d_i", "w_i", "2 * n_enter - w_i AS n2_adj"
    )
    lned = with_portable_ln(
        adj, "n2_adj", "GREATEST(n2_adj - 2 * d_i, 1)", "__ln"
    ).selectExpr(
        "i",
        "n_enter",
        "d_i",
        "w_i",
        "CASE WHEN n2_adj = 2 * d_i THEN NULL"
        " ELSE CAST(floor(__ln * 1000000.0 + 0.5) AS BIGINT) END"
        " AS negln_micro",
    )
    return lned.select(
        "i",
        "n_enter",
        "d_i",
        "w_i",
        F.expr(
            "CASE WHEN negln_micro IS NULL THEN NULL ELSE"
            " -CAST(CAST(SUM(negln_micro) OVER (ORDER BY i ROWS BETWEEN"
            " UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
            " AS DOUBLE) / 1000000.0 END"
        ).alias("logsurv_r"),
    )


def _life_table_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
    )

    return f"""
WITH spans AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1
),
horizon AS (SELECT MAX(d1) AS hmax FROM spans),
per_user AS (
  SELECT datediff('day', d0, d1) // 7 AS iv,
         CAST(d1 < h.hmax AS INT) AS churned
  FROM spans CROSS JOIN horizon h
),
tbl AS (
  SELECT i,
         CAST(COUNT(*) AS BIGINT) AS n_enter,
         CAST(SUM(CASE WHEN churned = 1 AND iv = i THEN 1 ELSE 0 END)
              AS BIGINT) AS d_i,
         CAST(SUM(CASE WHEN churned = 0 AND iv = i THEN 1 ELSE 0 END)
              AS BIGINT) AS w_i
  FROM (
    SELECT iv, churned, unnest(generate_series(0, iv)) AS i
    FROM per_user
  )
  GROUP BY 1
),
adj AS (
  SELECT i, n_enter, d_i, w_i, 2 * n_enter - w_i AS n2_adj FROM tbl
),
{portable_ln_duck_ctes(
    "adj", "i, n_enter, d_i, w_i, n2_adj",
    "n2_adj", "GREATEST(n2_adj - 2 * d_i, 1)", "lnv", "lt")},
steps AS (
  SELECT i, n_enter, d_i, w_i,
         CASE WHEN n2_adj = 2 * d_i THEN NULL
              ELSE CAST(floor(lnv * 1000000.0 + 0.5) AS BIGINT) END
           AS negln_micro
  FROM lt_out
)
SELECT i, n_enter, d_i, w_i,
       CASE WHEN negln_micro IS NULL THEN NULL ELSE
       -CAST(CAST(SUM(negln_micro) OVER (ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS DOUBLE) / 1000000.0 END AS logsurv_r
FROM steps
"""


REGISTRY["life_table_retention"] = {
    "fn": life_table_retention,
    "sql": _life_table_sql(),
}


# --------------------------------------------------------------------------
# Permutation entropy (order-3) of per-user value sequences — the
# standard model-free complexity measure for metric streams (low =
# trending/templated, ln 6 = white noise). Each user's consecutive
# value triples map to one of six ordinal patterns with the STABLE
# tie rule (equal values ordered by position, i.e. all comparisons
# are ≤), counted globally; H = Σ (c/T)·ln(T/c) with the portable ln,
# micro-quantized before the weighted sum (the entropy_by_source
# scheme). Scale: the triple windows are per-user (one shuffle on
# user_id); the entropy runs over a SIX-row pattern table.
# --------------------------------------------------------------------------


def _perm_final(div: str) -> list[str]:
    return [
        "pattern",
        "n_p",
        "n_triples",
        f"{_w2d('h_micro', div)}"
        " / (CAST(n_triples AS DOUBLE) * 1000000.0) AS perm_entropy",
    ]


def permutation_entropy_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import with_portable_ln

    ev = load_table(spark, sf_dir, "events")
    base = load_events_finite(spark, sf_dir).selectExpr(
        "user_id",
        "ts",
        "event_id",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trip = (
        base.withColumn("b", F.lead("v_c", 1).over(w))
        .withColumn("c", F.lead("v_c", 2).over(w))
        .filter(F.col("c").isNotNull())
        .selectExpr(
            "4 * CAST(v_c <= b AS BIGINT)"
            " + 2 * CAST(b <= c AS BIGINT)"
            " + CAST(v_c <= c AS BIGINT) AS pattern"
        )
    )
    pat = trip.groupBy("pattern").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_p")
    )
    tot = pat.agg(F.sum("n_p").cast("bigint").alias("n_triples"))
    j = pat.crossJoin(F.broadcast(tot))
    lned = with_portable_ln(j, "n_triples", "n_p", "__ln").selectExpr(
        "pattern",
        "n_p",
        "n_triples",
        "n_p * CAST(floor(__ln * 1000000.0 + 0.5) AS BIGINT) AS term",
    )
    h = lned.agg(
        F.sum(F.expr("CAST(term AS DECIMAL(38,0))")).alias("h_micro")
    )
    return (
        lned.crossJoin(F.broadcast(h))
        .selectExpr(*_perm_final("DIV"))
        .orderBy("pattern")
    )


def _perm_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
    )

    final = ",\n       ".join(_perm_final("//"))
    return f"""
WITH base AS (
  SELECT user_id, ts, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c
  FROM events
  WHERE value IS NOT NULL
),
trip AS (
  SELECT CAST(4 * CASE WHEN v_c <= b THEN 1 ELSE 0 END
         + 2 * CASE WHEN b <= c THEN 1 ELSE 0 END
         + CASE WHEN v_c <= c THEN 1 ELSE 0 END AS BIGINT) AS pattern
  FROM (
    SELECT v_c,
           LEAD(v_c, 1) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS b,
           LEAD(v_c, 2) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS c
    FROM base
  )
  WHERE c IS NOT NULL
),
pat AS (
  SELECT pattern, CAST(COUNT(*) AS BIGINT) AS n_p FROM trip GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_p) AS BIGINT) AS n_triples FROM pat),
j AS (SELECT * FROM pat CROSS JOIN tot),
{portable_ln_duck_ctes(
    "j", "pattern, n_p, n_triples", "n_triples", "n_p", "lnv", "pe")},
lned AS (
  SELECT pattern, n_p, n_triples,
         n_p * CAST(floor(lnv * 1000000.0 + 0.5) AS BIGINT) AS term
  FROM pe_out
),
h AS (SELECT SUM(term) AS h_micro FROM lned)
SELECT {final}
FROM lned CROSS JOIN h
ORDER BY pattern
"""


REGISTRY["permutation_entropy_events"] = {
    "fn": permutation_entropy_events,
    "sql": _perm_sql(),
}


# --------------------------------------------------------------------------
# Friedman test across event types blocked by calendar day — the
# repeated-measures k-sample test ("do the types' daily mean values
# rank consistently?") completing the rank-test family. Each day
# ranks its k types by mean value; the mean is an exact rational
# s/n whose CORRECTLY-ROUNDED double is engine-identical (s, n <
# 2^53), so ranking on (double, type) is deterministic both engines
# (ties broken by type name — ROW_NUMBER, not midranks, documented).
# χ²_F = 12/(nk(k+1))·ΣR_j² − 3n(k+1) from integer rank sums.
# Scale: one groupBy to the (day × type) table; the rank windows are
# k-row.
# --------------------------------------------------------------------------


def _friedman_final(div: str) -> list[str]:
    big = _big(div)
    return [
        "n_days",
        "k_types",
        f"12.0 * {_w2d(f'CAST(1 AS {big}) * r2_sum', div)}"
        " / (CAST(n_days AS DOUBLE) * CAST(k_types AS DOUBLE)"
        " * CAST(k_types + 1 AS DOUBLE))"
        " - 3.0 * CAST(n_days AS DOUBLE) * CAST(k_types + 1 AS DOUBLE)"
        " AS chi2_friedman",
    ]


def friedman_daily_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cell = (
        load_events_finite(spark, sf_dir)
        .filter(F.col("event_type").isNotNull())
        .groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        )
        .agg(
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100)
                .cast("bigint")
            ).alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .selectExpr(
            "day",
            "event_type",
            "CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m",
        )
    )
    # only complete blocks (every type present that day) keep the
    # test's k constant — the standard complete-block requirement
    ktot = cell.agg(
        F.countDistinct("event_type").cast("bigint").alias("k_types")
    )
    full = (
        cell.groupBy("day")
        .agg(F.count(F.lit(1)).alias("kd"))
        .join(F.broadcast(ktot), F.expr("kd = k_types"))
        .select("day")
    )
    wday = Window.partitionBy("day").orderBy("m", "event_type")
    ranked = (
        cell.join(full, "day")
        .withColumn("r", F.row_number().over(wday))
    )
    rsums = ranked.groupBy("event_type").agg(
        F.sum("r").cast("bigint").alias("r_j")
    )
    agg = (
        rsums.agg(
            F.sum(F.expr("CAST(r_j AS DECIMAL(38,0)) * r_j")).alias(
                "r2_sum"
            ),
            F.count(F.lit(1)).cast("bigint").alias("k_types"),
        )
        .crossJoin(
            F.broadcast(
                full.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
            )
        )
    )
    return agg.selectExpr(*_friedman_final("DIV"))


def _friedman_sql() -> str:
    final = ",\n       ".join(_friedman_final("//"))
    return f"""
WITH cell AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS m
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
ktot AS (
  SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k_types
  FROM cell
),
full_days AS (
  SELECT day FROM cell CROSS JOIN ktot
  GROUP BY day, k_types
  HAVING COUNT(*) = MAX(k_types)
),
ranked AS (
  SELECT c.event_type,
         ROW_NUMBER() OVER (PARTITION BY c.day
                            ORDER BY c.m, c.event_type) AS r
  FROM cell c JOIN full_days USING (day)
),
rsums AS (
  SELECT event_type, CAST(SUM(r) AS BIGINT) AS r_j
  FROM ranked GROUP BY 1
),
agg AS (
  SELECT SUM(CAST(r_j AS HUGEINT) * r_j) AS r2_sum,
         CAST(COUNT(*) AS BIGINT) AS k_types
  FROM rsums
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM full_days)
SELECT {final}
FROM agg CROSS JOIN nd
"""


REGISTRY["friedman_daily_value"] = {
    "fn": friedman_daily_value,
    "sql": _friedman_sql(),
}


# --------------------------------------------------------------------------
# Grubbs outlier statistic on event values: G = max|xᵢ − x̄|/s, with
# the arg-max event identified — the classic single-outlier screen a
# validation gate runs before fitting anything Gaussian. |n·xᵢ − S|
# is an exact integer per row (its max is an integer aggregate), the
# variance numerator n·Σx² − S² is 128-bit, and G is one fixed IEEE
# chain over wide_to_double conversions. The arg-max id is the
# deterministic (deviation DESC, event_id) leader via max_by on the
# integer pair. Scale: two scans (moments, then arg-max), no windows.
# --------------------------------------------------------------------------


def _grubbs_final(div: str) -> list[str]:
    return [
        "n_tot",
        "outlier_event_id",
        # s² = vnum/(n(n−1)) in cents² (vnum = n·Σx² − S²); the ×n in
        # max_dev = max|n·x − S| cancels against /n here
        f"({_w2d('max_dev', div)} / CAST(n_tot AS DOUBLE))"
        f" / NULLIF(sqrt({_w2d('vnum', div)}"
        " / NULLIF(CAST(n_tot AS DOUBLE)"
        " * CAST(n_tot - 1 AS DOUBLE), 0.0)), 0.0) AS grubbs_g",
    ]


def grubbs_value_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = load_events_finite(spark, sf_dir).selectExpr(
        "event_id",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x",
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tot"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("ss"),
    )
    dev = base.crossJoin(F.broadcast(mom)).selectExpr(
        "event_id",
        "n_tot",
        "s",
        "ss",
        "abs(CAST(n_tot AS DECIMAL(38,0)) * x - s) AS d",
    )
    agg = dev.groupBy("n_tot", "s", "ss").agg(
        F.max("d").alias("max_dev"),
        F.expr(
            "max_by(event_id, named_struct('d', d, 'neg_id',"
            " -event_id))"
        ).alias("outlier_event_id"),
    )
    return agg.selectExpr(
        "n_tot",
        "outlier_event_id",
        "max_dev",
        "CAST(n_tot AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0))"
        " * s AS _vn",
    ).selectExpr(
        "n_tot",
        "outlier_event_id",
        "max_dev",
        "_vn AS vnum",
    ).selectExpr(*_grubbs_final("DIV"))


def _grubbs_sql() -> str:
    final = ",\n       ".join(_grubbs_final("//"))
    return f"""
WITH base AS (
  SELECT event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM events
  WHERE value IS NOT NULL
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tot,
         CAST(SUM(x) AS BIGINT) AS s,
         SUM(CAST(x AS HUGEINT) * x) AS ss
  FROM base
),
dev AS (
  SELECT event_id, n_tot, s, ss,
         abs(CAST(n_tot AS HUGEINT) * x - s) AS d
  FROM base CROSS JOIN mom
),
agg AS (
  SELECT n_tot, s, ss, MAX(d) AS max_dev
  FROM dev GROUP BY 1, 2, 3
),
-- DuckDB's arg_max has no struct tie-break; pick the smallest id
-- among the arg-max rows in a second pass (same semantics as the
-- Spark side's max_by over the (d, -event_id) pair)
winner AS (
  SELECT MIN(dev.event_id) AS outlier_event_id
  FROM dev JOIN agg ON dev.d = agg.max_dev
)
SELECT {final}
FROM (
  SELECT n_tot, outlier_event_id, max_dev,
         CAST(n_tot AS HUGEINT) * ss - CAST(s AS HUGEINT) * s AS vnum
  FROM agg CROSS JOIN winner
)
"""


REGISTRY["grubbs_value_events"] = {
    "fn": grubbs_value_events,
    "sql": _grubbs_sql(),
}


# --------------------------------------------------------------------------
# Cochran's Q across THREE deterministic document-quality rules
# (length ≥ 300 chars; ≥ 50 tokens; mean word length ≥ 4) — the
# k-rater extension of Cohen's κ: "do these labeling rules pass the
# same documents?". Q = k(k−1)·Σ_j(C_j − T/k)²·k / (k·T − Σ_i R_i²)
# in the standard form — computed here from exact integer column
# sums C_j, row sums R_i, and T, all 128-bit-safe, one IEEE tail.
# Scale: map-only flags + two integer aggregates.
# --------------------------------------------------------------------------


def _cochran_final(div: str) -> list[str]:
    big = _big(div)
    # Q = (k-1)·(k·ΣC² − T²) / (k·T − ΣR²)
    num = f"3 * (CAST(1 AS {big}) * c2_sum) - CAST(t AS {big}) * t"
    den = f"3 * CAST(t AS {big}) - r2_sum"
    return [
        "n_docs",
        "c1",
        "c2",
        "c3",
        # NULLIF: unanimous raters (every doc passes all three rules or
        # none) zero the denominator — ANSI DIVIDE_BY_ZERO on Spark; Q
        # is undefined there, NULL on both engines (round-14 empty-text
        # parity probe)
        f"2.0 * {_w2d(num, div)}"
        f" / NULLIF({_w2d(den, div)}, 0.0) AS cochran_q",
    ]


def cochran_q_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # CASE ... ELSE 0, not CAST(cond AS BIGINT): a NULL-field doc must
    # FAIL each rule (0) on both engines — bare CAST keeps NULL where
    # the oracle's CASE maps it to 0 (round-14 nulldocs parity sweep)
    flags = docs.selectExpr(
        "CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS f1",
        "CASE WHEN size(split(text, ' ')) >= 50 THEN 1 ELSE 0 END AS f2",
        "CASE WHEN n_chars >= 4 * size(split(text, ' '))"
        " THEN 1 ELSE 0 END AS f3",
    ).selectExpr("f1", "f2", "f3", "f1 + f2 + f3 AS r")
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("f1").cast("bigint").alias("c1"),
        F.sum("f2").cast("bigint").alias("c2"),
        F.sum("f3").cast("bigint").alias("c3"),
        F.sum("r").cast("bigint").alias("t"),
        F.sum(F.expr("CAST(r AS DECIMAL(38,0)) * r")).alias("r2_sum"),
    )
    staged = agg.selectExpr(
        "n_docs",
        "c1",
        "c2",
        "c3",
        "t",
        "r2_sum",
        "CAST(c1 AS DECIMAL(38,0)) * c1 + CAST(c2 AS DECIMAL(38,0))"
        " * c2 + CAST(c3 AS DECIMAL(38,0)) * c3 AS c2_sum",
    )
    return staged.selectExpr(*_cochran_final("DIV"))


def _cochran_sql() -> str:
    final = ",\n       ".join(_cochran_final("//"))
    return f"""
WITH flags AS (
  SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS f1,
         CASE WHEN len(string_split(text, ' ')) >= 50 THEN 1 ELSE 0 END
           AS f2,
         CASE WHEN n_chars >= 4 * len(string_split(text, ' '))
              THEN 1 ELSE 0 END AS f3
  FROM documents
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(f1) AS BIGINT) AS c1,
         CAST(SUM(f2) AS BIGINT) AS c2,
         CAST(SUM(f3) AS BIGINT) AS c3,
         CAST(SUM(f1 + f2 + f3) AS BIGINT) AS t,
         SUM(CAST(f1 + f2 + f3 AS HUGEINT) * (f1 + f2 + f3)) AS r2_sum
  FROM flags
),
staged AS (
  SELECT n_docs, c1, c2, c3, t, r2_sum,
         CAST(c1 AS HUGEINT) * c1 + CAST(c2 AS HUGEINT) * c2
           + CAST(c3 AS HUGEINT) * c3 AS c2_sum
  FROM agg
)
SELECT {final}
FROM staged
"""


REGISTRY["cochran_q_docs"] = {
    "fn": cochran_q_docs,
    "sql": _cochran_sql(),
}


# --------------------------------------------------------------------------
# McNemar's test on the paired document-quality annotators from the
# Cohen's-κ entry (rule A: n_chars ≥ 300; rule B: ≥ 50 tokens) — the
# paired "did the rules disagree SYMMETRICALLY" test that κ does not
# answer. χ² = (b−c)²/(b+c) plus the continuity-corrected
# (|b−c|−1)²/(b+c), both single divisions of exact integers.
# Scale: map-only flags + one 4-cell aggregate.
# --------------------------------------------------------------------------


def _mcnemar_final(div: str) -> list[str]:
    big = _big(div)
    return [
        "n_docs",
        "b_only_a",
        "c_only_b",
        f"{_w2d(f'CAST(b_only_a - c_only_b AS {big}) * (b_only_a - c_only_b)', div)}"
        " / NULLIF(CAST(b_only_a + c_only_b AS DOUBLE), 0.0)"
        " AS chi2_mcnemar",
        f"{_w2d(f'CAST(abs(b_only_a - c_only_b) - 1 AS {big}) * (abs(b_only_a - c_only_b) - 1)', div)}"
        " / NULLIF(CAST(b_only_a + c_only_b AS DOUBLE), 0.0)"
        " AS chi2_cc",
    ]


def mcnemar_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # CASE ... ELSE 0: NULL-field docs fail each rule on both engines
    # (round-14 nulldocs parity sweep; see cochran_q_docs above)
    flags = docs.selectExpr(
        "CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ra",
        "CASE WHEN size(split(text, ' ')) >= 50 THEN 1 ELSE 0 END AS rb",
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.expr("CAST(ra = 1 AND rb = 0 AS BIGINT)"))
        .cast("bigint")
        .alias("b_only_a"),
        F.sum(F.expr("CAST(ra = 0 AND rb = 1 AS BIGINT)"))
        .cast("bigint")
        .alias("c_only_b"),
    )
    return agg.selectExpr(*_mcnemar_final("DIV"))


def _mcnemar_sql() -> str:
    final = ",\n       ".join(_mcnemar_final("//"))
    return f"""
WITH flags AS (
  SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ra,
         CASE WHEN len(string_split(text, ' ')) >= 50 THEN 1 ELSE 0 END
           AS rb
  FROM documents
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS b_only_a,
         CAST(SUM(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c_only_b
  FROM flags
)
SELECT {final}
FROM agg
"""


REGISTRY["mcnemar_docs"] = {
    "fn": mcnemar_docs,
    "sql": _mcnemar_sql(),
}


# --------------------------------------------------------------------------
# Jonckheere-Terpstra test for an ORDERED shift across event types
# (lexicographic type order as the a-priori ordering, documented) —
# JT = Σ_{i<j} [#(x_i < x_j) + ½#(=)], assembled from the SAME
# pairwise midrank-U machinery as mann_whitney_value: per ordered
# pair, the "later type beats earlier" doubled mass is
# 2·nₐ·n_b − U₂(a beats b). The null mean uses the exact marginals;
# the z denominator uses the standard no-ties JT variance
# [N²(2N+3) − Σnᵢ²(2nᵢ+3)]/72 (documented approximation — the value
# histogram has ties but the tie correction is O(tie³/N³) here).
# Scale: identical to mann_whitney (histogram windows per pair).
# --------------------------------------------------------------------------


def _jt_final(div: str) -> list[str]:
    big = _big(div)
    # Hollander-Wolfe tie-corrected JT variance (round-9b upgrade from
    # the no-ties form — the cents histogram DOES tie):
    #   A/72 + B₁B₂/(36·N(N−1)(N−2)) + C₁C₂/(8·N(N−1)),
    # A = N(N−1)(2N+5) − Σnᵢ(nᵢ−1)(2nᵢ+5) − Σtⱼ(tⱼ−1)(2tⱼ+5)
    a_wide = (
        f"CAST(n_tot AS {big}) * (n_tot - 1) * (2 * n_tot + 5)"
        " - sum_nv5 - sum_tv5"
    )
    nd = "CAST(n_tot AS DOUBLE)"
    var = (
        f"({_w2d(a_wide, div)} / 72.0"
        f" + ({_w2d('sum_n3', div)} * {_w2d('sum_t3', div)})"
        f" / NULLIF(36.0 * {nd} * CAST(n_tot - 1 AS DOUBLE)"
        f" * CAST(n_tot - 2 AS DOUBLE), 0.0)"
        f" + ({_w2d('sum_n1', div)} * {_w2d('sum_t1', div)})"
        f" / NULLIF(8.0 * {nd} * CAST(n_tot - 1 AS DOUBLE), 0.0))"
    )
    return [
        "n_tot",
        "jt2",
        "e2",
        f"(CAST(jt2 - e2 AS DOUBLE) / 2.0)"
        f" / NULLIF(sqrt({var}), 0.0) AS z_jt",
    ]


def jonckheere_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = (
        load_events_finite(spark, sf_dir)
        .filter(F.col("event_type").isNotNull())
        .groupBy(
            "event_type",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v_c"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    types = counts.select("event_type").distinct()
    pairs = (
        types.alias("ta")
        .crossJoin(types.alias("tb"))
        .filter(F.col("ta.event_type") < F.col("tb.event_type"))
        .select(
            F.col("ta.event_type").alias("type_a"),
            F.col("tb.event_type").alias("type_b"),
        )
    )
    memb = pairs.selectExpr(
        "type_a",
        "type_b",
        "explode(array(named_struct('et', type_a, 'is_a', 1),"
        " named_struct('et', type_b, 'is_a', 0))) AS m",
    ).selectExpr("m.et AS event_type", "type_a", "type_b", "m.is_a")
    member = counts.join(F.broadcast(memb), "event_type").select(
        "type_a",
        "type_b",
        "v_c",
        (F.col("cnt") * F.col("is_a")).alias("cnt_a"),
        (F.col("cnt") * (1 - F.col("is_a"))).alias("cnt_b"),
    )
    byval = member.groupBy("type_a", "type_b", "v_c").agg(
        F.sum("cnt_a").alias("a_n"),
        F.sum("cnt_b").alias("b_n"),
    )
    wcum = (
        Window.partitionBy("type_a", "type_b")
        .orderBy("v_c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # doubled "b beats a" mass per pair: Σ_v b_n·(2·#a<v + a_n_at_v)
    ranked = byval.withColumn(
        "cum_a", F.sum("a_n").over(wcum)
    ).selectExpr(
        "type_a",
        "type_b",
        "a_n",
        "b_n",
        "CAST(b_n AS DECIMAL(38,0)) * (2 * (cum_a - a_n) + a_n)"
        " AS u2_term",
    )
    per_pair = ranked.groupBy("type_a", "type_b").agg(
        F.sum("u2_term").alias("u2_ba")
    )
    jt = per_pair.agg(F.sum("u2_ba").alias("jt2_w"))
    marg = counts.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n_i")
    )
    mtot = marg.agg(
        F.sum("n_i").cast("bigint").alias("n_tot"),
        F.sum(F.expr("CAST(n_i AS DECIMAL(38,0)) * n_i")).alias(
            "sum_n2"
        ),
        F.sum(
            F.expr(
                "CAST(n_i AS DECIMAL(38,0)) * (n_i - 1)"
                " * (2 * n_i + 5)"
            )
        ).alias("sum_nv5"),
        F.sum(
            F.expr(
                "CAST(n_i AS DECIMAL(38,0)) * (n_i - 1) * (n_i - 2)"
            )
        ).alias("sum_n3"),
        F.sum(F.expr("CAST(n_i AS DECIMAL(38,0)) * (n_i - 1)")).alias(
            "sum_n1"
        ),
    )
    pooled = counts.groupBy("v_c").agg(
        F.sum("cnt").cast("bigint").alias("t_j")
    )
    ttot = pooled.agg(
        F.sum(
            F.expr(
                "CAST(t_j AS DECIMAL(38,0)) * (t_j - 1)"
                " * (2 * t_j + 5)"
            )
        ).alias("sum_tv5"),
        F.sum(
            F.expr(
                "CAST(t_j AS DECIMAL(38,0)) * (t_j - 1) * (t_j - 2)"
            )
        ).alias("sum_t3"),
        F.sum(F.expr("CAST(t_j AS DECIMAL(38,0)) * (t_j - 1)")).alias(
            "sum_t1"
        ),
    )
    agg = (
        jt.crossJoin(F.broadcast(mtot))
        .crossJoin(F.broadcast(ttot))
    ).selectExpr(
        "n_tot",
        "sum_nv5",
        "sum_n3",
        "sum_n1",
        "sum_tv5",
        "sum_t3",
        "sum_t1",
        "CAST(jt2_w AS BIGINT) AS jt2",
        # E[2·JT] = (N² − Σnᵢ²)/2
        "CAST((CAST(n_tot AS DECIMAL(38,0)) * n_tot - sum_n2) / 2"
        " AS BIGINT) AS e2",
    )
    return agg.selectExpr(*_jt_final("DIV"))


def _jt_sql() -> str:
    final = ",\n       ".join(_jt_final("//"))
    return f"""
WITH counts AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         COUNT(*) AS cnt
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM counts),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM types a CROSS JOIN types b
  WHERE a.event_type < b.event_type
),
member AS (
  SELECT p.type_a, p.type_b, c.v_c,
         CASE WHEN c.event_type = p.type_a THEN c.cnt ELSE 0 END
           AS cnt_a,
         CASE WHEN c.event_type = p.type_b THEN c.cnt ELSE 0 END
           AS cnt_b
  FROM counts c JOIN pairs p
    ON c.event_type = p.type_a OR c.event_type = p.type_b
),
byval AS (
  SELECT type_a, type_b, v_c,
         SUM(cnt_a) AS a_n, SUM(cnt_b) AS b_n
  FROM member GROUP BY 1, 2, 3
),
ranked AS (
  SELECT type_a, type_b, a_n, b_n,
         CAST(b_n AS HUGEINT)
           * (2 * (SUM(a_n) OVER (PARTITION BY type_a, type_b
                ORDER BY v_c ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) - a_n) + a_n) AS u2_term
  FROM byval
),
jt AS (
  SELECT SUM(u2_term) AS jt2_w FROM ranked
),
marg AS (
  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_i
  FROM counts GROUP BY 1
),
mtot AS (
  SELECT CAST(SUM(n_i) AS BIGINT) AS n_tot,
         SUM(CAST(n_i AS HUGEINT) * n_i) AS sum_n2,
         SUM(CAST(n_i AS HUGEINT) * (n_i - 1) * (2 * n_i + 5))
           AS sum_nv5,
         SUM(CAST(n_i AS HUGEINT) * (n_i - 1) * (n_i - 2)) AS sum_n3,
         SUM(CAST(n_i AS HUGEINT) * (n_i - 1)) AS sum_n1
  FROM marg
),
pooled AS (
  SELECT v_c, CAST(SUM(cnt) AS BIGINT) AS t_j FROM counts GROUP BY 1
),
ttot AS (
  SELECT SUM(CAST(t_j AS HUGEINT) * (t_j - 1) * (2 * t_j + 5))
           AS sum_tv5,
         SUM(CAST(t_j AS HUGEINT) * (t_j - 1) * (t_j - 2)) AS sum_t3,
         SUM(CAST(t_j AS HUGEINT) * (t_j - 1)) AS sum_t1
  FROM pooled
),
agg AS (
  SELECT n_tot, sum_nv5, sum_n3, sum_n1, sum_tv5, sum_t3, sum_t1,
         CAST(jt2_w AS BIGINT) AS jt2,
         CAST((CAST(n_tot AS HUGEINT) * n_tot - sum_n2) // 2
              AS BIGINT) AS e2
  FROM jt CROSS JOIN mtot CROSS JOIN ttot
)
SELECT {final}
FROM agg
"""


REGISTRY["jonckheere_value"] = {
    "fn": jonckheere_value,
    "sql": _jt_sql(),
}


# --------------------------------------------------------------------------
# Cochran-Armitage trend test: does the purchase rate trend
# monotonically across the ordered $50 value buckets? χ²_trend =
# N·(N·Σs·g − G·Σs·n)² / (G·(N−G)·(N·Σs²·n − (Σs·n)²)) with integer
# bucket scores s — every factor an exact 128-bit integer, one
# wide_to_double ratio. (Bound: the squared numerator needs
# N·(N·Σsg)² < 10³⁸ — holds to ~10⁸ rows per grading partition;
# beyond that, pre-scale the scores.) Scale: one groupBy to the
# bucket table.
# --------------------------------------------------------------------------


def _ca_final(div: str) -> list[str]:
    big = _big(div)
    tnum = f"CAST(n_tot AS {big}) * sg - CAST(g_tot AS {big}) * sn"
    return [
        "n_tot",
        "g_tot",
        f"{_w2d(f'CAST(n_tot AS {big}) * ({tnum}) * ({tnum})', div)}"
        f" / NULLIF({_w2d(f'CAST(g_tot AS {big}) * (n_tot - g_tot)', div)}"
        f" * {_w2d(f'CAST(n_tot AS {big}) * ssn - CAST(sn AS {big}) * sn', div)}"
        " / CAST(n_tot AS DOUBLE), 0.0) AS chi2_trend",
    ]


def cochran_armitage_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per = (
        load_events_finite(spark, sf_dir)
        .filter(F.col("event_type").isNotNull())
        .selectExpr(
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 5000 AS s",
            "CAST(event_type = 'purchase' AS BIGINT) AS is_pos",
        )
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("is_pos").cast("bigint").alias("g"),
        )
    )
    agg = per.agg(
        F.sum("n").cast("bigint").alias("n_tot"),
        F.sum("g").cast("bigint").alias("g_tot"),
        F.sum(F.expr("s * g")).cast("bigint").alias("sg"),
        F.sum(F.expr("s * n")).cast("bigint").alias("sn"),
        F.sum(F.expr("CAST(s AS DECIMAL(38,0)) * s * n")).alias("ssn"),
    )
    return agg.selectExpr(*_ca_final("DIV"))


def _ca_sql() -> str:
    final = ",\n       ".join(_ca_final("//"))
    return f"""
WITH per AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 5000
           AS s,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS g
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
),
agg AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
         CAST(SUM(g) AS BIGINT) AS g_tot,
         CAST(SUM(s * g) AS BIGINT) AS sg,
         CAST(SUM(s * n) AS BIGINT) AS sn,
         SUM(CAST(s AS HUGEINT) * s * n) AS ssn
  FROM per
)
SELECT {final}
FROM agg
"""


REGISTRY["cochran_armitage_trend"] = {
    "fn": cochran_armitage_trend,
    "sql": _ca_sql(),
}


# --------------------------------------------------------------------------
# Inter-arrival burstiness per event type: B = (σ−μ)/(σ+μ) of the
# micro-second gaps between consecutive events of the same type
# (Goh-Barabási; B = 0 Poisson, → 1 bursty, → −1 regular) — the
# arrival-process companion to fano_burstiness's count view. Gaps are
# exact integer micros over the per-type (ts, event_id) order,
# assembled WITHOUT a per-type single-partition LAG: the distributed
# grouped rank (operators/rank.py) assigns positions and consecutive
# positions meet by an equi-join (the runs_test adjacency pattern).
# μ and σ come from exact 128-bit gap moments; B is one IEEE chain.
# --------------------------------------------------------------------------


def _burst_final(div: str) -> list[str]:
    big = _big(div)
    vnum = f"CAST(n_g AS {big}) * ss - CAST(s AS {big}) * s"
    mu = "(CAST(s AS DOUBLE) / CAST(n_g AS DOUBLE))"
    # NULLIF degenerate guards: a type with a single gap has no sd
    # dof; a type whose events share one timestamp has sd = mu = 0
    sd = (
        f"sqrt({_w2d(vnum, div)} / NULLIF(CAST(n_g AS DOUBLE)"
        " * CAST(n_g - 1 AS DOUBLE), 0.0))"
    )
    return [
        "event_type",
        "n_g AS n_gaps",
        f"{mu} AS mean_gap_us",
        f"{sd} AS sd_gap_us",
        f"({sd} - {mu}) / NULLIF({sd} + {mu}, 0.0) AS burstiness",
    ]


def interarrival_burstiness_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.rank import with_grouped_rank

    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isNotNull()).selectExpr(
        "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS t_us",
        "event_id",
    )
    pos = with_grouped_rank(
        base, ["event_type"], ["t_us", "event_id"], out_col="pos"
    ).select("event_type", "pos", "t_us")
    nxt = pos.selectExpr(
        "event_type", "pos - 1 AS pos", "t_us AS t_next"
    )
    gaps = pos.join(nxt, ["event_type", "pos"]).selectExpr(
        "event_type", "t_next - t_us AS gap"
    )
    mom = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("gap").cast("bigint").alias("s"),
        F.sum(F.expr("CAST(gap AS DECIMAL(38,0)) * gap")).alias("ss"),
    )
    return mom.selectExpr(*_burst_final("DIV")).orderBy("event_type")


def _interarrival_sql() -> str:
    final = ",\n       ".join(_burst_final("//"))
    return f"""
WITH base AS (
  SELECT event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
         event_id
  FROM events
  WHERE event_type IS NOT NULL
),
pos AS (
  SELECT event_type, t_us,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY t_us, event_id) AS pos
  FROM base
),
gaps AS (
  SELECT a.event_type, b.t_us - a.t_us AS gap
  FROM pos a JOIN pos b
    ON a.event_type = b.event_type AND b.pos = a.pos + 1
),
mom AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(gap) AS BIGINT) AS s,
         SUM(CAST(gap AS HUGEINT) * gap) AS ss
  FROM gaps GROUP BY 1
)
SELECT {final}
FROM mom
ORDER BY event_type
"""


REGISTRY["interarrival_burstiness_events"] = {
    "fn": interarrival_burstiness_events,
    "sql": _interarrival_sql(),
}


# --------------------------------------------------------------------------
# Mann-Kendall trend test on the daily event-count series — the
# standard nonparametric "is traffic trending" monitor (pairs with
# theil_sen's slope ESTIMATE; this is the TEST). S = Σᵢ<ⱼ sign(cⱼ−cᵢ)
# over the calendar-bounded daily series (the pair join is days², a
# fixed-size frame at any corpus scale), the variance carries the
# tie correction Σ t(t−1)(2t+5), and z applies the ±1 continuity
# correction. All integers until one wide_to_double tail.
# --------------------------------------------------------------------------


def _mk_final(div: str) -> list[str]:
    big = _big(div)
    var18 = (
        f"CAST(n_days AS {big}) * (n_days - 1) * (2 * n_days + 5)"
        " - tie_sum"
    )
    z = (
        "CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)"
        " WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)"
        " ELSE 0.0 END"
    )
    return [
        "n_days",
        "s_stat",
        f"({z}) / NULLIF(sqrt({_w2d(var18, div)} / 18.0), 0.0)"
        " AS z_mk",
    ]


def mann_kendall_daily_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    a = daily.selectExpr("day AS da", "c AS ca")
    b = daily.selectExpr("day AS db", "c AS cb")
    pairs = a.join(F.broadcast(b), F.expr("da < db"))
    s = pairs.agg(
        F.sum(F.expr("CAST(cb > ca AS BIGINT) - CAST(cb < ca AS BIGINT)"))
        .cast("bigint")
        .alias("s_stat")
    )
    ties = (
        daily.groupBy("c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5)"
                )
            ).alias("tie_sum")
        )
    )
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    agg = s.crossJoin(F.broadcast(ties)).crossJoin(F.broadcast(n))
    return agg.selectExpr(*_mk_final("DIV"))


def _mk_sql() -> str:
    final = ",\n       ".join(_mk_final("//"))
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
s AS (
  SELECT CAST(SUM(CASE WHEN b.c > a.c THEN 1
                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM daily a JOIN daily b ON a.day < b.day
),
ties AS (
  SELECT SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS tie_sum
  FROM (SELECT c, CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY 1)
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
SELECT {final}
FROM s CROSS JOIN ties CROSS JOIN n
"""


REGISTRY["mann_kendall_daily_events"] = {
    "fn": mann_kendall_daily_events,
    "sql": _mk_sql(),
}


# --------------------------------------------------------------------------
# Turning-point test for serial randomness of `value` along the
# global (ts, event_id) order: count positions that are strict local
# extrema of their (prev, cur, next) triple; under i.i.d. the
# expectation is 2(n−2)/3 with variance (16n−29)/90. The triple
# adjacency is assembled from the distributed global rank
# (operators/rank.py) with TWO shifted equi-joins — the runs_test
# pattern one hop longer, no single-partition LAG anywhere. Ties
# (non-strict neighbors) simply don't count as turning points
# (documented convention). One IEEE tail for z.
# --------------------------------------------------------------------------


def _tp_final(div: str) -> list[str]:
    return [
        "n_tot",
        "n_turning",
        "(CAST(n_turning AS DOUBLE)"
        " - 2.0 * CAST(n_tot - 2 AS DOUBLE) / 3.0)"
        " / sqrt((16.0 * CAST(n_tot AS DOUBLE) - 29.0) / 90.0)"
        " AS z_turning",
    ]


def turning_points_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.rank import with_global_rank

    ev = load_table(spark, sf_dir, "events")
    base = load_events_finite(spark, sf_dir).selectExpr(
        "ts",
        "event_id",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v",
    )
    ranked = with_global_rank(
        base, ["ts", "event_id"], out_col="pos"
    ).select("pos", "v")
    nxt1 = ranked.selectExpr("pos - 1 AS pos", "v AS v1")
    nxt2 = ranked.selectExpr("pos - 2 AS pos", "v AS v2")
    trip = ranked.join(nxt1, "pos").join(nxt2, "pos")
    agg = trip.agg(
        F.sum(
            F.expr(
                "CAST((v1 > v AND v1 > v2) OR (v1 < v AND v1 < v2)"
                " AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("n_turning"),
        (F.count(F.lit(1)) + 2).cast("bigint").alias("n_tot"),
    )
    return agg.selectExpr(*_tp_final("DIV"))


def _tp_sql() -> str:
    final = ",\n       ".join(_tp_final("//"))
    return f"""
WITH base AS (
  SELECT ts, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM events
  WHERE value IS NOT NULL
),
seq AS (
  SELECT v,
         LEAD(v, 1) OVER (ORDER BY ts, event_id) AS v1,
         LEAD(v, 2) OVER (ORDER BY ts, event_id) AS v2
  FROM base
),
agg AS (
  SELECT CAST(SUM(CASE WHEN (v1 > v AND v1 > v2)
                         OR (v1 < v AND v1 < v2)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_turning,
         CAST(COUNT(*) + 2 AS BIGINT) AS n_tot
  FROM seq
  WHERE v2 IS NOT NULL
)
SELECT {final}
FROM agg
"""


REGISTRY["turning_points_value"] = {
    "fn": turning_points_value,
    "sql": _tp_sql(),
}


# --------------------------------------------------------------------------
# Bartlett's test for variance homogeneity across event types — the
# PARAMETRIC sibling of Brown-Forsythe above (sensitive to
# non-normality, which is exactly why both belong in the battery).
# χ² = [(N−k)·ln s_p² − Σ(nᵢ−1)·ln sᵢ²] / C,
# C = 1 + (Σ1/(nᵢ−1) − 1/(N−k)) / (3(k−1)).
# Every variance is an exact integer rational vnumᵢ/(nᵢ(nᵢ−1))
# (vnum = n·Σx² − (Σx)², cents²), so each ln splits into TWO portable
# lns of integers, micro-quantized and weight-summed in exact
# integers; the 1/(nᵢ−1) harmonic terms are half-up micro integers.
# Scale: one groupBy to the k-row moment table.
# --------------------------------------------------------------------------


def _bartlett_tail(div: str) -> list[str]:
    return [
        "k_groups",
        "n_tot",
        # numerator micro-int: (N−k)·ln_sp_u − Σ(nᵢ−1)·ln_si_u;
        # C from micro harmonic terms — all converted once
        f"({_w2d('chi_num_u', div)} / 1000000.0)"
        " / NULLIF(1.0 + (CAST(h_sum_u AS DOUBLE) / 1000000.0"
        " - 1000000.0 / NULLIF(CAST((n_tot - k_groups) AS DOUBLE), 0.0)"
        " / 1000000.0)"
        " / NULLIF(3.0 * CAST(k_groups - 1 AS DOUBLE), 0.0), 0.0)"
        " AS chi2_bartlett",
    ]


def bartlett_value_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import with_portable_ln

    ev = load_table(spark, sf_dir, "events")
    counts = (
        load_events_finite(spark, sf_dir)
        .filter(F.col("event_type").isNotNull())
        .groupBy(
            "event_type",
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v_c"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per = counts.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.expr("v_c * cnt")).cast("bigint").alias("s"),
        F.sum(F.expr("CAST(v_c AS DECIMAL(38,0)) * v_c * cnt")).alias(
            "ss"
        ),
    ).selectExpr(
        "event_type",
        "n",
        "CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s"
        " AS vnum",
    )
    # ln sᵢ² = ln(vnumᵢ) − ln(nᵢ(nᵢ−1)); both integers ≥ 1
    li = with_portable_ln(per, "vnum", "1", "__lnv")
    li = with_portable_ln(
        li, "CAST(n AS DECIMAL(38,0)) * (n - 1)", "1", "__lnd"
    ).selectExpr(
        "n",
        "vnum",
        "CAST(floor((__lnv - __lnd) * 1000000.0 + 0.5) AS BIGINT)"
        " AS ln_si_u",
        # half-up micro of 1/(n−1)
        "CAST((2 * 1000000 + (n - 1)) DIV NULLIF(2 * (n - 1), 0)"
        " AS BIGINT)"
        " AS h_u",
    )
    tot = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        F.sum("n").cast("bigint").alias("n_tot"),
        F.sum("vnum").alias("vnum_tot_raw"),
        F.sum(
            F.expr("CAST(n - 1 AS DECIMAL(38,0)) * ln_si_u")
        ).alias("wsum_u"),
        F.sum("h_u").cast("bigint").alias("h_sum_u"),
    )
    # pooled s_p² = Σ(nᵢ−1)sᵢ² / (N−k) — but Σ(nᵢ−1)sᵢ² =
    # Σ vnumᵢ/nᵢ needs per-group division; carry it exactly with the
    # micro-quantized per-group terms instead: sp2_num_u below
    sp = li.selectExpr(
        f"{_whd('vnum', 'n', 'DIV')} AS sp_term"
    ).agg(F.sum("sp_term").alias("sp2_num"))
    j = tot.crossJoin(F.broadcast(sp))
    lp = with_portable_ln(j, "sp2_num", "1", "__lnp")
    lp = with_portable_ln(
        lp, "CAST(n_tot - k_groups AS DECIMAL(38,0))", "1", "__lnq"
    ).selectExpr(
        "k_groups",
        "n_tot",
        "h_sum_u",
        "wsum_u",
        "CAST(floor((__lnp - __lnq) * 1000000.0 + 0.5) AS BIGINT)"
        " AS ln_sp_u",
    )
    staged = lp.selectExpr(
        "k_groups",
        "n_tot",
        "h_sum_u",
        "CAST(n_tot - k_groups AS DECIMAL(38,0)) * ln_sp_u - wsum_u"
        " AS chi_num_u",
    )
    return staged.selectExpr(*_bartlett_tail("DIV"))


def _bartlett_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
    )

    tail = ",\n       ".join(_bartlett_tail("//"))
    ln1 = portable_ln_duck_ctes(
        "per", "event_type, n, vnum", "vnum", "1", "lnv", "b1"
    )
    ln2 = portable_ln_duck_ctes(
        "b1_out", "event_type, n, vnum, lnv",
        "CAST(n AS HUGEINT) * (n - 1)", "1", "lnd", "b2",
    )
    ln3 = portable_ln_duck_ctes(
        "j", "k_groups, n_tot, h_sum_u, wsum_u, sp2_num",
        "sp2_num", "1", "lnp", "b3",
    )
    ln4 = portable_ln_duck_ctes(
        "b3_out", "k_groups, n_tot, h_sum_u, wsum_u, lnp",
        "CAST(n_tot - k_groups AS HUGEINT)", "1", "lnq", "b4",
    )
    return f"""
WITH counts AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         COUNT(*) AS cnt
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
per AS (
  SELECT event_type,
         CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(cnt) AS HUGEINT)
           * SUM(CAST(v_c AS HUGEINT) * v_c * cnt)
           - CAST(CAST(SUM(v_c * cnt) AS BIGINT) AS HUGEINT)
           * CAST(SUM(v_c * cnt) AS BIGINT) AS vnum
  FROM counts GROUP BY 1
),
{ln1},
{ln2},
li AS (
  SELECT n, vnum,
         CAST(floor((lnv - lnd) * 1000000.0 + 0.5) AS BIGINT)
           AS ln_si_u,
         CAST((2 * 1000000 + (n - 1)) // (2 * (n - 1)) AS BIGINT)
           AS h_u
  FROM b2_out
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
         CAST(SUM(n) AS BIGINT) AS n_tot,
         SUM(CAST(n - 1 AS HUGEINT) * ln_si_u) AS wsum_u,
         CAST(SUM(h_u) AS BIGINT) AS h_sum_u
  FROM li
),
sp AS (
  SELECT SUM({_whd('vnum', 'n', '//')}) AS sp2_num FROM li
),
j AS (SELECT * FROM tot CROSS JOIN sp),
{ln3},
{ln4},
staged AS (
  SELECT k_groups, n_tot, h_sum_u,
         CAST(floor((lnp - lnq) * 1000000.0 + 0.5) AS BIGINT)
           AS ln_sp_u,
         wsum_u
  FROM b4_out
)
SELECT {tail}
FROM (
  SELECT k_groups, n_tot, h_sum_u,
         CAST(n_tot - k_groups AS HUGEINT) * ln_sp_u - wsum_u
           AS chi_num_u
  FROM staged
)
"""


REGISTRY["bartlett_value_types"] = {
    "fn": bartlett_value_types,
    "sql": _bartlett_sql(),
}


# --------------------------------------------------------------------------
# Jarque-Bera normality test on `value`: JB = n/6·(S² + (K−3)²/4)
# from exact integer central moments. Values are ANCHOR-CENTERED
# (x − ⌊mean⌉ in cents) on the VALUE HISTOGRAM — centering shrinks
# Σx' to ≤ n/2, so the cross terms in the central-moment expansions
# stay small and the whole computation is exact through n ≈ 9·10⁷ at
# cents scale (the n²·Σx'³ term hits DECIMAL(38) there; each 10×
# coarsening of the unit buys ~10⁴× headroom — the documented
# scale-up knob). The n-powers cancel inside skew = m3n/m2n^{3/2}
# and kurt = m4n/m2n², so only the integer numerators convert
# through wide_to_double. Scale: two histogram aggregates.
# --------------------------------------------------------------------------


def _jb_tail(div: str) -> list[str]:
    skew = (
        f"({_w2d('m3n', div)}"
        f" / NULLIF({_w2d('m2n', div)} * sqrt({_w2d('m2n', div)}), 0.0))"
    )
    kurt = (
        f"({_w2d('m4n', div)}"
        f" / NULLIF({_w2d('m2n', div)} * {_w2d('m2n', div)}, 0.0))"
    )
    return [
        "n_tot",
        f"{skew} AS skewness",
        f"{kurt} AS kurtosis",
        f"CAST(n_tot AS DOUBLE) / 6.0 * ({skew} * {skew}"
        f" + ({kurt} - 3.0) * ({kurt} - 3.0) / 4.0) AS jarque_bera",
    ]


def jarque_bera_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hist = (
        load_events_finite(spark, sf_dir)
        .groupBy(
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("v")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    anchor = hist.agg(
        F.sum("c").cast("bigint").alias("n_tot"),
        F.expr(
            "CAST((2 * SUM(v * c) + SUM(c)) DIV (2 * SUM(c))"
            " AS BIGINT)"
        ).alias("a"),
    )
    mom = (
        hist.crossJoin(F.broadcast(anchor))
        .selectExpr("n_tot", "c", "v - a AS x")
        .groupBy("n_tot")
        .agg(
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * c")).alias("s1"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x * c")).alias(
                "s2"
            ),
            F.sum(
                F.expr("CAST(x AS DECIMAL(38,0)) * x * x * c")
            ).alias("s3"),
            F.sum(
                F.expr("CAST(x AS DECIMAL(38,0)) * x * x * x * c")
            ).alias("s4"),
        )
    )
    staged = mom.selectExpr(
        "n_tot",
        "n_tot * s2 - s1 * s1 AS m2n",
        "CAST(n_tot AS DECIMAL(38,0)) * n_tot * s3"
        " - 3 * n_tot * s2 * s1 + 2 * s1 * s1 * s1 AS m3n",
        "CAST(n_tot AS DECIMAL(38,0)) * n_tot * n_tot * s4"
        " - 4 * CAST(n_tot AS DECIMAL(38,0)) * n_tot * s3 * s1"
        " + 6 * n_tot * s2 * s1 * s1"
        " - 3 * s1 * s1 * s1 * s1 AS m4n",
    )
    return staged.selectExpr(*_jb_tail("DIV"))


def _jb_sql() -> str:
    tail = ",\n       ".join(_jb_tail("//"))
    return f"""
WITH hist AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1
),
anchor AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_tot,
         CAST((2 * SUM(v * c) + SUM(c)) // (2 * SUM(c)) AS BIGINT)
           AS a
  FROM hist
),
mom AS (
  SELECT n_tot,
         SUM(CAST(v - a AS HUGEINT) * c) AS s1,
         SUM(CAST(v - a AS HUGEINT) * (v - a) * c) AS s2,
         SUM(CAST(v - a AS HUGEINT) * (v - a) * (v - a) * c) AS s3,
         SUM(CAST(v - a AS HUGEINT) * (v - a) * (v - a) * (v - a) * c)
           AS s4
  FROM hist CROSS JOIN anchor
  GROUP BY 1
),
staged AS (
  SELECT n_tot,
         n_tot * s2 - s1 * s1 AS m2n,
         CAST(n_tot AS HUGEINT) * n_tot * s3
           - 3 * n_tot * s2 * s1 + 2 * s1 * s1 * s1 AS m3n,
         CAST(n_tot AS HUGEINT) * n_tot * n_tot * s4
           - 4 * CAST(n_tot AS HUGEINT) * n_tot * s3 * s1
           + 6 * n_tot * s2 * s1 * s1
           - 3 * s1 * s1 * s1 * s1 AS m4n
  FROM mom
)
SELECT {tail}
FROM staged
"""


REGISTRY["jarque_bera_value"] = {
    "fn": jarque_bera_value,
    "sql": _jb_sql(),
}


# --------------------------------------------------------------------------
# Durbin-Watson statistic of the daily event-count series around its
# mean: d = Σ(eₜ − eₜ₋₁)² / Σeₜ² with eₜ = cₜ − c̄ — the classic
# first-order autocorrelation diagnostic on the traffic curve (d ≈ 2
# uncorrelated, → 0 positively autocorrelated). Mean-centering
# cancels inside both sums when carried ×n: numerator Σ(n·cₜ −
# n·cₜ₋₁)² and denominator Σ(n·cₜ − S)² are exact integers (the n²
# factors cancel in the ratio). The day-adjacency is a calendar-
# bounded self-join on day+1 (gaps break pairs — documented: the
# series is the OBSERVED consecutive-day sequence). One
# wide_to_double ratio.
# --------------------------------------------------------------------------


def _dw_tail(div: str) -> list[str]:
    return [
        "n_days",
        f"{_w2d('dnum', div)} / {_w2d('dden', div)} AS durbin_watson",
    ]


def durbin_watson_daily_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("c").cast("bigint").alias("s"),
    )
    j = daily.crossJoin(F.broadcast(tot))
    den = j.agg(
        F.sum(
            F.expr(
                "(CAST(n_days AS DECIMAL(38,0)) * c - s)"
                " * (CAST(n_days AS DECIMAL(38,0)) * c - s)"
            )
        ).alias("dden"),
        F.max("n_days").alias("n_days"),
    )
    nxt = daily.selectExpr("date_sub(day, 1) AS day", "c AS c_next")
    num = (
        daily.join(nxt, "day")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.expr(
                    "(CAST(n_days AS DECIMAL(38,0)) * c_next"
                    " - CAST(n_days AS DECIMAL(38,0)) * c)"
                    " * (CAST(n_days AS DECIMAL(38,0)) * c_next"
                    " - CAST(n_days AS DECIMAL(38,0)) * c)"
                )
            ).alias("dnum")
        )
    )
    agg = num.crossJoin(F.broadcast(den))
    return agg.selectExpr(*_dw_tail("DIV"))


def _dw_sql() -> str:
    tail = ",\n       ".join(_dw_tail("//"))
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(c) AS BIGINT) AS s
  FROM daily
),
den AS (
  SELECT SUM((CAST(n_days AS HUGEINT) * c - s)
             * (CAST(n_days AS HUGEINT) * c - s)) AS dden,
         MAX(n_days) AS n_days
  FROM daily CROSS JOIN tot
),
num AS (
  SELECT SUM((CAST(n_days AS HUGEINT) * b.c
              - CAST(n_days AS HUGEINT) * a.c)
             * (CAST(n_days AS HUGEINT) * b.c
                - CAST(n_days AS HUGEINT) * a.c)) AS dnum
  FROM daily a
  JOIN daily b ON b.day = a.day + INTERVAL 1 DAY
  CROSS JOIN tot
)
SELECT {tail}
FROM num CROSS JOIN den
"""


REGISTRY["durbin_watson_daily_events"] = {
    "fn": durbin_watson_daily_events,
    "sql": _dw_sql(),
}


# --------------------------------------------------------------------------
# G-test (likelihood-ratio χ²) of independence on the same
# event_type × day-of-week table as Cramér's V — the
# information-theoretic counterpart of Pearson's χ² (G = 2·Σ o·ln(o·N
# / (r·c)); additively decomposable where Pearson is not). Each ln is
# portable on the integer rational o·N vs r·c (max/min flip),
# micro-quantized and weighted by the integer o; empty cells
# contribute 0. One wide_to_double tail. Scale: one groupBy to the
# (k × 7) cell table.
# --------------------------------------------------------------------------


def _g_tail(div: str) -> list[str]:
    return [
        "n_tot",
        f"2.0 * {_w2d('g_num_u', div)} / 1000000.0 AS g_stat",
    ]


def g_test_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import with_portable_ln

    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.filter(F.col("event_type").isNotNull())
        .selectExpr(
            "event_type",
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') % 7"
            " AS BIGINT) AS dow",
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    rows = cells.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("r_i")
    )
    cols = cells.groupBy("dow").agg(
        F.sum("o").cast("bigint").alias("c_j")
    )
    n = cells.agg(F.sum("o").cast("bigint").alias("n_tot"))
    j = (
        cells.join(F.broadcast(rows), "event_type")
        .join(F.broadcast(cols), "dow")
        .crossJoin(F.broadcast(n))
        .selectExpr(
            "n_tot",
            "o",
            "CAST(o AS DECIMAL(38,0)) * n_tot AS num",
            "CAST(r_i AS DECIMAL(38,0)) * c_j AS den",
        )
    )
    lned = with_portable_ln(
        j,
        "CASE WHEN num >= den THEN num ELSE den END",
        "CASE WHEN num >= den THEN den ELSE num END",
        "__pln",
    ).selectExpr(
        "n_tot",
        "o * CAST(floor((CASE WHEN num >= den THEN __pln"
        " ELSE -__pln END) * 1000000.0 + 0.5) AS BIGINT) AS term",
    )
    agg = lned.groupBy("n_tot").agg(
        F.sum(F.expr("CAST(term AS DECIMAL(38,0))")).alias("g_num_u")
    )
    return agg.selectExpr(*_g_tail("DIV"))


def _g_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
    )

    tail = ",\n       ".join(_g_tail("//"))
    ln_ctes = portable_ln_duck_ctes(
        "j",
        "n_tot, o, num, den",
        "CASE WHEN num >= den THEN num ELSE den END",
        "CASE WHEN num >= den THEN den ELSE num END",
        "pln",
        "gt",
    )
    return f"""
WITH cells AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
              AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events
  WHERE event_type IS NOT NULL
  GROUP BY 1, 2
),
rws AS (
  SELECT event_type, CAST(SUM(o) AS BIGINT) AS r_i FROM cells GROUP BY 1
),
cls AS (
  SELECT dow, CAST(SUM(o) AS BIGINT) AS c_j FROM cells GROUP BY 1
),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS n_tot FROM cells),
j AS (
  SELECT n_tot, o,
         CAST(o AS HUGEINT) * n_tot AS num,
         CAST(r_i AS HUGEINT) * c_j AS den
  FROM cells JOIN rws USING (event_type) JOIN cls USING (dow)
  CROSS JOIN n
),
{ln_ctes},
lned AS (
  SELECT n_tot,
         o * CAST(floor((CASE WHEN num >= den THEN pln
             ELSE -pln END) * 1000000.0 + 0.5) AS BIGINT) AS term
  FROM gt_out
)
SELECT {tail}
FROM (
  SELECT n_tot, SUM(CAST(term AS HUGEINT)) AS g_num_u
  FROM lned GROUP BY 1
)
"""


REGISTRY["g_test_events"] = {
    "fn": g_test_events,
    "sql": _g_sql(),
}


# --------------------------------------------------------------------------
# Wilcoxon signed-rank test on PAIRED daily counts of 'view' vs
# 'click' — completing the nonparametric family (Mann-Whitney =
# unpaired two-sample, Kruskal-Wallis/Friedman = k-sample, this =
# paired two-sample). Zero differences drop (standard); |d| midranks
# come from the day-bounded difference histogram (×2-carried), W⁺ is
# an exact integer, and z uses the tie-corrected variance
# [n(n+1)(2n+1) − Σt(t²−1)/2] / 24 carried ×2. The whole spine is
# calendar-bounded. (Continuity correction omitted — documented.)
# --------------------------------------------------------------------------


def _wsr_tail(div: str) -> list[str]:
    big = _big(div)
    # 48·var(2W⁺) = 8·n(n+1)(2n+1) − 4·Σ(t³−t) ; z on the ×2 scale:
    # z = (2W⁺ − n(n+1)/2·... carried ×2: E[2W⁺] = n(n+1)/2
    var48 = (
        f"8 * CAST(n_nz AS {big}) * (n_nz + 1) * (2 * n_nz + 1)"
        " - 4 * tie3"
    )
    return [
        "n_nz",
        "w_plus_x2",
        f"(CAST(w_plus_x2 AS DOUBLE)"
        " - CAST(n_nz AS DOUBLE) * CAST(n_nz + 1 AS DOUBLE) / 2.0)"
        f" / sqrt({_w2d(var48, div)} / 48.0) AS z_wilcoxon",
    ]


def wilcoxon_signed_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.expr("CAST(event_type = 'view' AS BIGINT)"))
            .cast("bigint")
            .alias("nv"),
            F.sum(F.expr("CAST(event_type = 'click' AS BIGINT)"))
            .cast("bigint")
            .alias("nc"),
        )
        .selectExpr("day", "nv - nc AS d")
        .filter("d <> 0")
    )
    hist = daily.groupBy(F.expr("abs(d)").alias("ad")).agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.sum(F.expr("CAST(d > 0 AS BIGINT)"))
        .cast("bigint")
        .alias("pos"),
    )
    wcum = Window.orderBy("ad").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = hist.withColumn("cum", F.sum("t").over(wcum)).selectExpr(
        "t",
        "pos",
        "2 * (cum - t) + t + 1 AS r2x",
        "CAST(t AS DECIMAL(38,0)) * t * t - t AS t3",
    )
    agg = ranked.agg(
        F.sum("t").cast("bigint").alias("n_nz"),
        F.sum(F.expr("pos * r2x")).cast("bigint").alias("w_plus_x2"),
        F.sum("t3").alias("tie3"),
    )
    return agg.selectExpr(*_wsr_tail("DIV"))


def _wsr_sql() -> str:
    tail = ",\n       ".join(_wsr_tail("//"))
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT)
         - CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS d
  FROM events
  WHERE event_type IN ('view', 'click')
  GROUP BY 1
),
nz AS (SELECT d FROM daily WHERE d <> 0),
hist AS (
  SELECT abs(d) AS ad,
         CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM nz GROUP BY 1
),
ranked AS (
  SELECT t, pos,
         2 * (SUM(t) OVER (ORDER BY ad
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t)
           + t + 1 AS r2x,
         CAST(t AS HUGEINT) * t * t - t AS t3
  FROM hist
),
agg AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n_nz,
         CAST(SUM(pos * r2x) AS BIGINT) AS w_plus_x2,
         SUM(t3) AS tie3
  FROM ranked
)
SELECT {tail}
FROM agg
"""


REGISTRY["wilcoxon_signed_daily"] = {
    "fn": wilcoxon_signed_daily,
    "sql": _wsr_sql(),
}
