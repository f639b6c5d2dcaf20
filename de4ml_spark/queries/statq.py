"""Statistical-testing tier: the hypothesis tests and interval
estimates an experimentation / data-quality pipeline runs over event
logs — rank tests that don't assume normality, binomial intervals for
CTRs, and the product-limit (Kaplan-Meier) survival curve that
complements the Nelson-Aalen estimator in tsq2.py.

Reference parity: the reference's dataops loop computes profile-driven
validation statistics over landed batches (dataops/app/profile.py); a
drift decision between two cohorts needs exactly these tests. All
entries follow the catalog's cross-engine exactness discipline
(operators/portable_hash.py): integer/rational arithmetic end-to-end,
micro-quantized ln terms before any SUM, and ONLY whitelist result
types (BIGINT / DOUBLE / STRING) — no DECIMAL/HUGEINT result columns
(the driver's hasher rejects them; HUGEINT appears internally only).

Scale posture (100 TB): every entry reduces the raw log with one
groupBy before any pairwise/window work — the post-reduction frames
are value-histogram- or calendar-bounded, so window functions run over
tiny partitions regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.session import load_events_finite, load_table

REGISTRY: dict = {}

from de4ml_spark.operators.portable_hash import (
    wide_halfup_div_sql as _whd,
    wide_to_double_sql as _w2d,
)



# --------------------------------------------------------------------------
# Pairwise Mann-Whitney U over event values: for every unordered pair
# of event types, the rank-sum test on `value` — the standard
# nonparametric "did the value distribution shift" test between
# cohorts. Exactness: values are 2-decimal doubles, quantized to cents
# through DECIMAL(18,2) (exact); ranks are computed on the per-value
# HISTOGRAM (groupBy value → counts), never per-row, so the windowed
# cumulative runs over ≤ distinct-values rows per pair. Ties use
# midranks; everything is carried ×2 so midranks stay integer
# (2·avgrank = 2·minrank + cnt − 1). U and the tie-corrected variance
# are exact integers (variance numerator in 128-bit internal
# arithmetic: DECIMAL(38,0) on Spark, HUGEINT in DuckDB — internal
# only); z is then a chain of correctly-rounded IEEE ops on
# bit-identical inputs (cast / divide / sqrt), hence engine-identical.
# Scale: one groupBy over the log; the pair expansion multiplies the
# histogram (not the log) by (k-1) for k event types.
# --------------------------------------------------------------------------


def mann_whitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shared per-pair cum-histogram frame (operators/pairhist.py): the
    # union cum is the sum of the precomputed side cums, so the entry
    # is one groupBy over the persisted histogram-bounded scan.
    from de4ml_spark.operators.pairhist import pair_value_histogram

    ranked = pair_value_histogram(spark, sf_dir).selectExpr(
        "type_a",
        "type_b",
        "a_n AS n_a_v",
        "a_n + b_n AS n_all_v",
        # 2 x midrank of the tied block at this value; pooled cum_prev
        # = (cum_a - a_n) + (cum_b - b_n)
        "2 * (cum_a + cum_b - a_n - b_n) + (a_n + b_n) + 1 AS r2x",
    )
    agg = ranked.groupBy("type_a", "type_b").agg(
        F.sum(F.col("n_a_v") * F.col("r2x")).alias("r1_2x"),
        F.sum("n_a_v").alias("n_a"),
        F.sum(F.col("n_all_v") - F.col("n_a_v")).alias("n_b"),
        # tie term in 128-bit: a single cent value repeated > 2^21
        # times would wrap an int64 cube
        F.sum(
            F.expr(
                "CAST(n_all_v AS DECIMAL(38,0)) * n_all_v * n_all_v"
                " - n_all_v"
            )
        ).alias("tie_sum"),
    )
    return agg.selectExpr(
        "type_a",
        "type_b",
        "CAST(n_a AS BIGINT) AS n_a",
        "CAST(n_b AS BIGINT) AS n_b",
        "CAST(r1_2x - n_a * (n_a + 1) AS BIGINT) AS u_a_x2",
        "CAST(tie_sum AS BIGINT) AS tie_sum",
        "CAST(r1_2x - n_a * (n_a + 1) AS DOUBLE)"
        " - CAST(n_a * n_b AS DOUBLE) AS _znum",
        # var(U)·(12·n·(n-1)) = n_a·n_b·((n+1)·n·(n-1) − tie_sum):
        # project the 128-bit numerator ONCE, convert in the next stage
        "CAST(n_a AS DECIMAL(38,0)) * n_b *"
        " ((n_a + n_b + 1) * CAST(n_a + n_b AS DECIMAL(38,0))"
        " * (n_a + n_b - 1) - tie_sum) AS _varnum_w",
        "CAST(12 * (n_a + n_b) * (n_a + n_b - 1) AS DOUBLE) AS _varden",
    ).selectExpr(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        "u_a_x2",
        "tie_sum",
        "_znum",
        # portable chunked conversion (DuckDB's hugeint->double is not
        # correctly rounded above 2^63)
        _w2d("_varnum_w", "DIV") + " AS _varnum",
        "_varden",
    ).selectExpr(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        "u_a_x2",
        "tie_sum",
        "CASE WHEN _varnum = 0.0D THEN NULL"
        " ELSE _znum / (2.0D * sqrt(_varnum / _varden)) END AS z",
    )


MANN_WHITNEY_SQL = """
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
  SELECT ta.event_type AS type_a, tb.event_type AS type_b
  FROM types ta CROSS JOIN types tb
  WHERE ta.event_type < tb.event_type
),
member AS (
  SELECT p.type_a, p.type_b, c.v_c,
         CASE WHEN c.event_type = p.type_a THEN c.cnt ELSE 0 END AS cnt_a,
         c.cnt AS cnt_all
  FROM counts c
  JOIN pairs p
    ON c.event_type = p.type_a OR c.event_type = p.type_b
),
byval AS (
  SELECT type_a, type_b, v_c,
         SUM(cnt_a) AS n_a_v, SUM(cnt_all) AS n_all_v
  FROM member GROUP BY 1, 2, 3
),
ranked AS (
  SELECT type_a, type_b, n_a_v, n_all_v,
         2 * (SUM(n_all_v) OVER (PARTITION BY type_a, type_b ORDER BY v_c
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_all_v) + n_all_v + 1 AS r2x
  FROM byval
),
agg AS (
  SELECT type_a, type_b,
         SUM(n_a_v * r2x) AS r1_2x,
         SUM(n_a_v) AS n_a,
         SUM(n_all_v - n_a_v) AS n_b,
         SUM(CAST(n_all_v AS HUGEINT) * n_all_v * n_all_v - n_all_v)
           AS tie_sum
  FROM ranked GROUP BY 1, 2
),
projected AS (
  SELECT type_a, type_b,
         CAST(n_a AS BIGINT) AS n_a,
         CAST(n_b AS BIGINT) AS n_b,
         CAST(r1_2x - n_a * (n_a + 1) AS BIGINT) AS u_a_x2,
         CAST(tie_sum AS BIGINT) AS tie_sum,
         CAST(r1_2x - n_a * (n_a + 1) AS DOUBLE)
           - CAST(n_a * n_b AS DOUBLE) AS znum,
         CAST(n_a AS HUGEINT) * n_b *
           ((n_a + n_b + 1) * CAST(n_a + n_b AS HUGEINT)
            * (n_a + n_b - 1) - tie_sum) AS varnum_w,
         CAST(12 * (n_a + n_b) * (n_a + n_b - 1) AS DOUBLE) AS varden
  FROM agg
),
wide AS (
  SELECT type_a, type_b, n_a, n_b, u_a_x2, tie_sum, znum,
         {MW_VARNUM_DUCK} AS varnum,
         varden
  FROM projected
)
SELECT type_a, type_b, n_a, n_b, u_a_x2, tie_sum,
       CASE WHEN varnum = 0.0 THEN NULL
            ELSE znum / (2.0 * sqrt(varnum / varden)) END AS z
FROM wide
"""

REGISTRY["mann_whitney_value"] = {
    "fn": mann_whitney_value,
    "sql": MANN_WHITNEY_SQL.replace(
        "{MW_VARNUM_DUCK}", _w2d("varnum_w", "//")
    ),
}


# --------------------------------------------------------------------------
# Agresti-Coull ("plus-4") CTR interval per user decile: clicks /
# (clicks + views) with the z=2 adjusted interval. z=2 (the 95.45%
# normal quantile) is chosen over 1.96 deliberately: it is EXACTLY
# representable, so the whole interval is a short chain of
# correctly-rounded IEEE ops on exact integers — p~ = (s+2)/(n+4) is
# one exact-integer division, the sqrt argument is
# (s+2)(n+2-s)/(n+4)^3 (one division of exact int64 products), and the
# bounds are p~ ± 2·sqrt(...) (multiply-by-2 exact, one add). The
# point estimate is also emitted half-up-rounded to 6dp via pure
# integer arithmetic. Scale: one groupBy over the log, 10 output rows.
# --------------------------------------------------------------------------


def plus4_ctr_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .filter(F.col("user_id").isNotNull())
        .groupBy((F.col("user_id") % 10).alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("s"),
        )
    )
    return agg.selectExpr(
        "decile",
        "CAST(n AS BIGINT) AS n",
        "CAST(s AS BIGINT) AS s",
        f"{exact_round_div_sql('(s + 2)', '(n + 4)', 'DIV')} AS p_adj_r",
        "CAST(s + 2 AS DOUBLE) / CAST(n + 4 AS DOUBLE) AS _pd",
        "sqrt(CAST((s + 2) * (n + 2 - s) AS DOUBLE)"
        " / CAST((n + 4) * (n + 4) * (n + 4) AS DOUBLE)) AS _sd",
    ).selectExpr(
        "decile",
        "n",
        "s",
        "p_adj_r",
        "_pd - 2.0D * _sd AS lo",
        "_pd + 2.0D * _sd AS hi",
    )


def _plus4_sql() -> str:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    return f"""
WITH agg AS (
  SELECT user_id % 10 AS decile,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS s
  FROM events
  WHERE event_type IN ('click', 'view') AND user_id IS NOT NULL
  GROUP BY 1
),
d AS (
  SELECT decile, n, s,
         {exact_round_div_sql('(s + 2)', '(n + 4)', '//')} AS p_adj_r,
         CAST(s + 2 AS DOUBLE) / CAST(n + 4 AS DOUBLE) AS pd,
         sqrt(CAST((s + 2) * (n + 2 - s) AS DOUBLE)
              / CAST((n + 4) * (n + 4) * (n + 4) AS DOUBLE)) AS sd
  FROM agg
)
SELECT decile, n, s, p_adj_r,
       pd - 2.0 * sd AS lo,
       pd + 2.0 * sd AS hi
FROM d
"""


REGISTRY["plus4_ctr_bounds"] = {
    "fn": plus4_ctr_bounds,
    "sql": _plus4_sql(),
}


# --------------------------------------------------------------------------
# Kaplan-Meier product-limit survival curve over user lifetimes — the
# product-form sibling of nelson_aalen_retention (tsq2.py): same
# right-censoring spine (a user whose span reaches the corpus horizon
# is censored), but estimating S(t) = prod over steps of (1 - d/n).
# Exactness: the product is carried in LOG space — each step's
# -ln(S-factor) = ln(n/(n-d)) comes from the portable-ln primitive
# (bit-identical across engines), is half-up micro-quantized to an
# integer, and the cumulative is an integer running sum over the
# calendar-bounded duration spine (doubles are never SUMmed). A
# d = n step (every remaining at-risk user churns: survival hits
# exactly 0, log-survival −inf) can occur on real data — e.g. a
# churned early starter holding the maximum duration — and it is
# necessarily the LAST spine row (no user survives past it); it is
# KEPT, with NULL negln/cum/logsurv marking the −inf, so the spine
# matches Nelson-Aalen's row-for-row (which reports hazard 1 there).
# Scale: one groupBy to per-user spans; everything after is bounded by
# the calendar window.
# --------------------------------------------------------------------------


def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        "datediff(d1, d0) AS dur",
        "datediff(hmax, d0) AS obs",
        "CAST(d1 < hmax AS INT) AS churned",
    )
    at_risk = (
        per_user.selectExpr(
            "churned", "dur", "explode(sequence(0, least(dur, obs))) AS t"
        )
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("n_risk"),
            F.expr(
                "CAST(SUM(CASE WHEN churned = 1 AND dur = t THEN 1 ELSE 0"
                " END) AS BIGINT)"
            ).alias("d_churn"),
        )
    )
    stepped = with_portable_ln(
        at_risk, "n_risk", "GREATEST(n_risk - d_churn, 1)", "__ln"
    )
    steps = stepped.selectExpr(
        "t",
        "n_risk",
        "d_churn",
        "CASE WHEN n_risk = d_churn THEN NULL"
        " ELSE CAST(floor(__ln * 1000000.0 + 0.5) AS BIGINT) END"
        " AS negln_micro",
    )
    wc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return steps.select(
        "t",
        "n_risk",
        "d_churn",
        "negln_micro",
        # a NULL (terminal) step is provably last — mask, don't skip
        F.expr(
            "CASE WHEN negln_micro IS NULL THEN NULL ELSE"
            " CAST(SUM(negln_micro) OVER (ORDER BY t ROWS BETWEEN"
            " UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) END"
        ).alias("cum_negln_micro"),
    ).withColumn(
        "logsurv_r",
        F.expr("-CAST(cum_negln_micro AS DOUBLE) / 1000000.0"),
    )


def _km_sql() -> str:
    from de4ml_spark.operators.portable_hash import portable_ln_duck_ctes

    return f"""
WITH spans AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
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
{portable_ln_duck_ctes(
    "at_risk", "t, n_risk, d_churn",
    "n_risk", "GREATEST(n_risk - d_churn, 1)", "lnv", "pl")},
steps AS (
  SELECT t, n_risk, d_churn,
         CASE WHEN n_risk = d_churn THEN NULL
              ELSE CAST(floor(lnv * 1000000.0 + 0.5) AS BIGINT) END
           AS negln_micro
  FROM pl_out
)
SELECT t, n_risk, d_churn, negln_micro,
       CASE WHEN negln_micro IS NULL THEN NULL ELSE
       CAST(SUM(negln_micro) OVER (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       END AS cum_negln_micro,
       CASE WHEN negln_micro IS NULL THEN NULL ELSE
       -CAST(CAST(SUM(negln_micro) OVER (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS DOUBLE) / 1000000.0 END AS logsurv_r
FROM steps
"""


REGISTRY["kaplan_meier_retention"] = {
    "fn": kaplan_meier_retention,
    "sql": _km_sql(),
}


# --------------------------------------------------------------------------
# Multi-touch attribution over the event log: every purchase
# distributes credit across the same user's click/view touches in the
# preceding 7 days, under three standard models at once — linear
# (equal split), first-touch, last-touch. Credit is integer ppm per
# purchase (the linear split uses exact half-up integer rounding, so a
# purchase's credits sum to 1e6 ± a deterministic remainder), and the
# report aggregates ppm by touch type × model — integer sums, exact
# everywhere. Scale: the touch lookup is an equi-join on user_id with
# a range predicate — both sides shuffle once on user_id and the
# per-user slice is bounded; no theta join against the full log.
# --------------------------------------------------------------------------

ATTR_WINDOW_DAYS = 7


def attribution_credit_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql_wide,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("touch_type"),
        F.col("event_id").alias("t_id"),
        F.col("ts").alias("t_ts"),
    )
    j = buys.join(touches, F.col("b_user") == F.col("t_user")).filter(
        (F.col("t_ts") <= F.col("b_ts"))
        & (
            F.col("t_ts")
            >= F.col("b_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")
        )
    )
    wb = Window.partitionBy("b_id")
    wfirst = wb.orderBy("t_ts", "t_id")
    ranked = j.select(
        "b_id",
        "touch_type",
        F.count(F.lit(1)).over(wb).alias("n_touch"),
        F.row_number().over(wfirst).alias("pos"),
    )
    credits = ranked.selectExpr(
        "touch_type",
        "CAST((2 * 1000000 + n_touch) DIV (2 * n_touch) AS BIGINT)"
        " AS linear_ppm",
        "CASE WHEN pos = 1 THEN 1000000 ELSE 0 END AS first_ppm",
        "CASE WHEN pos = n_touch THEN 1000000 ELSE 0 END AS last_ppm",
    )
    out = credits.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum("linear_ppm").cast("bigint").alias("linear_credit_ppm"),
        F.sum("first_ppm").cast("bigint").alias("first_credit_ppm"),
        F.sum("last_ppm").cast("bigint").alias("last_credit_ppm"),
    )
    tot = out.agg(
        F.sum("linear_credit_ppm").alias("lin_tot")
    )
    return out.crossJoin(F.broadcast(tot)).selectExpr(
        "touch_type",
        "CAST(n_touches AS BIGINT) AS n_touches",
        "linear_credit_ppm",
        "first_credit_ppm",
        "last_credit_ppm",
        f"{exact_round_div_sql_wide('linear_credit_ppm', 'lin_tot', 'DIV')}"
        " AS linear_share_r",
    )


def _attribution_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql_wide,
    )

    return f"""
WITH buys AS (
  SELECT user_id AS b_user, event_id AS b_id, ts AS b_ts
  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
),
touches AS (
  SELECT user_id AS t_user, event_type AS touch_type,
         event_id AS t_id, ts AS t_ts
  FROM events
  WHERE event_type IN ('click', 'view') AND user_id IS NOT NULL
),
j AS (
  SELECT b.b_id, t.touch_type, t.t_ts, t.t_id
  FROM buys b
  JOIN touches t ON b.b_user = t.t_user
  WHERE t.t_ts <= b.b_ts
    AND t.t_ts >= b.b_ts - INTERVAL {ATTR_WINDOW_DAYS} DAY
),
ranked AS (
  SELECT b_id, touch_type,
         COUNT(*) OVER (PARTITION BY b_id) AS n_touch,
         ROW_NUMBER() OVER (PARTITION BY b_id ORDER BY t_ts, t_id) AS pos
  FROM j
),
credits AS (
  SELECT touch_type,
         CAST((2 * 1000000 + n_touch) // (2 * n_touch) AS BIGINT)
           AS linear_ppm,
         CASE WHEN pos = 1 THEN 1000000 ELSE 0 END AS first_ppm,
         CASE WHEN pos = n_touch THEN 1000000 ELSE 0 END AS last_ppm
  FROM ranked
),
out3 AS (
  SELECT touch_type,
         CAST(COUNT(*) AS BIGINT) AS n_touches,
         CAST(SUM(linear_ppm) AS BIGINT) AS linear_credit_ppm,
         CAST(SUM(first_ppm) AS BIGINT) AS first_credit_ppm,
         CAST(SUM(last_ppm) AS BIGINT) AS last_credit_ppm
  FROM credits GROUP BY 1
),
tot AS (SELECT CAST(SUM(linear_credit_ppm) AS BIGINT) AS lin_tot FROM out3)
SELECT touch_type, n_touches, linear_credit_ppm,
       first_credit_ppm, last_credit_ppm,
       {exact_round_div_sql_wide('linear_credit_ppm', 'lin_tot', '//')}
         AS linear_share_r
FROM out3 CROSS JOIN tot
"""


REGISTRY["attribution_credit_events"] = {
    "fn": attribution_credit_events,
    "sql": _attribution_sql(),
}


# --------------------------------------------------------------------------
# MASE forecast evaluation of the seasonal-naive model: per event type,
# forecast each day's total as the SAME WEEKDAY LAST WEEK (lag 7) and
# scale its MAE by the one-day-naive MAE (lag 1) — the standard
# scale-free forecast-accuracy metric (Hyndman-Koehler). Both error
# sums are exact integer cents over the same eval days (days where
# both lags exist and are calendar-adjacent, checked with datediff, so
# a gap day invalidates the lag instead of silently comparing across
# it); MASE < 1 ⇔ weekly seasonality beats persistence. The ratio is
# one exact half-up rounding of BIGINT sums (equal eval sets make the
# n's cancel). Scale: one groupBy to the per-(type, day) frame;
# windows run inside tiny per-type partitions.
# --------------------------------------------------------------------------


def mase_seasonal_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql_wide,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("_v")
    ).selectExpr(
        "event_type", "day", "CAST(_v * 100 AS BIGINT) AS v_c"
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "day",
        "v_c",
        F.lag("v_c", 1).over(w).alias("v1"),
        F.lag("day", 1).over(w).alias("d1"),
        F.lag("v_c", 7).over(w).alias("v7"),
        F.lag("day", 7).over(w).alias("d7"),
    ).filter(
        "v1 IS NOT NULL AND v7 IS NOT NULL"
        " AND datediff(day, d1) = 1 AND datediff(day, d7) = 7"
    )
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.abs(F.col("v_c") - F.col("v7")))
        .cast("bigint")
        .alias("sum_abs_err_c"),
        F.sum(F.abs(F.col("v_c") - F.col("v1")))
        .cast("bigint")
        .alias("sum_abs_naive_c"),
    ).selectExpr(
        "event_type",
        "n_days",
        "sum_abs_err_c",
        "sum_abs_naive_c",
        f"""CASE WHEN sum_abs_naive_c = 0 THEN NULL
            ELSE {exact_round_div_sql_wide(
                'sum_abs_err_c', 'sum_abs_naive_c', 'DIV'
            )} END AS mase_r""",
    )


def _mase_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql_wide,
    )

    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
              * 100 AS BIGINT) AS v_c
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, day, v_c,
         LAG(v_c, 1) OVER (PARTITION BY event_type ORDER BY day) AS v1,
         LAG(day, 1) OVER (PARTITION BY event_type ORDER BY day) AS d1,
         LAG(v_c, 7) OVER (PARTITION BY event_type ORDER BY day) AS v7,
         LAG(day, 7) OVER (PARTITION BY event_type ORDER BY day) AS d7
  FROM daily
),
ok AS (
  SELECT * FROM lagged
  WHERE v1 IS NOT NULL AND v7 IS NOT NULL
    AND datediff('day', d1, day) = 1 AND datediff('day', d7, day) = 7
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(ABS(v_c - v7)) AS BIGINT) AS sum_abs_err_c,
       CAST(SUM(ABS(v_c - v1)) AS BIGINT) AS sum_abs_naive_c,
       CASE WHEN CAST(SUM(ABS(v_c - v1)) AS BIGINT) = 0 THEN NULL
            ELSE {exact_round_div_sql_wide(
                'CAST(SUM(ABS(v_c - v7)) AS BIGINT)',
                'CAST(SUM(ABS(v_c - v1)) AS BIGINT)', '//'
            )} END AS mase_r
FROM ok GROUP BY 1
"""


REGISTRY["mase_seasonal_events"] = {
    "fn": mase_seasonal_events,
    "sql": _mase_sql(),
}


# --------------------------------------------------------------------------
# Split-conformal prediction bound per event type: train a point
# predictor on the first half of the month (per-type mean value,
# exact-half-up cents), take absolute residuals on the held-out
# calibration half, and report the ceil(0.9·(n+1))-th smallest
# residual — the distribution-free 90% conformal radius (Vovk; the
# finite-sample (n+1) correction included). A type whose calibration
# half is too small for the rank to exist (n_calib + 1 < 10) has NO
# finite distribution-free bound and is OMITTED from the result —
# deliberate, not a dropped row; likewise a type with no training
# rows has no predictor to calibrate. Rank selection uses a
# deterministic (residual, event_id) order so ties cannot flip the
# bound between engines; empirical coverage on the calibration split
# is reported as an exact rational. Scale: one groupBy for the means,
# one per-type window rank over calibration rows only.
# --------------------------------------------------------------------------

CONF_SPLIT_DAY = 16
CONF_LEVEL_NUM = 9  # 0.9 coverage as an exact rational 9/10
CONF_LEVEL_DEN = 10


def conformal_bound_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    ev = load_events_finite(spark, sf_dir)
    cents = ev.selectExpr(
        "event_type",
        "event_id",
        "dayofmonth(ts) AS dom",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c",
    )
    train = cents.filter(F.col("dom") < CONF_SPLIT_DAY)
    pred = train.groupBy("event_type").agg(
        F.expr(
            "CAST((2 * SUM(v_c) + COUNT(*)) DIV (2 * COUNT(*)) AS BIGINT)"
        ).alias("pred_c")
    )
    calib = (
        cents.filter(F.col("dom") >= CONF_SPLIT_DAY)
        .join(F.broadcast(pred), "event_type")
        .selectExpr(
            "event_type", "event_id", "pred_c",
            "ABS(v_c - pred_c) AS resid_c",
        )
    )
    wr = Window.partitionBy("event_type").orderBy("resid_c", "event_id")
    ranked = calib.select(
        "event_type",
        "pred_c",
        "resid_c",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n_calib"),
    )
    bound = ranked.filter(
        F.expr(
            f"rk = CAST(((n_calib + 1) * {CONF_LEVEL_NUM}"
            f" + {CONF_LEVEL_DEN} - 1) DIV {CONF_LEVEL_DEN} AS INT)"
        )
    ).selectExpr(
        "event_type",
        "pred_c",
        "CAST(n_calib AS BIGINT) AS n_calib",
        "resid_c AS bound_c",
    )
    covered = (
        calib.join(F.broadcast(bound.select("event_type", "bound_c")),
                   "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.expr("CAST(resid_c <= bound_c AS BIGINT)")
            ).alias("n_within")
        )
    )
    return bound.join(covered, "event_type").selectExpr(
        "event_type",
        "n_calib",
        "pred_c",
        "bound_c",
        "CAST(n_within AS BIGINT) AS n_within",
        f"{exact_round_div_sql('n_within', 'n_calib', 'DIV')}"
        " AS coverage_r",
    )


def _conformal_sql() -> str:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    return f"""
WITH cents AS (
  SELECT event_type, event_id, date_part('day', ts) AS dom,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c
  FROM events WHERE value IS NOT NULL
),
pred AS (
  SELECT event_type,
         CAST((2 * SUM(v_c) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
           AS pred_c
  FROM cents WHERE dom < {CONF_SPLIT_DAY} GROUP BY 1
),
calib AS (
  SELECT c.event_type, c.event_id, p.pred_c,
         ABS(c.v_c - p.pred_c) AS resid_c
  FROM cents c JOIN pred p USING (event_type)
  WHERE c.dom >= {CONF_SPLIT_DAY}
),
ranked AS (
  SELECT event_type, pred_c, resid_c,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY resid_c, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n_calib
  FROM calib
),
bound AS (
  SELECT event_type, pred_c,
         CAST(n_calib AS BIGINT) AS n_calib,
         resid_c AS bound_c
  FROM ranked
  WHERE rk = CAST(((n_calib + 1) * {CONF_LEVEL_NUM}
                   + {CONF_LEVEL_DEN} - 1) // {CONF_LEVEL_DEN} AS INT)
),
covered AS (
  SELECT c.event_type,
         CAST(SUM(CASE WHEN c.resid_c <= b.bound_c THEN 1 ELSE 0 END)
              AS BIGINT) AS n_within
  FROM calib c JOIN bound b USING (event_type)
  GROUP BY 1
)
SELECT b.event_type, b.n_calib, b.pred_c, b.bound_c, v.n_within,
       {exact_round_div_sql('v.n_within', 'b.n_calib', '//')}
         AS coverage_r
FROM bound b JOIN covered v ON b.event_type = v.event_type
"""


REGISTRY["conformal_bound_events"] = {
    "fn": conformal_bound_events,
    "sql": _conformal_sql(),
}


# --------------------------------------------------------------------------
# Wald SPRT replay per user decile: the sequential probability-ratio
# test on the daily click-through record — H0: CTR = 1/4 vs
# H1: CTR = 1/3, alpha = beta = 0.05, replayed over the decile's daily
# (clicks, trials) series to find the first decision day. Everything
# is portable-exact: the per-day log-likelihood-ratio increment is
# x·ln(4/3) − (n−x)·ln(9/8) with both logs from the portable-ln
# primitive micro-quantized ONCE (driver-side constants via the same
# ln definition both oracles use — integer ratios 4/3, 9/8), the
# cumulative LLR is an integer running sum, and the barriers are
# ±ln(19) micro-quantized the same way ((1−β)/α = 19 exactly — the
# reason for choosing symmetric 5% errors). Decision = first day the
# cumulative exits the band; 'continue' if the series ends inside.
# Scale: one groupBy to per-(decile, day) counts; windows run over
# calendar-bounded partitions.
# --------------------------------------------------------------------------


def _sprt_consts() -> tuple[int, int, int]:
    """(ln(4/3), ln(9/8), ln 19) in half-up micros, via the SAME
    portable-ln definition the engines evaluate (driver-side replica)."""
    from de4ml_spark.operators.portable_hash import portable_ln_const

    def q(x: float) -> int:
        import math

        return math.floor(x * 1_000_000 + 0.5)

    return (
        q(portable_ln_const(4, 3)),
        q(portable_ln_const(9, 8)),
        q(portable_ln_const(19, 1)),
    )


def sprt_ctr_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ln43, ln98, ln19 = _sprt_consts()
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .filter(F.col("user_id").isNotNull())
        .groupBy(
            (F.col("user_id") % 10).alias("decile"),
            F.col("ts").cast("date").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("x"),
        )
    )
    wcum = (
        Window.partitionBy("decile")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = daily.select(
        "decile",
        "day",
        F.sum(
            F.expr(f"x * {ln43}L - (n - x) * {ln98}L")
        )
        .over(wcum)
        .alias("llr_micro"),
        F.row_number()
        .over(Window.partitionBy("decile").orderBy("day"))
        .alias("day_idx"),
    )
    crossed = cum.filter(
        (F.col("llr_micro") >= ln19) | (F.col("llr_micro") <= -ln19)
    )
    wfirst = Window.partitionBy("decile").orderBy("day")
    first = (
        crossed.withColumn("rk", F.row_number().over(wfirst))
        .filter("rk = 1")
        .selectExpr(
            "decile",
            "day AS decision_day",
            "day_idx AS n_days_used",
            "llr_micro",
            f"CASE WHEN llr_micro >= {ln19} THEN 'h1' ELSE 'h0' END"
            " AS decision",
        )
    )
    finals = (
        cum.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("decile").orderBy(F.desc("day"))
            ),
        )
        .filter("rk = 1")
        .selectExpr(
            "decile",
            "CAST(NULL AS DATE) AS decision_day",
            "day_idx AS n_days_used",
            "llr_micro",
            "'continue' AS decision",
        )
    )
    undecided = finals.join(
        first.select("decile"), "decile", "left_anti"
    )
    return first.unionByName(undecided).selectExpr(
        "CAST(decile AS BIGINT) AS decile",
        "decision_day",
        "CAST(n_days_used AS BIGINT) AS n_days_used",
        "CAST(llr_micro AS BIGINT) AS llr_micro",
        "decision",
    )


def _sprt_sql() -> str:
    ln43, ln98, ln19 = _sprt_consts()
    return f"""
WITH daily AS (
  SELECT user_id % 10 AS decile, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events
  WHERE event_type IN ('click', 'view') AND user_id IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT decile, day,
         CAST(SUM(x * {ln43} - (n - x) * {ln98})
           OVER (PARTITION BY decile ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS llr_micro,
         ROW_NUMBER() OVER (PARTITION BY decile ORDER BY day) AS day_idx
  FROM daily
),
first_cross AS (
  SELECT * FROM (
    SELECT decile, day AS decision_day, day_idx, llr_micro,
           CASE WHEN llr_micro >= {ln19} THEN 'h1' ELSE 'h0' END
             AS decision,
           ROW_NUMBER() OVER (PARTITION BY decile ORDER BY day) AS rk
    FROM cum
    WHERE llr_micro >= {ln19} OR llr_micro <= -{ln19}
  ) WHERE rk = 1
),
finals AS (
  SELECT * FROM (
    SELECT decile, CAST(NULL AS DATE) AS decision_day, day_idx,
           llr_micro, 'continue' AS decision,
           ROW_NUMBER() OVER (PARTITION BY decile ORDER BY day DESC)
             AS rk
    FROM cum
  ) WHERE rk = 1
)
SELECT CAST(decile AS BIGINT) AS decile, decision_day,
       CAST(day_idx AS BIGINT) AS n_days_used,
       CAST(llr_micro AS BIGINT) AS llr_micro, decision
FROM first_cross
UNION ALL
SELECT CAST(f.decile AS BIGINT), f.decision_day,
       CAST(f.day_idx AS BIGINT), f.llr_micro, f.decision
FROM finals f
WHERE NOT EXISTS (SELECT 1 FROM first_cross c WHERE c.decile = f.decile)
"""


REGISTRY["sprt_ctr_deciles"] = {
    "fn": sprt_ctr_deciles,
    "sql": _sprt_sql(),
}


# --------------------------------------------------------------------------
# Theil-Sen robust trend per event type: the median of all pairwise
# slopes of the daily totals — the estimator that shrugs off the
# outlier days that bend OLS (trend_by_event_type's companion; compare
# the two to spot leverage points). Each pairwise slope is ONE IEEE
# division of exact integers (cents over day-gap) — bit-identical both
# engines — and the median picks the ceil(m/2)-th slope under a total
# (slope, day_i, day_j) order, so ties cannot flip the answer. The
# pair fan-out is calendar×calendar per type (≤ ~500 rows/type at a
# month of days), built AFTER the log is reduced to daily totals —
# never pairwise in events.
# --------------------------------------------------------------------------


def theil_sen_trend_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.expr(
            "CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))"
            " AS DECIMAL(38,2)) * 100 AS BIGINT)"
        ).alias("v_c")
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .selectExpr(
            "a.event_type AS event_type",
            "a.day AS d1",
            "b.day AS d2",
            "CAST(b.v_c - a.v_c AS DOUBLE)"
            " / CAST(datediff(b.day, a.day) AS DOUBLE) AS slope",
        )
    )
    wr = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("m"),
    )
    return ranked.filter(
        F.expr("rk = CAST((m + 1) DIV 2 AS INT)")
    ).selectExpr(
        "event_type",
        "CAST(m AS BIGINT) AS n_pairs",
        "slope AS median_slope_r",
    )


THEIL_SEN_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
              * 100 AS BIGINT) AS v_c
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type, a.day AS d1, b.day AS d2,
         CAST(b.v_c - a.v_c AS DOUBLE)
           / CAST(datediff('day', a.day, b.day) AS DOUBLE) AS slope
  FROM daily a
  JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
),
ranked AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY slope, d1, d2) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS m
  FROM pairs
)
SELECT event_type,
       CAST(m AS BIGINT) AS n_pairs,
       slope AS median_slope_r
FROM ranked
WHERE rk = CAST((m + 1) // 2 AS INT)
"""

REGISTRY["theil_sen_trend_events"] = {
    "fn": theil_sen_trend_events,
    "sql": THEIL_SEN_SQL,
}


# --------------------------------------------------------------------------
# Isotonic calibration of the decile CTR curve: the nonparametric
# monotone fit (the calibration step behind isotonic-calibrated
# classifiers), computed via the exact MINIMAX characterization
# fit(i) = max_{j<=i} min_{k>=i} avg(s, j..k) instead of the
# sequential PAVA merge loop — on the B-bin reduced frame the (j,k)
# interval enumeration is B² rows, a pure join/groupBy DAG both
# engines evaluate identically (each interval average is ONE IEEE
# division of exact integer prefix sums; min/max of bit-identical
# doubles are bit-identical). This is the pattern for sequential
# algorithms with small state spaces: reduce the log first (one
# groupBy to B bins), then replace the loop with its closed-form over
# the bounded grid. Output: the observed decile rates and their
# isotonic (non-decreasing) fit.
# --------------------------------------------------------------------------

ISO_BINS = 10


def isotonic_ctr_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bins = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .filter(F.col("user_id").isNotNull())
        .groupBy(
            (F.col("user_id") % ISO_BINS).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("s"),
        )
    )
    wjs = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pre = bins.select(
        "bin",
        "n",
        "s",
        F.sum("n").over(wjs).alias("cn"),
        F.sum("s").over(wjs).alias("cs"),
    )
    lo = pre.selectExpr(
        "bin AS j", "cn - n AS cn0", "cs - s AS cs0"
    )
    hi = pre.selectExpr("bin AS k", "cn AS cn1", "cs AS cs1")
    intervals = lo.crossJoin(hi).filter("j <= k").selectExpr(
        "j",
        "k",
        "CAST(cs1 - cs0 AS DOUBLE) / CAST(cn1 - cn0 AS DOUBLE)"
        " AS avg_jk",
    )
    grid = (
        bins.select(F.col("bin").alias("i"))
        .join(intervals, F.expr("j <= i AND i <= k"))
    )
    inner = grid.groupBy("i", "j").agg(
        F.min("avg_jk").alias("min_k")
    )
    fit = inner.groupBy("i").agg(F.max("min_k").alias("iso_rate"))
    return (
        bins.join(fit, bins.bin == fit.i)
        .selectExpr(
            "CAST(bin AS BIGINT) AS bin",
            "CAST(n AS BIGINT) AS n",
            "CAST(s AS BIGINT) AS s",
            "CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS raw_rate",
            "iso_rate",
        )
    )


ISOTONIC_SQL = f"""
WITH bins AS (
  SELECT user_id % {ISO_BINS} AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS s
  FROM events
  WHERE event_type IN ('click', 'view') AND user_id IS NOT NULL
  GROUP BY 1
),
pre AS (
  SELECT bin, n, s,
         SUM(n) OVER (ORDER BY bin
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
         SUM(s) OVER (ORDER BY bin
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
  FROM bins
),
intervals AS (
  SELECT lo.bin AS j, hi.bin AS k,
         CAST(hi.cs - (lo.cs - lo.s) AS DOUBLE)
           / CAST(hi.cn - (lo.cn - lo.n) AS DOUBLE) AS avg_jk
  FROM pre lo JOIN pre hi ON lo.bin <= hi.bin
),
inner_min AS (
  SELECT b.bin AS i, iv.j, MIN(iv.avg_jk) AS min_k
  FROM bins b
  JOIN intervals iv ON iv.j <= b.bin AND b.bin <= iv.k
  GROUP BY 1, 2
),
fit AS (
  SELECT i, MAX(min_k) AS iso_rate FROM inner_min GROUP BY 1
)
SELECT CAST(b.bin AS BIGINT) AS bin,
       b.n, b.s,
       CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS raw_rate,
       f.iso_rate
FROM bins b JOIN fit f ON b.bin = f.i
"""

REGISTRY["isotonic_ctr_deciles"] = {
    "fn": isotonic_ctr_deciles,
    "sql": ISOTONIC_SQL,
}


# --------------------------------------------------------------------------
# Markov next-event prediction accuracy: build the per-user event-type
# transition counts on the TRAIN half of the month, predict each
# transition's next type as the argmax count (deterministic tie-break:
# higher count, then lexicographic type), and score accuracy on the
# HELD-OUT half — turning the descriptive transition matrix
# (event_transition_matrix) into an evaluated predictor, the
# first-order baseline for sequence models. Exact: counts and hits are
# integers; accuracy is one half-up rounding; the train/test boundary
# is a calendar constant. Transitions are built per user with a lag
# window inside (user, split) partitions — one shuffle each side.
# --------------------------------------------------------------------------

MARKOV_SPLIT_DAY = 16


def markov_next_event_accuracy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    base = ev.selectExpr(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        f"dayofmonth(ts) < {MARKOV_SPLIT_DAY} AS is_train",
    )
    w = Window.partitionBy("user_id", "is_train").orderBy(
        "ts", "event_id"
    )
    trans = base.select(
        "is_train",
        F.col("event_type").alias("prev"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter("nxt IS NOT NULL")
    train_counts = (
        trans.filter("is_train")
        .groupBy("prev", "nxt")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wbest = Window.partitionBy("prev").orderBy(
        F.desc("cnt"), F.col("nxt")
    )
    pred = (
        train_counts.withColumn("rk", F.row_number().over(wbest))
        .filter("rk = 1")
        .selectExpr("prev", "nxt AS predicted", "cnt AS train_cnt")
    )
    test = trans.filter("NOT is_train")
    scored = test.join(F.broadcast(pred), "prev", "left").groupBy(
        "prev"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        # COALESCE: an unseen-in-train prev has NULL predicted — the
        # comparison must count as a miss (DuckDB's CASE already does)
        F.sum(
            F.expr("CAST(COALESCE(nxt = predicted, false) AS BIGINT)")
        )
        .cast("bigint")
        .alias("n_hits"),
        F.max("predicted").alias("predicted"),
        F.max("train_cnt").cast("bigint").alias("train_cnt"),
    )
    return scored.selectExpr(
        "prev",
        "predicted",
        "train_cnt",
        "n_test",
        "n_hits",
        f"{exact_round_div_sql('n_hits', 'n_test', 'DIV')}"
        " AS accuracy_r",
    )


def _markov_sql() -> str:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    return f"""
WITH base AS (
  SELECT user_id, event_type, ts, event_id,
         date_part('day', ts) < {MARKOV_SPLIT_DAY} AS is_train
  FROM events WHERE user_id IS NOT NULL
),
trans AS (
  SELECT is_train, prev, nxt FROM (
    SELECT is_train, event_type AS prev,
           LEAD(event_type) OVER (PARTITION BY user_id, is_train
                                  ORDER BY ts, event_id) AS nxt
    FROM base
  ) WHERE nxt IS NOT NULL
),
train_counts AS (
  SELECT prev, nxt, COUNT(*) AS cnt
  FROM trans WHERE is_train GROUP BY 1, 2
),
pred AS (
  SELECT prev, nxt AS predicted, cnt AS train_cnt FROM (
    SELECT prev, nxt, cnt,
           ROW_NUMBER() OVER (PARTITION BY prev
                              ORDER BY cnt DESC, nxt) AS rk
    FROM train_counts
  ) WHERE rk = 1
),
scored AS (
  SELECT t.prev,
         CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN t.nxt = p.predicted THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hits,
         MAX(p.predicted) AS predicted,
         CAST(MAX(p.train_cnt) AS BIGINT) AS train_cnt
  FROM trans t LEFT JOIN pred p USING (prev)
  WHERE NOT t.is_train
  GROUP BY 1
)
SELECT prev, predicted, train_cnt, n_test, n_hits,
       {exact_round_div_sql('n_hits', 'n_test', '//')} AS accuracy_r
FROM scored
"""


REGISTRY["markov_next_event_accuracy"] = {
    "fn": markov_next_event_accuracy,
    "sql": _markov_sql(),
}


# --------------------------------------------------------------------------
# Kruskal-Wallis H across ALL event types at once — the k-group
# extension of the pairwise Mann-Whitney battery (one global rank
# test instead of 10 pairwise ones). Same histogram discipline:
# global midranks over the pooled per-value counts (carried ×2 so ties
# stay integer), per-type rank sums as exact BIGINT. The H statistic's
# per-type terms R_i²/n_i are each ONE division of exact integers
# (engine-identical doubles), then UNIT-quantized to integers before
# the cross-type sum — a SUM of doubles is addition-order-dependent
# even over 5 terms, so the statistic's DEFINITION is the quantized
# form on both sides. Tie correction applied the same way. Output:
# one row per type (rank sums are per-type evidence) with the global
# H and tie-corrected H repeated via broadcast.
# --------------------------------------------------------------------------


def kruskal_wallis_value(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    byval = counts.groupBy("v_c").agg(F.sum("cnt").alias("n_all_v"))
    wcum = Window.orderBy("v_c").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = byval.withColumn(
        "cum", F.sum("n_all_v").over(wcum)
    ).selectExpr(
        "v_c",
        "n_all_v",
        "2 * (cum - n_all_v) + n_all_v + 1 AS r2x",
    )
    per_type = (
        counts.join(ranked, "v_c")
        .groupBy("event_type")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_i"),
            F.sum(F.col("cnt") * F.col("r2x"))
            .cast("bigint")
            .alias("r2x_sum"),
        )
    )
    ties = ranked.agg(
        F.sum(
            F.expr(
                "CAST(n_all_v AS DECIMAL(38,0)) * n_all_v * n_all_v"
                " - n_all_v"
            )
        ).alias("tie_sum"),
        F.sum("n_all_v").cast("bigint").alias("n_tot"),
    )
    terms = per_type.crossJoin(F.broadcast(ties)).selectExpr(
        "event_type",
        "n_i",
        "r2x_sum",
        "tie_sum",
        "n_tot",
        # R_i^2/n_i = r2x_sum^2/(4 n_i): exact HALF-UP integer
        # quantization with a 128-bit quotient (a float-floor detour
        # saturates at 2^63-1 on Spark; Spark's DIV would wrap)
        _whd("CAST(r2x_sum AS DECIMAL(38,0)) * r2x_sum", "4 * n_i", "DIV")
        + " AS _term_q",
    )
    h = terms.groupBy("tie_sum", "n_tot").agg(
        F.sum("_term_q").alias("_sum_q")
    ).selectExpr(
        "tie_sum",
        "n_tot",
        "12.0D * "
        + _w2d("_sum_q", "DIV")
        + """ / (CAST(n_tot AS DOUBLE) * CAST(n_tot + 1 AS DOUBLE))
           - 3.0D * CAST(n_tot + 1 AS DOUBLE) AS h_raw""",
        "1.0D - "
        + _w2d("tie_sum", "DIV")
        + " / NULLIF("
        + _w2d(
            "CAST(n_tot AS DECIMAL(38,0)) * n_tot * n_tot - n_tot",
            "DIV",
        )
        + ", 0.0) AS _c",
    ).selectExpr(
        "tie_sum",
        "n_tot",
        "h_raw",
        "CASE WHEN _c = 0.0D THEN NULL ELSE h_raw / _c END AS h_tie_r",
    )
    return per_type.crossJoin(F.broadcast(h)).selectExpr(
        "event_type",
        "n_i",
        "r2x_sum",
        "n_tot",
        "h_raw",
        "h_tie_r",
    )


KRUSKAL_SQL = """
WITH counts AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         COUNT(*) AS cnt
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
byval AS (
  SELECT v_c, SUM(cnt) AS n_all_v FROM counts GROUP BY 1
),
ranked AS (
  SELECT v_c, n_all_v,
         2 * (SUM(n_all_v) OVER (ORDER BY v_c
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_all_v) + n_all_v + 1 AS r2x
  FROM byval
),
per_type AS (
  SELECT c.event_type,
         CAST(SUM(c.cnt) AS BIGINT) AS n_i,
         CAST(SUM(c.cnt * r.r2x) AS BIGINT) AS r2x_sum
  FROM counts c JOIN ranked r USING (v_c)
  GROUP BY 1
),
ties AS (
  SELECT SUM(CAST(n_all_v AS HUGEINT) * n_all_v * n_all_v - n_all_v)
           AS tie_sum,
         CAST(SUM(n_all_v) AS BIGINT) AS n_tot
  FROM ranked
),
terms AS (
  SELECT event_type, n_i, r2x_sum, tie_sum, n_tot,
         {KW_TERM_DUCK} AS term_q
  FROM per_type CROSS JOIN ties
),
sums AS (
  SELECT tie_sum, n_tot, SUM(term_q) AS sum_q
  FROM terms GROUP BY 1, 2
),
h AS (
  SELECT tie_sum, n_tot,
         12.0 * {KW_SUMQ_DUCK}
           / (CAST(n_tot AS DOUBLE) * CAST(n_tot + 1 AS DOUBLE))
           - 3.0 * CAST(n_tot + 1 AS DOUBLE) AS h_raw,
         1.0 - {KW_TIE_DUCK}
           / {KW_N3_DUCK} AS c
  FROM sums
)
SELECT p.event_type, p.n_i, p.r2x_sum, h.n_tot, h.h_raw,
       CASE WHEN h.c = 0.0 THEN NULL ELSE h.h_raw / h.c END AS h_tie_r
FROM per_type p CROSS JOIN h
"""

REGISTRY["kruskal_wallis_value"] = {
    "fn": kruskal_wallis_value,
    "sql": KRUSKAL_SQL.replace(
        "{KW_TERM_DUCK}",
        _whd("CAST(r2x_sum AS HUGEINT) * r2x_sum", "4 * n_i", "//"),
    )
    .replace("{KW_SUMQ_DUCK}", _w2d("sum_q", "//"))
    .replace("{KW_TIE_DUCK}", _w2d("tie_sum", "//"))
    .replace(
        "{KW_N3_DUCK}",
        _w2d("CAST(n_tot AS HUGEINT) * n_tot * n_tot - n_tot", "//"),
    ),
}


# --------------------------------------------------------------------------
# Log-rank test between two user cohorts' retention curves — the
# standard "do these survival curves differ" test completing the
# survival family (Nelson-Aalen hazard, Kaplan-Meier product-limit,
# and now the between-cohort comparison). Cohorts come from the seeded
# md5 hash of user_id; the right-censoring spine is the same as the
# estimators'. At each duration t with d total churns and n at risk:
# the A-cohort expectation d·n_A/n and the hypergeometric variance
# d(n−d)n_A·n_B/(n²(n−1)) are each HALF-UP MICRO-QUANTIZED exact
# rationals (128-bit numerators), integer-summed over the
# calendar-bounded spine; the z statistic is one engine-identical IEEE
# chain on the integer totals. Scale: one groupBy to per-user spans,
# everything after is calendar-bounded.
# --------------------------------------------------------------------------


def logrank_retention_cohorts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import phash_spark_sql

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
    grp_hash = phash_spark_sql("CONCAT('lr:', CAST(user_id AS STRING))")
    per_user = spans.crossJoin(F.broadcast(horizon)).selectExpr(
        f"{grp_hash} % 2 AS grp",
        "datediff(d1, d0) AS dur",
        "datediff(hmax, d0) AS obs",
        "CAST(d1 < hmax AS INT) AS churned",
    )
    at_risk = (
        per_user.selectExpr(
            "grp",
            "churned",
            "dur",
            "explode(sequence(0, least(dur, obs))) AS t",
        )
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(grp = 0 AS BIGINT)")).alias("na"),
            F.sum(
                F.expr("CAST(churned = 1 AND dur = t AS BIGINT)")
            ).alias("d"),
            F.sum(
                F.expr(
                    "CAST(churned = 1 AND dur = t AND grp = 0 AS BIGINT)"
                )
            ).alias("da"),
        )
        .filter("n > 1 AND d > 0")
    )
    steps = at_risk.selectExpr(
        "t",
        "n",
        "na",
        "d",
        "da",
        # E[d_A] in half-up micros: d*na/n — 128-bit numerator (d*na
        # alone passes int64/2e6 near ~5e12-churn steps)
        "CAST((2 * CAST(d AS DECIMAL(38,0)) * na * 1000000 + n)"
        " DIV (2 * n) AS BIGINT) AS e_micro",
        # Var in half-up micros: d(n-d)na(n-na) / (n^2 (n-1)) — the
        # numerator needs 128 bits
        """CAST((2 * CAST(d AS DECIMAL(38,0)) * (n - d) * na * (n - na)
                 * 1000000 + CAST(n AS DECIMAL(38,0)) * n * (n - 1))
           DIV (2 * CAST(n AS DECIMAL(38,0)) * n * (n - 1)) AS BIGINT)
           AS v_micro""",
    )
    agg = steps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_steps"),
        F.sum("da").cast("bigint").alias("o_a"),
        F.sum("e_micro").cast("bigint").alias("e_a_micro"),
        F.sum("v_micro").cast("bigint").alias("var_micro"),
    )
    return agg.selectExpr(
        "n_steps",
        "o_a",
        "e_a_micro",
        "var_micro",
        """CASE WHEN var_micro = 0 THEN NULL ELSE
           CAST(o_a * 1000000 - e_a_micro AS DOUBLE)
           / (1000.0D * sqrt(CAST(var_micro AS DOUBLE))) END AS z_r""",
    )


def _logrank_sql() -> str:
    from de4ml_spark.operators.portable_hash import phash_duck_sql

    grp_hash = phash_duck_sql("CONCAT('lr:', CAST(user_id AS VARCHAR))")
    return f"""
WITH spans AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1
),
horizon AS (SELECT MAX(d1) AS hmax FROM spans),
per_user AS (
  SELECT {grp_hash} % 2 AS grp,
         datediff('day', d0, d1) AS dur,
         datediff('day', d0, h.hmax) AS obs,
         CAST(d1 < h.hmax AS INT) AS churned
  FROM spans CROSS JOIN horizon h
),
exploded AS (
  SELECT grp, churned, dur,
         unnest(generate_series(0, least(dur, obs))) AS t
  FROM per_user
),
at_risk AS (
  SELECT t,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN churned = 1 AND dur = t THEN 1 ELSE 0 END)
              AS BIGINT) AS d,
         CAST(SUM(CASE WHEN churned = 1 AND dur = t AND grp = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS da
  FROM exploded GROUP BY 1
  HAVING COUNT(*) > 1
     AND SUM(CASE WHEN churned = 1 AND dur = t THEN 1 ELSE 0 END) > 0
),
steps AS (
  SELECT t, n, na, d, da,
         CAST((2 * CAST(d AS HUGEINT) * na * 1000000 + n) // (2 * n)
              AS BIGINT) AS e_micro,
         CAST((2 * CAST(d AS HUGEINT) * (n - d) * na * (n - na)
               * 1000000 + CAST(n AS HUGEINT) * n * (n - 1))
              // (2 * CAST(n AS HUGEINT) * n * (n - 1)) AS BIGINT)
           AS v_micro
  FROM at_risk
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_steps,
       CAST(SUM(da) AS BIGINT) AS o_a,
       CAST(SUM(e_micro) AS BIGINT) AS e_a_micro,
       CAST(SUM(v_micro) AS BIGINT) AS var_micro,
       CASE WHEN CAST(SUM(v_micro) AS BIGINT) = 0 THEN NULL ELSE
       CAST(CAST(SUM(da) AS BIGINT) * 1000000
            - CAST(SUM(e_micro) AS BIGINT) AS DOUBLE)
       / (1000.0 * sqrt(CAST(CAST(SUM(v_micro) AS BIGINT) AS DOUBLE)))
       END AS z_r
FROM steps
"""


REGISTRY["logrank_retention_cohorts"] = {
    "fn": logrank_retention_cohorts,
    "sql": _logrank_sql(),
}
