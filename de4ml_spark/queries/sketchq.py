"""Sketches, information-theoretic drift, and statistical process
control — all ENGINE-EXACT by construction.

Classic sketch implementations (HLL, t-digest) are not cross-engine
verifiable: Spark's HLL++ and DuckDB's approx_count_distinct build
different summaries from different hashes. Here every sketch runs on
the repo's portable md5 hash and seeded integer family
(operators/portable_hash.py), and every log-domain statistic on the
portable ln — so the SKETCH ITSELF is deterministic and the oracle
verifies the estimate bit-for-bit, not just "close". That is the right
posture for a data-engineering engine: an estimator whose value depends
on which engine (or which partitioning) computed it cannot be used in a
regression gate.

- KMV distinct sketch: k minimum hash values; estimate (k-1)*2^B / h_k.
  The k-smallest selection is a per-group window rank — at 100 TB the
  same shape as every top-k (shuffle bounded by distinct hashes, which
  the DISTINCT pre-aggregates map-side).
- CountMin: depth-4, width-256 integer counter matrix from the seeded
  affine family; estimate = min over rows. Counters are plain
  integer aggregates — the sketch build is two groupBys.
- KL drift / token entropy: Σ p ln(p/q) and -Σ p ln p with the portable
  ln quantized to integer micro-units BEFORE the weighted sum, so the
  aggregate is addition-order-independent; the final value is one
  correctly-rounded division of exact integers.
- CUSUM: the recurrence s_i = max(0, s_{i-1} + x_i) has the closed form
  s_i = P_i - min(0, running_min(P_i)) over the prefix sums P — pure
  window functions, NO recursive scan needed. Worth contrasting with
  throttle/quota (operators/): know the prefix-scan algebra before
  reaching for a stateful Python walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.operators.portable_hash import (
    P31,
    hash_family,
    phash_duck_sql,
    phash_spark_sql,
)
from de4ml_spark.session import load_table
from de4ml_spark.operators.portable_hash import wide_to_double_sql as _w2d

REGISTRY: dict = {}


# --------------------------------------------------------------------------
# KMV distinct sketch: per-day distinct users, estimated from the k-th
# smallest 40-bit portable hash vs the exact count. Days with fewer than
# k distinct hashes fall back to the exact count (the standard KMV rule:
# below k the sketch IS the exact set). +1 on the divisor guards the
# (2^-40-probability) zero hash without changing the estimate.
# --------------------------------------------------------------------------

KMV_K = 64
KMV_BITS = 40
_KMV_NUM = (KMV_K - 1) * (1 << KMV_BITS)


def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date").alias("day")
    hashes = (
        ev.select(day, "user_id")
        .distinct()
        .selectExpr(
            "day",
            f"{phash_spark_sql('CAST(user_id AS STRING)', KMV_BITS)} AS h",
        )
        .distinct()
    )
    w = Window.partitionBy("day").orderBy(F.asc("h"))
    kth = (
        hashes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == KMV_K)
        .select("day", F.col("h").alias("hk"))
    )
    exact = (
        ev.select(day, "user_id")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("exact_distinct"))
    )
    return exact.join(kth, "day", "left").select(
        "day",
        "exact_distinct",
        F.coalesce(
            F.expr(f"{_KMV_NUM} DIV (hk + 1)"), F.col("exact_distinct")
        ).alias("kmv_est"),
    )


KMV_SQL = f"""
WITH hashes AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day,
         {phash_duck_sql("CAST(user_id AS VARCHAR)", KMV_BITS)} AS h
  FROM (SELECT DISTINCT CAST(ts AS DATE) AS ts, user_id FROM events)
),
kth AS (
  SELECT day, h AS hk
  FROM (SELECT day, h,
               ROW_NUMBER() OVER (PARTITION BY day ORDER BY h ASC) AS rk
        FROM hashes)
  WHERE rk = {KMV_K}
),
exact AS (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT e.day, e.exact_distinct,
       COALESCE({_KMV_NUM} // (k.hk + 1), e.exact_distinct) AS kmv_est
FROM exact e LEFT JOIN kth k USING (day)
"""

REGISTRY["kmv_distinct_users"] = {"fn": kmv_distinct_users, "sql": KMV_SQL}


# --------------------------------------------------------------------------
# CountMin sketch of event_type frequencies: depth 4 x width 256 from
# the seeded affine family over the 31-bit portable hash (inputs < 2^32
# keep a*x+b below 2^63 — exact in both engines). Estimate = min over
# rows of the bucket totals; always >= exact, equality when no
# collision. Build = one exact count + a literal depth explode + one
# groupBy; the estimate join is broadcast-size.
# --------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 256
_CM_FAMILY = hash_family(CM_DEPTH)


def countmin_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    exact = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .selectExpr(
            "event_type",
            "exact_count",
            f"{phash_spark_sql('event_type', 31)} AS x",
        )
    )
    # one scan + one aggregation: the depth dimension comes from
    # exploding a LITERAL (row, a, b) array over the finished exact
    # frame — a union of per-row branches would re-run the events
    # scan+groupBy once per hash row (the heaviest stage, paid
    # CM_DEPTH times at scale)
    fam = F.array(
        *[
            F.struct(
                F.lit(s).alias("row"),
                F.lit(a).alias("a"),
                F.lit(b).alias("b"),
            )
            for s, (a, b) in enumerate(_CM_FAMILY)
        ]
    )
    rows = (
        exact.withColumn("f", F.explode(fam))
        .selectExpr(
            "event_type",
            "exact_count",
            "f.row AS row",
            f"((f.a * x + f.b) % {P31}) % {CM_WIDTH} AS bucket",
        )
    )
    totals = rows.groupBy("row", "bucket").agg(
        F.sum("exact_count").alias("bucket_total")
    )
    return (
        rows.join(totals, ["row", "bucket"])
        .groupBy("event_type")
        .agg(
            F.max("exact_count").alias("exact_count"),
            F.min("bucket_total").alias("cm_est"),
        )
    )


def _countmin_sql() -> str:
    vals = ", ".join(
        f"({s}, {a}, {b})" for s, (a, b) in enumerate(_CM_FAMILY)
    )
    return f"""
WITH exact AS (
  SELECT event_type, COUNT(*) AS exact_count,
         {phash_duck_sql("event_type", 31)} AS x
  FROM events GROUP BY 1
),
rows_ AS (
  SELECT e.event_type, e.exact_count, f.row,
         ((f.a * e.x + f.b) % {P31}) % {CM_WIDTH} AS bucket
  FROM exact e CROSS JOIN (VALUES {vals}) f(row, a, b)
),
totals AS (
  SELECT row, bucket, CAST(SUM(exact_count) AS BIGINT) AS bucket_total
  FROM rows_ GROUP BY 1, 2
)
SELECT r.event_type,
       CAST(MAX(r.exact_count) AS BIGINT) AS exact_count,
       CAST(MIN(t.bucket_total) AS BIGINT) AS cm_est
FROM rows_ r JOIN totals t USING (row, bucket)
GROUP BY 1
"""


REGISTRY["countmin_event_types"] = {
    "fn": countmin_event_types,
    "sql": _countmin_sql(),
}


# --------------------------------------------------------------------------
# KL-divergence drift of the event_type distribution, first half of the
# month (P) vs second half (Q), over the common support. Each term
# p_i ln(p_i/q_i) = (c1_i/n1) ln((c1_i n2)/(c2_i n1)): the log ratio is
# the portable ln of an integer ratio (GREATEST/LEAST + sign, since the
# builder needs p >= q), quantized to micro units; the weighted sum is
# exact integer arithmetic; the final value is ONE correctly-rounded
# division of exact integers (< 2^53) — engine-identical without any
# explicit rounding step.
# --------------------------------------------------------------------------

KL_SPLIT_DAY = 16


def kl_drift_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import with_portable_ln

    ev = load_table(spark, sf_dir, "events")
    cnt = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.when(F.dayofmonth("ts") < KL_SPLIT_DAY, 1)).alias("c1"),
            F.count(F.when(F.dayofmonth("ts") >= KL_SPLIT_DAY, 1)).alias("c2"),
        )
        .filter((F.col("c1") > 0) & (F.col("c2") > 0))
    )
    tot = cnt.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    j = cnt.crossJoin(F.broadcast(tot)).selectExpr(
        "event_type", "c1", "n1", "n2",
        "c1 * n2 AS pa", "c2 * n1 AS qa",
    )
    terms = with_portable_ln(
        j, "GREATEST(pa, qa)", "LEAST(pa, qa)", "__lnr"
    ).selectExpr(
        "n1",
        "n2",
        "c1 * (CASE WHEN pa >= qa THEN 1 ELSE -1 END)"
        " * CAST(floor(__lnr * 1000000.0 + 0.5) AS BIGINT) AS term",
    )
    return (
        terms.groupBy("n1", "n2")
        .agg(F.sum("term").alias("kl_micro_sum"))
        .selectExpr(
            "n1",
            "n2",
            "kl_micro_sum",
            "CAST(kl_micro_sum AS DOUBLE)"
            " / CAST(n1 * 1000000 AS DOUBLE) AS kl_r",
        )
    )


def _kl_sql() -> str:
    from de4ml_spark.operators.portable_hash import portable_ln_duck_ctes

    return f"""
WITH cnt AS (
  SELECT event_type,
         COUNT(*) FILTER (WHERE date_part('day', ts) < {KL_SPLIT_DAY}) AS c1,
         COUNT(*) FILTER (WHERE date_part('day', ts) >= {KL_SPLIT_DAY}) AS c2
  FROM events GROUP BY 1
),
cnt2 AS (SELECT * FROM cnt WHERE c1 > 0 AND c2 > 0),
tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
  FROM cnt2
),
j AS (
  SELECT c.event_type, c.c1, t.n1, t.n2,
         c.c1 * t.n2 AS pa, c.c2 * t.n1 AS qa
  FROM cnt2 c CROSS JOIN tot t
),
{portable_ln_duck_ctes(
    "j", "event_type, c1, n1, n2, pa, qa",
    "GREATEST(pa, qa)", "LEAST(pa, qa)", "lnr", "pl")},
terms AS (
  SELECT n1, n2,
         c1 * (CASE WHEN pa >= qa THEN 1 ELSE -1 END)
            * CAST(floor(lnr * 1000000.0 + 0.5) AS BIGINT) AS term
  FROM pl_out
)
SELECT n1, n2, CAST(SUM(term) AS BIGINT) AS kl_micro_sum,
       CAST(CAST(SUM(term) AS BIGINT) AS DOUBLE)
         / CAST(n1 * 1000000 AS DOUBLE) AS kl_r
FROM terms GROUP BY n1, n2
"""


REGISTRY["kl_drift_event_type"] = {
    "fn": kl_drift_event_type,
    "sql": _kl_sql(),
}


# --------------------------------------------------------------------------
# Shannon entropy of the token distribution per document source:
# H = (1/T) Σ tf * ln(T/tf) with the portable ln per VOCAB entry,
# micro-quantized before the weighted sum — same exactness scheme as the
# KL drift. Ranks sources by lexical diversity (a curation signal:
# collapsed-entropy sources are templated/boilerplate).
# --------------------------------------------------------------------------

def entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import with_portable_ln
    from de4ml_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select("source", F.explode(tokens("text")).alias("term"))
    vocab = terms.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    totals = vocab.groupBy("source").agg(F.sum("tf").alias("t_tokens"))
    j = vocab.join(totals, "source")
    terms_q = with_portable_ln(j, "t_tokens", "tf", "__pln").selectExpr(
        "source",
        "t_tokens",
        "tf * CAST(floor(__pln * 1000000.0 + 0.5) AS BIGINT) AS term",
    )
    return (
        terms_q.groupBy("source")
        .agg(
            F.max("t_tokens").alias("n_tokens"),
            F.sum("term").alias("h_micro_sum"),
        )
        .selectExpr(
            "source",
            "n_tokens",
            "h_micro_sum",
            "CAST(h_micro_sum AS DOUBLE)"
            " / CAST(n_tokens * 1000000 AS DOUBLE) AS entropy_r",
        )
    )


def _entropy_sql() -> str:
    from de4ml_spark.operators.portable_hash import portable_ln_duck_ctes

    return f"""
WITH terms AS (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
),
vocab AS (SELECT source, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
totals AS (
  SELECT source, CAST(SUM(tf) AS BIGINT) AS t_tokens FROM vocab GROUP BY 1
),
j AS (
  SELECT v.source, v.tf, t.t_tokens FROM vocab v JOIN totals t USING (source)
),
{portable_ln_duck_ctes("j", "source, tf, t_tokens",
                       "t_tokens", "tf", "pln", "pl")},
terms_q AS (
  SELECT source, t_tokens,
         tf * CAST(floor(pln * 1000000.0 + 0.5) AS BIGINT) AS term
  FROM pl_out
)
SELECT source, MAX(t_tokens) AS n_tokens,
       CAST(SUM(term) AS BIGINT) AS h_micro_sum,
       CAST(CAST(SUM(term) AS BIGINT) AS DOUBLE)
         / CAST(MAX(t_tokens) * 1000000 AS DOUBLE) AS entropy_r
FROM terms_q GROUP BY source
"""


REGISTRY["entropy_by_source"] = {
    "fn": entropy_by_source,
    "sql": _entropy_sql(),
}


# --------------------------------------------------------------------------
# CUSUM changepoint alarms on per-user daily spend: the one-sided upper
# CUSUM s_i = max(0, s_{i-1} + (x_i - K)) with allowance K and alarm
# threshold H, in integer cents. The recurrence has the prefix-scan
# closed form s_i = P_i - min(0, min_{j<=i} P_j) over the running sums
# P — TWO window functions, one shuffle on user, no recursive scan.
# Emits alarm rows only (output bounded by alarms, not days).
# --------------------------------------------------------------------------

CUSUM_K = 5_000  # allowance: cents/day considered "in control"
CUSUM_H = 20_000  # alarm threshold, cents


def cusum_alarm_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(
            (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
        ).alias("dc")
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # two projection stages: the running min is a window OVER the prefix
    # sum column, which must already be materialized in the plan (nested
    # window calls are illegal in one SELECT on both engines)
    staged = daily.withColumn("p", F.sum(F.col("dc") - CUSUM_K).over(wrun))
    scanned = staged.withColumn(
        "m", F.min(F.least(F.lit(0).cast("bigint"), F.col("p"))).over(wrun)
    ).withColumn("cusum_c", F.col("p") - F.col("m"))
    return scanned.filter(F.col("cusum_c") > CUSUM_H).select(
        "user_id", "day", "dc", "cusum_c"
    )


CUSUM_SQL = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS dc
  FROM events GROUP BY 1, 2
),
staged AS (
  SELECT user_id, day, dc,
         CAST(SUM(dc - {CUSUM_K}) OVER w AS BIGINT) AS p
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
scanned AS (
  SELECT user_id, day, dc, p,
         MIN(LEAST(CAST(0 AS BIGINT), p)) OVER w2 AS m
  FROM staged
  WINDOW w2 AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, day, dc, CAST(p - m AS BIGINT) AS cusum_c
FROM scanned
WHERE p - m > {CUSUM_H}
"""

REGISTRY["cusum_alarm_value"] = {"fn": cusum_alarm_value, "sql": CUSUM_SQL}


# --------------------------------------------------------------------------
# Benford's-law audit of order totals: first-digit distribution vs the
# Benford expectation P(d) = ln(1+1/d)/ln(10), chi-square statistic. A
# standard forensic data-quality screen (fabricated or capped monetary
# columns fail it). Exactness: the first digit comes from the DECIMAL's
# string form (no float log10); expected probabilities are portable-ln
# ratios; per-digit chi-square terms quantize to micro units before the
# total, so the statistic is engine- and order-exact. A digit spine
# guarantees all 9 rows even for digits with zero observations.
# --------------------------------------------------------------------------

def benford_audit_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_const,
        with_portable_ln,
    )

    ln10 = repr(portable_ln_const(10))
    orders = load_table(spark, sf_dir, "orders")
    obs = (
        orders.select(
            F.substring(
                F.col("o_totalprice").cast("decimal(12,2)").cast("string"),
                1,
                1,
            ).alias("d")
        )
        .filter(F.col("d").between("1", "9"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    spine = spark.range(1, 10).select(
        F.col("id").alias("digit"), F.col("id").cast("string").alias("d")
    )
    n = obs.agg(F.sum("observed").alias("_n"))
    j = (
        spine.join(obs, "d", "left")
        .withColumn("observed", F.coalesce("observed", F.lit(0)))
        .crossJoin(F.broadcast(n))
    )
    terms = with_portable_ln(j, "digit + 1", "digit", "__lnr").selectExpr(
        "digit",
        "observed",
        f"CAST(_n AS DOUBLE) * __lnr / CAST({ln10} AS DOUBLE) AS __e",
    )
    terms = terms.selectExpr(
        "digit",
        "observed",
        "CAST(floor(__e * 1000000.0 + 0.5) AS BIGINT) AS expected_micro",
        "CAST(floor((CAST(observed AS DOUBLE) - __e)"
        " * (CAST(observed AS DOUBLE) - __e) / NULLIF(__e, 0.0)"
        " * 1000000.0 + 0.5) AS BIGINT) AS term_micro",
    )
    from pyspark.sql import Window

    return terms.select(
        "digit",
        "observed",
        "expected_micro",
        "term_micro",
        (
            F.sum("term_micro")
            .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .cast("double")
            / 1_000_000.0
        ).alias("chi2_r"),
    )


def _benford_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_const,
        portable_ln_duck_ctes,
    )

    ln10 = repr(portable_ln_const(10))
    return f"""
WITH obs AS (
  SELECT substring(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR),
                   1, 1) AS d,
         COUNT(*) AS observed
  FROM orders
  WHERE substring(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR),
                  1, 1) BETWEEN '1' AND '9'
  GROUP BY 1
),
spine AS (
  SELECT CAST(x AS BIGINT) AS digit, CAST(x AS VARCHAR) AS d
  FROM generate_series(1, 9) t(x)
),
n AS (SELECT CAST(SUM(observed) AS BIGINT) AS _n FROM obs),
j AS (
  SELECT s.digit, COALESCE(o.observed, 0) AS observed, n._n
  FROM spine s LEFT JOIN obs o USING (d) CROSS JOIN n
),
{portable_ln_duck_ctes("j", "digit, observed, _n",
                       "digit + 1", "digit", "lnr", "pl")},
terms AS (
  SELECT digit, observed,
         CAST(_n AS DOUBLE) * lnr / CAST({ln10} AS DOUBLE) AS e
  FROM pl_out
),
q AS (
  SELECT digit, observed,
         CAST(floor(e * 1000000.0 + 0.5) AS BIGINT) AS expected_micro,
         CAST(floor((CAST(observed AS DOUBLE) - e)
              * (CAST(observed AS DOUBLE) - e) / NULLIF(e, 0.0)
              * 1000000.0 + 0.5) AS BIGINT) AS term_micro
  FROM terms
)
SELECT digit, observed, expected_micro, term_micro,
       CAST(CAST(SUM(term_micro) OVER () AS BIGINT) AS DOUBLE)
         / 1000000.0 AS chi2_r
FROM q
"""


REGISTRY["benford_audit_totalprice"] = {
    "fn": benford_audit_totalprice,
    "sql": _benford_sql(),
}


# --------------------------------------------------------------------------
# HyperLogLog distinct sketch, ENGINE-EXACT: per-event-type distinct
# users from m=64 registers over the portable 58-bit hash (low 6 bits
# bucket, high 52 bits w; rho = leading-zero rank of w via the exact
# bit length — conv-to-binary / to_base, no libm). The harmonic sum is
# computed in scaled INTEGERS (floor(2^40 * 2^-M) per register — exact
# for M <= 40, a deterministic 0 beyond), so SUM is order-independent;
# the estimate is alpha * (2^52 / S) with one correctly-rounded double
# division + one multiply by the inlined alpha literal. Small-range
# correction (V empty registers, raw <= 2.5m): linear counting
# m * ln(m/V) on the portable ln — ln scaled by m=2^6, an exact double
# op. Both engines therefore emit BIT-IDENTICAL estimates.
# Scale: DISTINCT (type, user) pre-aggregates map-side; the register
# table is |types| x 64 rows and registers MERGE by max — the actual
# 100 TB posture (shard registers, max-combine), unlike engine-native
# HLLs whose summaries can't be cross-verified.
# --------------------------------------------------------------------------

HLL_M = 64  # 2^6 registers
HLL_WBITS = 52  # hash bits feeding the leading-zero rank
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)  # inlined as a double literal
_HLL_NUM = 1 << 52  # alpha numerator scale: m^2 * 2^40 = 2^52


def _hll_rho_sql(w: str, conv: str) -> str:
    """rho = 53 - bitlen(w) (w in [1, 2^52); 53 when w = 0)."""
    bitlen = (
        f"length(conv(CAST({w} AS BIGINT), 10, 2))"
        if conv == "spark"
        else f"length(to_base(CAST({w} AS BIGINT), 2))"
    )
    return f"CASE WHEN {w} = 0 THEN 53 ELSE 53 - {bitlen} END"


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import with_portable_ln

    ev = load_table(spark, sf_dir, "events")
    # one distinct (type, user) frame feeds BOTH the registers and the
    # exact comparison count — no second events scan
    du = ev.select("event_type", "user_id").distinct()
    hashed = (
        du.selectExpr(
            "event_type",
            f"{phash_spark_sql('CAST(user_id AS STRING)', 58)} AS h",
        )
        .selectExpr(
            "event_type",
            f"h % {HLL_M} AS bucket",
            f"h DIV {HLL_M} AS w",
        )
        .selectExpr(
            "event_type", "bucket", f"{_hll_rho_sql('w', 'spark')} AS rho"
        )
    )
    regs = hashed.groupBy("event_type", "bucket").agg(
        F.max("rho").alias("m_reg")
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(HLL_M).select(F.col("id").alias("bucket"))
        )
    )
    full = grid.join(regs, ["event_type", "bucket"], "left").select(
        "event_type", F.coalesce("m_reg", F.lit(0)).alias("m_reg")
    )
    per_type = full.groupBy("event_type").agg(
        F.expr(
            "CAST(SUM(CAST(floor(power(2, 40 - m_reg)) AS BIGINT))"
            " AS BIGINT)"
        ).alias("s_scaled"),
        F.expr(
            "CAST(SUM(CASE WHEN m_reg = 0 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("v_zero"),
    )
    exact = (
        du.filter(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
    )
    both = exact.join(per_type, "event_type")
    both = with_portable_ln(
        both, str(HLL_M), f"greatest(v_zero, CAST(1 AS BIGINT))", "__lnv"
    )
    raw = (
        f"CAST({_HLL_ALPHA!r} AS DOUBLE)"
        f" * (CAST({_HLL_NUM} AS DOUBLE) / CAST(s_scaled AS DOUBLE))"
    )
    return both.selectExpr(
        "event_type",
        "exact_distinct",
        "s_scaled",
        "v_zero",
        f"CASE WHEN v_zero > 0 AND {raw} <= {2.5 * HLL_M!r}"
        f" THEN CAST({HLL_M} AS DOUBLE) * __lnv ELSE {raw} END"
        " AS hll_est",
    )


def _hll_sql() -> str:
    from de4ml_spark.operators.portable_hash import portable_ln_duck_ctes

    raw = (
        f"CAST({_HLL_ALPHA!r} AS DOUBLE)"
        f" * (CAST({_HLL_NUM} AS DOUBLE) / CAST(s_scaled AS DOUBLE))"
    )
    return f"""
WITH hashed AS (
  SELECT event_type,
         {phash_duck_sql("CAST(user_id AS VARCHAR)", 58)} AS h
  FROM (SELECT DISTINCT event_type, user_id FROM events)
),
rhos AS (
  SELECT event_type, h % {HLL_M} AS bucket,
         {_hll_rho_sql(f"(h // {HLL_M})", "duck")} AS rho
  FROM hashed
),
regs AS (
  SELECT event_type, bucket, MAX(rho) AS m_reg
  FROM rhos GROUP BY 1, 2
),
grid AS (
  SELECT t.event_type, b.range AS bucket
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN range({HLL_M}) b
),
full_regs AS (
  SELECT g.event_type, COALESCE(r.m_reg, 0) AS m_reg
  FROM grid g LEFT JOIN regs r
    ON g.event_type = r.event_type AND g.bucket = r.bucket
),
per_type AS (
  SELECT event_type,
         CAST(SUM(CAST(floor(power(2, 40 - m_reg)) AS BIGINT))
              AS BIGINT) AS s_scaled,
         CAST(SUM(CASE WHEN m_reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS v_zero
  FROM full_regs GROUP BY 1
),
joined AS (
  SELECT e.event_type, e.exact_distinct, p.s_scaled, p.v_zero
  FROM (SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
        FROM events GROUP BY 1) e
  JOIN per_type p USING (event_type)
),
{portable_ln_duck_ctes(
    "joined", "event_type, exact_distinct, s_scaled, v_zero",
    str(HLL_M), "greatest(v_zero, CAST(1 AS BIGINT))", "lnv", "pl")}
SELECT event_type, exact_distinct, s_scaled, v_zero,
       CASE WHEN v_zero > 0 AND {raw} <= {2.5 * HLL_M!r}
            THEN CAST({HLL_M} AS DOUBLE) * lnv ELSE {raw} END AS hll_est
FROM pl_out
"""


REGISTRY["hll_distinct_users"] = {
    "fn": hll_distinct_users,
    "sql": _hll_sql(),
}


# --------------------------------------------------------------------------
# Mutual information I(event_type; hour-of-day) — the dependence readout
# between a categorical column and a derived time feature (feature-
# selection / leakage screening staple). Same exactness scheme as the KL
# entry: each term n_xy * ln(n_xy*N / (n_x*n_y)) uses the portable ln on
# the integer rational (sign via GREATEST/LEAST swap), is quantized to
# integer micro-units BEFORE the sum (order-independent), and the final
# value is one double division. Integer products n_xy*N stay within
# BIGINT to ~3e9 rows per table; beyond that the same expressions lift
# to DECIMAL(38,0)/HUGEINT (the ln builder is type-agnostic on its
# integer inputs).
# Scale: one groupBy to the |types| x 24 joint frame; marginals and N
# are windows over that bounded frame, never a second scan.
# --------------------------------------------------------------------------


def mutual_info_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import with_portable_ln

    ev = load_table(spark, sf_dir, "events")
    joint = ev.groupBy(
        F.col("event_type").alias("x"),
        F.hour("ts").alias("y"),
    ).agg(F.count(F.lit(1)).alias("nxy"))
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    wn = Window.partitionBy()
    j = joint.select(
        "x",
        "y",
        "nxy",
        F.sum("nxy").over(wx).alias("nx"),
        F.sum("nxy").over(wy).alias("ny"),
        F.sum("nxy").over(wn).alias("n"),
    ).selectExpr("x", "y", "nxy", "n", "nxy * n AS pa", "nx * ny AS qa")
    terms = with_portable_ln(
        j, "GREATEST(pa, qa)", "LEAST(pa, qa)", "__lnr"
    ).selectExpr(
        "n",
        "nxy * (CASE WHEN pa >= qa THEN 1 ELSE -1 END)"
        " * CAST(floor(__lnr * 1000000.0 + 0.5) AS BIGINT) AS term",
    )
    return (
        terms.groupBy("n")
        .agg(F.expr("CAST(SUM(term) AS BIGINT)").alias("mi_micro_sum"))
        .selectExpr(
            "n",
            "mi_micro_sum",
            "CAST(mi_micro_sum AS DOUBLE)"
            " / CAST(n * 1000000 AS DOUBLE) AS mi_r",
        )
    )


def _mi_sql() -> str:
    from de4ml_spark.operators.portable_hash import portable_ln_duck_ctes

    return f"""
WITH joint AS (
  SELECT event_type AS x, date_part('hour', ts) AS y,
         CAST(COUNT(*) AS BIGINT) AS nxy
  FROM events GROUP BY 1, 2
),
j AS (
  SELECT x, y, nxy,
         CAST(SUM(nxy) OVER () AS BIGINT) AS n,
         nxy * CAST(SUM(nxy) OVER () AS BIGINT) AS pa,
         CAST(SUM(nxy) OVER (PARTITION BY x) AS BIGINT)
           * CAST(SUM(nxy) OVER (PARTITION BY y) AS BIGINT) AS qa
  FROM joint
),
{portable_ln_duck_ctes(
    "j", "x, y, nxy, n, pa, qa",
    "GREATEST(pa, qa)", "LEAST(pa, qa)", "lnr", "pl")},
terms AS (
  SELECT n,
         nxy * (CASE WHEN pa >= qa THEN 1 ELSE -1 END)
            * CAST(floor(lnr * 1000000.0 + 0.5) AS BIGINT) AS term
  FROM pl_out
)
SELECT n, CAST(SUM(term) AS BIGINT) AS mi_micro_sum,
       CAST(CAST(SUM(term) AS BIGINT) AS DOUBLE)
         / CAST(n * 1000000 AS DOUBLE) AS mi_r
FROM terms GROUP BY n
"""


REGISTRY["mutual_info_events"] = {
    "fn": mutual_info_events,
    "sql": _mi_sql(),
}


# --------------------------------------------------------------------------
# 1-D earth-mover's distance (Wasserstein-1) between event-type value
# distributions, pairwise — the transport-metric member of the drift
# family (KS = max CDF gap, TVD = half L1 on categories, KL = info
# divergence; EMD integrates the CDF gap so it SEES how far mass
# moved, not just that it moved). Exactness: on the cent-level value
# histogram, EMD·N_a·N_b = Σ over consecutive distinct values of
# |cum_a·N_b − cum_b·N_a| · Δv — pure BIGINT (128-bit internally for
# the final scale-down), with the reported cents value one exact
# half-up division. Scale: one groupBy to the per-(type, value)
# histogram; the pair fan-out multiplies the histogram by (k−1), and
# the per-pair cumulative is a window over distinct values.
# --------------------------------------------------------------------------


def emd_value_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.pairhist import pair_value_histogram
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql_wide,
    )

    # Shared per-pair cum-histogram frame (operators/pairhist.py): the
    # CDF cums, step widths (v_next) and side totals are precomputed,
    # so the entry is one groupBy over the persisted bounded scan.
    stepped = pair_value_histogram(spark, sf_dir).filter(
        "v_next IS NOT NULL"
    )
    agg = stepped.groupBy("type_a", "type_b").agg(
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
        F.sum(
            F.expr(
                "abs(CAST(cum_a AS DECIMAL(38,0)) * n_b"
                " - CAST(cum_b AS DECIMAL(38,0)) * n_a)"
                " * (v_next - v_c)"
            )
        ).alias("_emd_scaled"),
    )
    return agg.selectExpr(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        _w2d("_emd_scaled", "DIV") + " AS emd_scaled_d",
        f"""{exact_round_div_sql_wide(
            "_emd_scaled",
            "CAST(n_a AS DECIMAL(38,0)) * n_b", "DIV", 2
        )} AS emd_cents_r""",
    )


EMD_SQL = """
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
         CASE WHEN c.event_type = p.type_a THEN c.cnt ELSE 0 END AS ca,
         CASE WHEN c.event_type = p.type_b THEN c.cnt ELSE 0 END AS cb
  FROM counts c
  JOIN pairs p ON c.event_type = p.type_a OR c.event_type = p.type_b
),
byval AS (
  SELECT type_a, type_b, v_c,
         SUM(ca) AS na_v, SUM(cb) AS nb_v
  FROM member GROUP BY 1, 2, 3
),
stepped AS (
  SELECT type_a, type_b, v_c,
         SUM(na_v) OVER (PARTITION BY type_a, type_b ORDER BY v_c
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
         SUM(nb_v) OVER (PARTITION BY type_a, type_b ORDER BY v_c
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
         LEAD(v_c) OVER (PARTITION BY type_a, type_b ORDER BY v_c)
           AS v_next,
         SUM(na_v) OVER (PARTITION BY type_a, type_b) AS n_a,
         SUM(nb_v) OVER (PARTITION BY type_a, type_b) AS n_b
  FROM byval
),
agg AS (
  SELECT type_a, type_b,
         CAST(MAX(n_a) AS BIGINT) AS n_a,
         CAST(MAX(n_b) AS BIGINT) AS n_b,
         SUM(abs(CAST(cum_a AS HUGEINT) * n_b
             - CAST(cum_b AS HUGEINT) * n_a) * (v_next - v_c))
           AS emd_scaled
  FROM stepped WHERE v_next IS NOT NULL
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_a, n_b,
       {emd_w2d} AS emd_scaled_d,
       {emd_div} AS emd_cents_r
FROM agg
"""

def _emd_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql_wide,
    )

    return EMD_SQL.format(
        emd_div=exact_round_div_sql_wide(
            "emd_scaled", "CAST(n_a AS HUGEINT) * n_b", "//", 2
        ),
        emd_w2d=_w2d("emd_scaled", "//"),
    )


REGISTRY["emd_value_types"] = {
    "fn": emd_value_types,
    "sql": _emd_sql(),
}


# --------------------------------------------------------------------------
# AMS (Alon-Matias-Szegedy) F2-moment sketch over the user-frequency
# vector: K independent ±1 md5-sign rows, S_j = Σ_x sign_j(x)·f_x,
# F̂2 = mean_j S_j² — an EXACT integer pipeline on both engines (the
# signs are the portable md5 projection, so Spark and the DuckDB
# oracle build bit-identical sketches). Emitted beside the true
# F2 = Σ f_x² and the relative error, the audit a 100 TB self-join
# size estimator runs at a fraction of the exact pass's shuffle (the
# sketch is one map + a K-row reduce; the exact path shuffles the
# full frequency vector).
# --------------------------------------------------------------------------

AMS_ROWS = 16


def _ams_final(div: str) -> list[str]:
    est = f"{_w2d('s_sq', div)} / {AMS_ROWS}.0"
    tru = _w2d("f2_true", div)
    return [
        "k_rows",
        "n_users",
        f"{tru} AS f2_true_d",
        f"{est} AS f2_est",
        f"({est} - {tru}) / {tru} AS rel_err",
    ]


def ams_f2_sketch_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import phash_spark_sql

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    freq = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    truth = freq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.expr("CAST(f AS DECIMAL(38,0)) * f")).alias(
            "f2_true"
        ),
    )
    sign_bit = phash_spark_sql(
        "concat(CAST(j AS STRING), ':', CAST(user_id AS STRING))",
        bits=1,
    )
    rows_ = (
        freq.selectExpr(
            "user_id",
            "f",
            f"explode(sequence(0, {AMS_ROWS - 1})) AS j",
        )
        .selectExpr("j", f"(2 * {sign_bit} - 1) * f AS term")
        .groupBy("j")
        .agg(F.sum("term").cast("bigint").alias("s_j"))
    )
    sk = rows_.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_rows"),
        F.sum(F.expr("CAST(s_j AS DECIMAL(38,0)) * s_j")).alias(
            "s_sq"
        ),
    )
    return sk.crossJoin(F.broadcast(truth)).selectExpr(
        *_ams_final("DIV")
    )


def _ams_sql() -> str:
    from de4ml_spark.operators.portable_hash import phash_duck_sql

    sign_bit = phash_duck_sql(
        "concat(CAST(j AS STRING), ':', CAST(user_id AS STRING))",
        bits=1,
    )
    final = ",\n       ".join(_ams_final("//"))
    return f"""
WITH freq AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS f
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1
),
truth AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         SUM(CAST(f AS HUGEINT) * f) AS f2_true
  FROM freq
),
rows_ AS (
  SELECT j, CAST(SUM((2 * {sign_bit} - 1) * f) AS BIGINT) AS s_j
  FROM freq CROSS JOIN (
    SELECT unnest(range(0, {AMS_ROWS})) AS j
  )
  GROUP BY 1
),
sk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_rows,
         SUM(CAST(s_j AS HUGEINT) * s_j) AS s_sq
  FROM rows_
)
SELECT {final}
FROM sk CROSS JOIN truth
"""


REGISTRY["ams_f2_sketch_events"] = {
    "fn": ams_f2_sketch_events,
    "sql": _ams_sql(),
}


# --------------------------------------------------------------------------
# Benford SECOND-digit audit of order totals — the standard follow-up
# screen when the first-digit test passes (fabricators who know
# Benford's first-digit law rarely match the second-digit
# distribution; Nigrini's two-stage forensic protocol). P(d₂ = d) =
# Σ_{k=1..9} log10(1 + 1/(10k + d)) has no closed single-ratio form,
# so the ten expected probabilities are inlined CPython IEEE literals
# (identical text both engines). The second digit comes from the
# DECIMAL's string form (no float log10); per-digit chi² terms are
# micro-quantized before the exact total, like the first-digit twin.
# --------------------------------------------------------------------------

# repr(sum(math.log10(1 + 1/(10k+d)) for k in 1..9)) for d = 0..9
_BENFORD2_P = [
    "0.11967926859688073",
    "0.1138901034075564",
    "0.10882149900550823",
    "0.10432956023095939",
    "0.10030820226757937",
    "0.09667723580232243",
    "0.09337473578303615",
    "0.09035198926960332",
    "0.08757005357886138",
    "0.08499735205769224",
]


def _benford2_p_case() -> str:
    branches = " ".join(
        f"WHEN digit = {d} THEN {p}"
        for d, p in enumerate(_BENFORD2_P)
    )
    return f"(CASE {branches} END)"


def benford_second_digit_totalprice(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    obs = (
        orders.select(
            F.substring(
                F.col("o_totalprice")
                .cast("decimal(12,2)")
                .cast("string"),
                2,
                1,
            ).alias("d")
        )
        .filter(F.col("d").between("0", "9"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    )
    spine = spark.range(0, 10).select(
        F.col("id").alias("digit"),
        F.col("id").cast("string").alias("d"),
    )
    n = obs.agg(F.sum("observed").cast("bigint").alias("_n"))
    j = (
        spine.join(obs, "d", "left")
        .withColumn("observed", F.coalesce("observed", F.lit(0)))
        .crossJoin(F.broadcast(n))
    )
    terms = j.selectExpr(
        "digit",
        "observed",
        f"CAST(_n AS DOUBLE) * {_benford2_p_case()} AS __e",
    ).selectExpr(
        "digit",
        "observed",
        "CAST(floor(__e * 1000000.0 + 0.5) AS BIGINT)"
        " AS expected_micro",
        "CAST(floor((CAST(observed AS DOUBLE) - __e)"
        " * (CAST(observed AS DOUBLE) - __e) / __e"
        " * 1000000.0 + 0.5) AS BIGINT) AS term_micro",
    )
    from pyspark.sql import Window

    return terms.select(
        "digit",
        "observed",
        "expected_micro",
        "term_micro",
        (
            F.sum("term_micro")
            .over(
                Window.rowsBetween(
                    Window.unboundedPreceding,
                    Window.unboundedFollowing,
                )
            )
            .cast("double")
            / 1_000_000.0
        ).alias("chi2_r"),
    ).orderBy("digit")


def _benford2_sql() -> str:
    return f"""
WITH obs AS (
  SELECT substring(CAST(CAST(o_totalprice AS DECIMAL(12,2))
                   AS VARCHAR), 2, 1) AS d,
         CAST(COUNT(*) AS BIGINT) AS observed
  FROM orders
  WHERE substring(CAST(CAST(o_totalprice AS DECIMAL(12,2))
                  AS VARCHAR), 2, 1) BETWEEN '0' AND '9'
  GROUP BY 1
),
spine AS (
  SELECT unnest(range(0, 10)) AS digit
),
n AS (SELECT CAST(SUM(observed) AS BIGINT) AS _n FROM obs),
j AS (
  SELECT digit, COALESCE(observed, 0) AS observed, _n
  FROM spine
  LEFT JOIN obs ON obs.d = CAST(digit AS VARCHAR)
  CROSS JOIN n
),
terms AS (
  SELECT digit, observed,
         CAST(floor(__e * 1000000.0 + 0.5) AS BIGINT)
           AS expected_micro,
         CAST(floor((CAST(observed AS DOUBLE) - __e)
              * (CAST(observed AS DOUBLE) - __e) / __e
              * 1000000.0 + 0.5) AS BIGINT) AS term_micro
  FROM (
    SELECT digit, observed,
           CAST(_n AS DOUBLE) * {_benford2_p_case()} AS __e
    FROM j
  )
)
SELECT digit, observed, expected_micro, term_micro,
       CAST(SUM(term_micro) OVER () AS DOUBLE) / 1000000.0 AS chi2_r
FROM terms
ORDER BY digit
"""


REGISTRY["benford_second_digit_totalprice"] = {
    "fn": benford_second_digit_totalprice,
    "sql": _benford2_sql(),
}
