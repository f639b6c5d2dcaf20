"""Deterministic sampling / mixing / split queries — reproducible,
engine-auditable row selection (operators/sampling.py). The md5-hex
membership function is identical in DuckDB, so these are fully oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de4ml_spark.operators.sampling import (
    deterministic_sample,
    group_split,
    key_hex_sql,
    mix_sources,
)
from de4ml_spark.session import load_events_finite, load_table


def sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, 0.2, "doc_id").select(
        "doc_id", "lang", "source"
    )


SAMPLE_DOCS_SQL = f"""
SELECT doc_id, lang, source FROM documents
WHERE {key_hex_sql('doc_id', '')} < '33333333'
"""


def mix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-mixture shape: per-source rates in one pass."""
    docs = load_table(spark, sf_dir, "documents")
    return mix_sources(
        docs, {"src1": 0.5, "src2": 1.0, "src3": 0.25}, key_col="doc_id"
    ).select("doc_id", "source")


MIX_DOCS_SQL = f"""
SELECT doc_id, source FROM documents
WHERE {key_hex_sql('doc_id', 'mix')} <
  CASE source
    WHEN 'src1' THEN '80000000'
    WHEN 'src2' THEN 'g'
    WHEN 'src3' THEN '40000000'
    ELSE '00000000'
  END
"""


def split_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe group split: per-split row/user counts (every user's
    rows land wholly in one split — asserted in tests/test_etl.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        group_split(ev, "user_id", test_fraction=0.25)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


SPLIT_EVENTS_SQL = f"""
SELECT CASE WHEN {key_hex_sql('user_id', 'split')} < '40000000'
            THEN 'test' ELSE 'train' END AS split,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Weighted deterministic sampling: keep probability proportional to a
# per-row weight (token count here — length-weighted corpus sampling).
# Membership: uniform hash u in [0,1) from the md5 prefix; keep iff
# u < weight / max_weight * base_rate. Deterministic, engine-auditable,
# skew-free like the unweighted sampler.
# --------------------------------------------------------------------------

WEIGHTED_BASE = 0.3
MAX_TOKENS = 120.0  # documents cap ~100 tokens; headroom for the ratio


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    hex8 = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("wsamp"))), 1, 8
    )
    p = F.size(tokens("text")) / F.lit(MAX_TOKENS) * F.lit(WEIGHTED_BASE)
    # per-row hex threshold: p in [0, 0.3] so no >= 1.0 clamp needed;
    # lexicographic compare on lowercase hex equals numeric order
    thr = F.format_string(
        "%08x", F.round(p * (0xFFFFFFFF + 1)).cast("bigint")
    )
    return docs.filter(hex8 < thr).select("doc_id", "lang", "source")


WEIGHTED_SAMPLE_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, source,
         substr(md5(CAST(doc_id AS VARCHAR) || 'wsamp'), 1, 8) AS hex8,
         printf('%08x', CAST(round(len(string_split(text, ' '))
               / {MAX_TOKENS} * {WEIGHTED_BASE} * 4294967296) AS BIGINT)) AS thr
  FROM documents
)
SELECT doc_id, lang, source FROM t WHERE hex8 < thr
"""


# --------------------------------------------------------------------------
# K-fold CV accounting: leakage-safe folds (fold = function of the GROUP
# key) with per-fold row/user counts — every user's rows land wholly in
# one fold, the group_split invariant generalized to k folds.
# --------------------------------------------------------------------------

N_FOLDS = 5


def kfold_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fold (n_rows, n_users) for md5-bucketed ``N_FOLDS`` folds.

    Scale: map-only fold assignment + one two-key-free groupBy; the
    count_distinct is per-fold (bounded group count)."""
    from de4ml_spark.operators.portable_hash import phash_spark_sql

    ev = load_table(spark, sf_dir, "events")
    fold = F.expr(phash_spark_sql("CAST(user_id AS STRING)", bits=16)) % N_FOLDS
    return (
        ev.select(fold.alias("fold"), "user_id")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def _kfold_sql() -> str:
    from de4ml_spark.operators.portable_hash import phash_duck_sql

    fold = f"({phash_duck_sql('CAST(user_id AS VARCHAR)', bits=16)} % {N_FOLDS})"
    return f"""
SELECT {fold} AS fold,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Temporal split with leakage diagnostic: train = events before the
# cutoff, test = after; the diagnostic counts users present on BOTH sides
# (their test rows are "seen users" — fine for forecasting, leakage for
# user-level generalization claims) — the check every temporal split
# needs before results are believed.
# --------------------------------------------------------------------------

TEMPORAL_CUTOFF = "2024-01-22 00:00:00"


def temporal_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(TEMPORAL_CUTOFF).cast("timestamp_ntz")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("ts") < cutoff, 1)).alias("n_train"),
        F.count(F.when(F.col("ts") >= cutoff, 1)).alias("n_test"),
    )
    return per_user.agg(
        F.count(F.when(F.col("n_train") > 0, 1)).alias("train_users"),
        F.count(F.when(F.col("n_test") > 0, 1)).alias("test_users"),
        F.count(
            F.when((F.col("n_train") > 0) & (F.col("n_test") > 0), 1)
        ).alias("overlap_users"),
        F.sum("n_train").alias("train_rows"),
        F.sum("n_test").alias("test_rows"),
    )


TEMPORAL_SPLIT_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         COUNT(*) FILTER (WHERE ts < TIMESTAMP '{TEMPORAL_CUTOFF}')
           AS n_train,
         COUNT(*) FILTER (WHERE ts >= TIMESTAMP '{TEMPORAL_CUTOFF}')
           AS n_test
  FROM events GROUP BY user_id
)
SELECT COUNT(*) FILTER (WHERE n_train > 0) AS train_users,
       COUNT(*) FILTER (WHERE n_test > 0) AS test_users,
       COUNT(*) FILTER (WHERE n_train > 0 AND n_test > 0) AS overlap_users,
       CAST(SUM(n_train) AS BIGINT) AS train_rows,
       CAST(SUM(n_test) AS BIGINT) AS test_rows
FROM per_user
"""


REGISTRY: dict[str, dict] = {
    "kfold_events": {"fn": kfold_events, "sql": _kfold_sql()},
    "temporal_split_leakage": {
        "fn": temporal_split_leakage,
        "sql": TEMPORAL_SPLIT_SQL,
    },
    "sample_docs": {"fn": sample_docs, "sql": SAMPLE_DOCS_SQL},
    "mix_docs": {"fn": mix_docs, "sql": MIX_DOCS_SQL},
    "split_events": {"fn": split_events, "sql": SPLIT_EVENTS_SQL},
    "weighted_sample_docs": {
        "fn": weighted_sample_docs,
        "sql": WEIGHTED_SAMPLE_SQL,
    },
}


# --------------------------------------------------------------------------
# Neyman (variance-proportional) stratified sample allocation: allocate
# a fixed budget across event-type strata proportional to N_h * sigma_h
# — the survey-sampling optimum for estimating the overall mean. The
# exactness chain extends the repo playbook with one more primitive:
# IEEE-754 REQUIRES sqrt to be correctly rounded (like + - * /), so
# sigma_h = sqrt of an exactly-derived double is engine-identical. The
# variance itself is the exact integer rational (n*Sxx - Sx^2)/n^2 in
# cents^2 (decimal-exact sums), weights quantize to integer micro units,
# and the final seats come from the largest-remainder (Hamilton) method
# — pure integer arithmetic with a deterministic tie order, so the
# ALLOCATION (not just the weights) is bit-identical across engines.
# Scale: one map-side-combined groupBy to per-stratum moments; the
# allocation runs on the n_strata-row frame.
# --------------------------------------------------------------------------

NEYMAN_BUDGET = 1_000


def neyman_allocation_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
        ).alias("sx"),
        F.sum(
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .cast("decimal(38,0)")
            * (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .cast("decimal(38,0)")
        ).alias("sxx"),
    )
    w = m.selectExpr(
        "event_type",
        "n",
        # population variance in cents^2: (n*Sxx - Sx^2)/n^2, exact
        # integer numerator -> one double division -> one sqrt, all
        # correctly rounded
        "CAST(floor(CAST(n AS DOUBLE) * sqrt("
        " CAST(CAST(n AS DECIMAL(38,0)) * sxx"
        "      - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))"
        " AS DOUBLE)"
        " / CAST(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))"
        " AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS w_micro",
    )
    tot = w.agg(F.sum("w_micro").alias("_tw"))
    alloc = (
        w.crossJoin(F.broadcast(tot))
        .selectExpr(
            "event_type",
            "n",
            "w_micro",
            f"CAST(({NEYMAN_BUDGET} * w_micro) DIV NULLIF(_tw, 0) AS BIGINT) AS base",
            f"CAST(({NEYMAN_BUDGET} * w_micro) % NULLIF(_tw, 0) AS BIGINT) AS rem",
        )
    )
    wt = Window.orderBy(F.desc("rem"), F.asc("event_type"))
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        alloc.withColumn("leftover", NEYMAN_BUDGET - F.sum("base").over(wall))
        .withColumn("rk", F.row_number().over(wt))
        .selectExpr(
            "event_type",
            "n",
            "w_micro",
            "CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END"
            " AS BIGINT) AS n_alloc",
        )
    )


NEYMAN_SQL = f"""
WITH m AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS sx,
         SUM(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS DECIMAL(38,0))
             * CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS DECIMAL(38,0))) AS sxx
  FROM events GROUP BY 1
),
w AS (
  SELECT event_type, n,
         CAST(floor(CAST(n AS DOUBLE) * sqrt(
           CAST(CAST(n AS DECIMAL(38,0)) * sxx
                - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))
           AS DOUBLE)
           / CAST(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
           AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS w_micro
  FROM m
),
tot AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS tw FROM w),
alloc AS (
  SELECT w.event_type, w.n, w.w_micro,
         CAST(({NEYMAN_BUDGET} * w.w_micro) // NULLIF(t.tw, 0) AS BIGINT) AS base,
         CAST(({NEYMAN_BUDGET} * w.w_micro) % NULLIF(t.tw, 0) AS BIGINT) AS rem
  FROM w CROSS JOIN tot t
),
ranked AS (
  SELECT *,
         CAST({NEYMAN_BUDGET} - SUM(base) OVER () AS BIGINT) AS leftover,
         ROW_NUMBER() OVER (ORDER BY rem DESC, event_type ASC) AS rk
  FROM alloc
)
SELECT event_type, n, w_micro,
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS n_alloc
FROM ranked
"""

REGISTRY["neyman_allocation_events"] = {
    "fn": neyman_allocation_events,
    "sql": NEYMAN_SQL,
}


# --------------------------------------------------------------------------
# Weighted reservoir sampling WITHOUT replacement (Efraimidis-Spirakis
# A-ES): each doc draws u = (h+1)/2^40 from the portable hash and the
# sample is the top-k by key u^(1/w) — equivalently by ln(u)/w
# descending, which is how it is computed here: ln(u) = -ln(2^40/(h+1))
# is a portable-ln of an integer ratio quantized to micro units, and the
# per-doc key is ONE correctly-rounded division by the integer weight —
# so the SAMPLE SET is deterministic and cross-engine exact, unlike any
# rand()-based reservoir. Weight = token count (longer docs
# proportionally likelier, the corpus-sampling norm). Top-k is a plain
# rank window: at 100 TB this is the same TakeOrdered shape as every
# top-k, with the hash/ln map-side.
# --------------------------------------------------------------------------

AES_K = 64
_AES_DOMAIN = 1 << 40


def weighted_reservoir_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from de4ml_spark.operators.portable_hash import (
        phash_spark_sql,
        with_portable_ln,
    )
    from de4ml_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("w"),
    ).filter(F.col("w") > 0)
    hexpr = phash_spark_sql("CAST(doc_id AS STRING) || 'aes'", 40)
    hashed = base.selectExpr("doc_id", "w", f"{hexpr} + 1 AS hp")
    keyed = with_portable_ln(
        hashed, str(_AES_DOMAIN), "hp", "__lnr"
    ).selectExpr(
        "doc_id",
        "w",
        "CAST(-CAST(floor(__lnr * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE)"
        " / CAST(w AS DOUBLE) AS aes_key",
    )
    wnd = Window.orderBy(F.desc("aes_key"), F.asc("doc_id"))
    return (
        keyed.withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= AES_K)
        .select("doc_id", "w", "aes_key", "rank")
    )


def _weighted_reservoir_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        phash_duck_sql,
        portable_ln_duck_ctes,
    )

    return f"""
WITH base AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         {phash_duck_sql("CAST(doc_id AS VARCHAR) || 'aes'", 40)} + 1 AS hp
  FROM documents
  WHERE len(string_split(text, ' ')) > 0
),
{portable_ln_duck_ctes("base", "doc_id, w",
                       str(_AES_DOMAIN), "hp", "lnr", "pl")},
keyed AS (
  SELECT doc_id, w,
         CAST(-CAST(floor(lnr * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE)
           / CAST(w AS DOUBLE) AS aes_key
  FROM pl_out
)
SELECT doc_id, w, aes_key,
       ROW_NUMBER() OVER (ORDER BY aes_key DESC, doc_id ASC) AS rank
FROM keyed
QUALIFY rank <= {AES_K}
"""


REGISTRY["weighted_reservoir_docs"] = {
    "fn": weighted_reservoir_docs,
    "sql": _weighted_reservoir_sql(),
}


# --------------------------------------------------------------------------
# Poisson bootstrap confidence interval for the mean event value —
# THE distributed bootstrap (Chamandy et al.): each of B replicates
# weights every row by an independent Poisson(1) draw, so replicates
# build in ONE pass with no resampling shuffle. Draws are
# deterministic: the portable 59-bit md5 uniform per (rep, event)
# against the EXACT integer thresholds of the Poisson(1) inverse CDF
# (literals identical on both engines). Replicate means are half-up
# micro-quantized exact integers; the CI frame is B = 32 rows, and
# lower/upper are index-1 / index-30 of the sorted replicate means
# (~the 2.5/97.5 percentiles at B = 32, documented convention).
# --------------------------------------------------------------------------

BOOT_REPS = 32
# int(round(cum_cdf(Poisson(1), k) * 2^59)) for k = 0..7 (then cap)
_POIS_T = [
    212068059414652672,
    424136118829305344,
    530170148536631680,
    565514825105740480,
    574350994248017664,
    576118228076473088,
    576412767047882304,
    576454844043797888,
]


def _pois_weight(h: str) -> str:
    branches = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"(CASE {branches} ELSE 8 END)"


_BOOT_FINAL = [
    "n_events",
    "mean_value_cents",
    "b_reps",
    "ci_lo_cents",
    "ci_hi_cents",
]


def poisson_bootstrap_value_mean(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from de4ml_spark.operators.portable_hash import (
        phash_spark_sql,
        wide_halfup_div_sql as _whd,
    )

    ev = load_events_finite(spark, sf_dir)
    base = ev.selectExpr(
        "event_id",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c",
    )
    h = phash_spark_sql(
        "concat(CAST(r AS STRING), ':', CAST(event_id AS STRING))",
        bits=59,
    )
    reps = base.selectExpr(
        "event_id",
        "v_c",
        f"explode(sequence(0, {BOOT_REPS - 1})) AS r",
    ).selectExpr("r", "v_c", f"{_pois_weight(h)} AS w")
    per = reps.groupBy("r").agg(
        F.sum("w").cast("bigint").alias("sw"),
        F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * v_c")).alias("swx"),
    )
    means = per.selectExpr(
        f"CAST({_whd('swx * 1000000', 'sw', 'DIV')} AS BIGINT)"
        " AS mean_u"
    ).filter(
        # a rep whose every Poisson weight is 0 resamples nothing and
        # has no mean (NULL via the NULLIF-guarded division) — drop it
        # BEFORE ranking: Spark sorts NULLs first, DuckDB last, so a
        # NULL entering ROW_NUMBER shifts rk=2/rk=B-1 differently per
        # engine (1-row-shard parity finding, round 14). Impossible at
        # real SF (P(all n weights = 0) = e^{-n}).
        "mean_u IS NOT NULL"
    )
    wq = Window.partitionBy(F.lit(1)).orderBy("mean_u")
    ranked = means.withColumn("rk", F.row_number().over(wq))
    ci = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("b_reps"),
        F.max(F.expr("CASE WHEN rk = 2 THEN mean_u END")).alias(
            "lo_u"
        ),
        F.max(
            F.expr(f"CASE WHEN rk = {BOOT_REPS - 1} THEN mean_u END")
        ).alias("hi_u"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("v_c").cast("bigint").alias("sx"),
    )
    out = tot.crossJoin(F.broadcast(ci)).selectExpr(
        "n_events",
        "CAST(sx AS DOUBLE) / CAST(n_events AS DOUBLE)"
        " AS mean_value_cents",
        "b_reps",
        "CAST(lo_u AS DOUBLE) / 1000000.0 AS ci_lo_cents",
        "CAST(hi_u AS DOUBLE) / 1000000.0 AS ci_hi_cents",
    )
    return out.select(*_BOOT_FINAL)


def _boot_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        phash_duck_sql,
        wide_halfup_div_sql as _whd,
    )

    h = phash_duck_sql(
        "concat(CAST(r AS STRING), ':', CAST(event_id AS STRING))",
        bits=59,
    )
    return f"""
WITH base AS (
  SELECT event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c
  FROM events WHERE value IS NOT NULL
),
reps AS (
  SELECT r, v_c, {_pois_weight(h)} AS w
  FROM base CROSS JOIN (
    SELECT unnest(range(0, {BOOT_REPS})) AS r
  )
),
per AS (
  SELECT r, CAST(SUM(w) AS BIGINT) AS sw,
         SUM(CAST(w AS HUGEINT) * v_c) AS swx
  FROM reps GROUP BY 1
),
means AS (
  SELECT CAST({_whd('swx * 1000000', 'sw', '//')} AS BIGINT)
           AS mean_u
  FROM per
),
ranked AS (
  SELECT mean_u, ROW_NUMBER() OVER (ORDER BY mean_u) AS rk
  FROM means WHERE mean_u IS NOT NULL
),
ci AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS b_reps,
         MAX(CASE WHEN rk = 2 THEN mean_u END) AS lo_u,
         MAX(CASE WHEN rk = {BOOT_REPS - 1} THEN mean_u END) AS hi_u
  FROM ranked
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(v_c) AS BIGINT) AS sx
  FROM base
)
SELECT n_events,
       CAST(sx AS DOUBLE) / CAST(n_events AS DOUBLE)
         AS mean_value_cents,
       b_reps,
       CAST(lo_u AS DOUBLE) / 1000000.0 AS ci_lo_cents,
       CAST(hi_u AS DOUBLE) / 1000000.0 AS ci_hi_cents
FROM tot CROSS JOIN ci
"""


REGISTRY["poisson_bootstrap_value_mean"] = {
    "fn": poisson_bootstrap_value_mean,
    "sql": _boot_sql(),
}
