"""ML-evaluation tier (round 9): scorecard / drift diagnostics a
feature-engineering pipeline runs before shipping a training set —
decile lift & gains, weight-of-evidence / information value,
population-stability (PSI), inter-annotator agreement (Cohen's κ),
and Jensen-Shannon source divergence.

Reference parity: the reference's dataops loop gates batches on
profile-derived rules (dataops/app/profile.py); these are the
standard modeling-facing extensions of that gate (is the score
monotone in the outcome; did the population shift; do two labeling
rules agree).

Exactness discipline (operators/portable_hash.py): counts and cents
histograms end-to-end; every logarithm is the portable ln of an
INTEGER rational (with a max/min flip for sub-unit ratios), HALF-UP
micro-quantized BEFORE any weighted SUM; 128-bit internals convert
through wide_to_double_sql; the scalar tail is the same SQL text on
both engines. Result schemas stay on the driver-safe whitelist.

Scale posture (100 TB): every entry reduces the log with one groupBy
to a bucket table (≤ dozens of rows) before any window/ln work. The
decile assignment in lift_deciles_events is the distributed
range-partition NTILE (operators/rank.py) — never a global
single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.operators.portable_hash import (
    portable_ln_duck_ctes,
    wide_halfup_div_sql as _whd,
    wide_to_double_sql as _w2d,
    with_portable_ln,
)
from de4ml_spark.session import load_events_finite, load_table

REGISTRY: dict = {}


def _big(div: str) -> str:
    return "DECIMAL(38,0)" if div.upper() == "DIV" else "HUGEINT"


# --------------------------------------------------------------------------
# Decile lift & cumulative gains of `value` as a score for
# event_type='purchase' — the model-scorecard table (per-decile
# conversion rate, lift vs base rate, cumulative gain). The decile is
# an exact global NTILE(10) over the (value, event_id) total order
# via the distributed range-partition rank (operators/rank.py) — the
# oracle's NTILE(10) OVER (ORDER BY ...) single-partition window is
# the test-scale twin, never the Spark plan. Rates and lifts are
# single divisions of exact integers (fixed association); the
# cumulative runs over 10 rows.
# --------------------------------------------------------------------------

_LIFT_FINAL = [
    "decile",
    "n_d",
    "conv_d",
    "cum_conv",
    "CAST(conv_d AS DOUBLE) / NULLIF(CAST(n_d AS DOUBLE), 0.0)"
    " AS conv_rate",
    "(CAST(conv_d AS DOUBLE) * CAST(n_tot AS DOUBLE))"
    " / NULLIF(CAST(n_d AS DOUBLE) * CAST(conv_tot AS DOUBLE), 0.0)"
    " AS lift",
    "CAST(cum_conv AS DOUBLE) / NULLIF(CAST(conv_tot AS DOUBLE), 0.0)"
    " AS cum_gain",
]


def lift_deciles_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.rank import with_global_ntile

    ev = load_table(spark, sf_dir, "events")
    scored = load_events_finite(spark, sf_dir).filter(
        F.col("event_type").isNotNull()
    ).selectExpr(
        "event_id",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c",
        "CAST(event_type = 'purchase' AS BIGINT) AS is_pos",
    )
    tiled = with_global_ntile(
        scored, [F.col("v_c").desc(), F.col("event_id").desc()], 10,
        out_col="decile",
    )
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_d"),
        F.sum("is_pos").cast("bigint").alias("conv_d"),
    )
    tot = per.agg(
        F.sum("n_d").cast("bigint").alias("n_tot"),
        F.sum("conv_d").cast("bigint").alias("conv_tot"),
    )
    # cumulative over the TEN decile rows via a triangular self-join —
    # equivalent to a global-order window but with no
    # Exchange SinglePartition node, so the catalog-wide plan contract
    # (tests/test_rank_ops.py) can assert this entry sort-free
    prior = per.selectExpr(
        "decile AS d2", "conv_d AS conv2"
    )
    cum = (
        per.join(F.broadcast(prior), F.expr("d2 <= decile"))
        .groupBy("decile", "n_d", "conv_d")
        .agg(F.sum("conv2").cast("bigint").alias("cum_conv"))
        .crossJoin(F.broadcast(tot))
    )
    return cum.selectExpr(
        "CAST(decile AS BIGINT) AS decile", *_LIFT_FINAL[1:]
    )


def _lift_sql() -> str:
    final = ",\n       ".join(_LIFT_FINAL[1:])
    return f"""
WITH scored AS (
  SELECT event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_pos
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
),
tiled AS (
  SELECT is_pos,
         NTILE(10) OVER (ORDER BY v_c DESC, event_id DESC) AS decile
  FROM scored
),
per AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n_d,
         CAST(SUM(is_pos) AS BIGINT) AS conv_d
  FROM tiled GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_d) AS BIGINT) AS n_tot,
         CAST(SUM(conv_d) AS BIGINT) AS conv_tot
  FROM per
),
cum AS (
  SELECT decile, n_d, conv_d,
         CAST(SUM(conv_d) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_conv
  FROM per
)
SELECT CAST(decile AS BIGINT) AS decile,
       {final}
FROM cum CROSS JOIN tot
"""


REGISTRY["lift_deciles_events"] = {
    "fn": lift_deciles_events,
    "sql": _lift_sql(),
}


# --------------------------------------------------------------------------
# Weight of evidence / information value of the $50 value bucket for
# event_type='purchase' — the classic scorecard feature-strength
# measure. Counts are Laplace-smoothed IN INTEGERS (g' = 2g+1 per
# bucket, G' = 2G+k over k buckets) so empty cells stay finite and
# every WoE is the portable ln of an integer rational, flipped
# through max/min for sub-unit ratios and sign-restored. IV is the
# micro-quantized weighted sum Σ (g'·B' − b'·G')·⌊WoE·10⁶⌉ carried
# 128-bit, normalized once through wide_to_double. Scale: one groupBy
# to the bucket table.
# --------------------------------------------------------------------------


def _woe_iv_final(div: str) -> list[str]:
    return [
        "bucket",
        "n_good",
        "n_bad",
        "woe",
        f"{_w2d('iv_num', div)} / (CAST(g_tot AS DOUBLE)"
        " * CAST(b_tot AS DOUBLE) * 1000000.0) AS iv_total",
    ]


def woe_iv_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per = (
        load_events_finite(spark, sf_dir).filter(
            F.col("event_type").isNotNull()
        )
        .selectExpr(
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 5000 AS bucket",
            "CAST(event_type = 'purchase' AS BIGINT) AS is_pos",
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_pos").cast("bigint").alias("n_good"),
            F.sum(F.expr("1 - is_pos")).cast("bigint").alias("n_bad"),
        )
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_b"),
        F.sum("n_good").cast("bigint").alias("g_raw"),
        F.sum("n_bad").cast("bigint").alias("b_raw"),
    )
    sm = per.crossJoin(F.broadcast(tot)).selectExpr(
        "bucket",
        "n_good",
        "n_bad",
        "2 * n_good + 1 AS g_s",
        "2 * n_bad + 1 AS b_s",
        "2 * g_raw + k_b AS g_tot",
        "2 * b_raw + k_b AS b_tot",
    )
    # WoE = ln((g_s·b_tot)/(b_s·g_tot)), via max/min so p >= q >= 1
    sm = sm.selectExpr(
        "*",
        "CAST(g_s AS DECIMAL(38,0)) * b_tot AS num",
        "CAST(b_s AS DECIMAL(38,0)) * g_tot AS den",
    )
    lned = with_portable_ln(
        sm,
        "CASE WHEN num >= den THEN num ELSE den END",
        "CASE WHEN num >= den THEN den ELSE num END",
        "__pln",
    ).selectExpr(
        "bucket",
        "n_good",
        "n_bad",
        "g_tot",
        "b_tot",
        "num",
        "den",
        "CASE WHEN num >= den THEN __pln ELSE -__pln END AS woe",
        "CAST(floor((CASE WHEN num >= den THEN __pln ELSE -__pln END)"
        " * 1000000.0 + 0.5) AS BIGINT) AS woe_u",
    )
    ivn = lned.agg(
        F.sum(F.expr("(num - den) * woe_u")).alias("iv_num")
    )
    return (
        lned.crossJoin(F.broadcast(ivn))
        .selectExpr(*_woe_iv_final("DIV"))
        .orderBy("bucket")
    )


def _woe_iv_sql() -> str:
    final = ",\n       ".join(_woe_iv_final("//"))
    ln_ctes = portable_ln_duck_ctes(
        "sm",
        "bucket, n_good, n_bad, g_tot, b_tot, num, den",
        "CASE WHEN num >= den THEN num ELSE den END",
        "CASE WHEN num >= den THEN den ELSE num END",
        "pln",
        "wl",
    )
    return f"""
WITH per AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 5000
           AS bucket,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_good,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
              AS BIGINT) AS n_bad
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_b,
         CAST(SUM(n_good) AS BIGINT) AS g_raw,
         CAST(SUM(n_bad) AS BIGINT) AS b_raw
  FROM per
),
sm AS (
  SELECT bucket, n_good, n_bad,
         2 * g_raw + k_b AS g_tot,
         2 * b_raw + k_b AS b_tot,
         CAST(2 * n_good + 1 AS HUGEINT) * (2 * b_raw + k_b) AS num,
         CAST(2 * n_bad + 1 AS HUGEINT) * (2 * g_raw + k_b) AS den
  FROM per CROSS JOIN tot
),
{ln_ctes},
lned AS (
  SELECT bucket, n_good, n_bad, g_tot, b_tot, num, den,
         CASE WHEN num >= den THEN pln ELSE -pln END AS woe,
         CAST(floor((CASE WHEN num >= den THEN pln ELSE -pln END)
              * 1000000.0 + 0.5) AS BIGINT) AS woe_u
  FROM wl_out
),
ivn AS (
  SELECT SUM((num - den) * woe_u) AS iv_num FROM lned
)
SELECT {final}
FROM lned CROSS JOIN ivn
ORDER BY bucket
"""


REGISTRY["woe_iv_events"] = {
    "fn": woe_iv_events,
    "sql": _woe_iv_sql(),
}


# --------------------------------------------------------------------------
# Cohen's κ between two deterministic document-quality annotators
# (rule A: n_chars ≥ 300; rule B: ≥ 50 whitespace tokens) — the
# standard chance-corrected agreement measure for label-rule audits.
# κ = (N·agree − Σ_c a_c·b_c) / (N² − Σ_c a_c·b_c), one exact integer
# rational converted through wide_to_double. Scale: map-only flags +
# one 4-cell aggregate.
# --------------------------------------------------------------------------


def _kappa_final(div: str) -> list[str]:
    big = _big(div)
    pe_num = (
        f"CAST(a1 AS {big}) * b1 + CAST(n_tot - a1 AS {big})"
        " * (n_tot - b1)"
    )
    num = f"CAST(n_tot AS {big}) * agree - ({pe_num})"
    den = f"CAST(n_tot AS {big}) * n_tot - ({pe_num})"
    return [
        "n_tot",
        "agree",
        "a1",
        "b1",
        "CAST(agree AS DOUBLE) / NULLIF(CAST(n_tot AS DOUBLE), 0.0)"
        " AS po",
        f"{_w2d(num, div)} / NULLIF({_w2d(den, div)}, 0.0)"
        " AS kappa",
    ]


def cohens_kappa_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # CASE ... ELSE 0, not CAST(cond AS BIGINT): a NULL text/n_chars
    # doc must FAIL the quality rule (0) on both engines — the bare
    # CAST keeps NULL where the oracle's CASE maps it to 0 (round-14
    # nulldocs parity sweep caught the whole rater-agreement family)
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
    return agg.selectExpr(*_kappa_final("DIV"))


def _kappa_sql() -> str:
    final = ",\n       ".join(_kappa_final("//"))
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


REGISTRY["cohens_kappa_docs"] = {
    "fn": cohens_kappa_docs,
    "sql": _kappa_sql(),
}


# --------------------------------------------------------------------------
# Jensen-Shannon divergence of each source's document-length
# distribution from the pooled corpus (50-char buckets) — the
# symmetric bounded divergence used to rank sources by "how unlike
# the corpus is this source" during mixture curation. Both KL halves
# use ratios that are integer rationals by construction
# (p_i/m_i = 2·c_i·M / (c_i·M + d_i·N)), portable-ln'd through the
# max/min flip, micro-quantized, and integer-summed per source; the
# ÷2 normalization and the final division are one IEEE chain.
# Scale: one groupBy to (source × bucket); everything after is
# bucket-table-bounded.
# --------------------------------------------------------------------------


def _js_final(div: str) -> list[str]:
    return [
        "source",
        "n_src",
        f"({_w2d('p_sum_u', div)} / (CAST(n_src AS DOUBLE)"
        " * 1000000.0)"
        f" + {_w2d('q_sum_u', div)} / (CAST(n_pool AS DOUBLE)"
        " * 1000000.0)) / 2.0 AS js_divergence",
    ]


def js_divergence_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    binned = docs.selectExpr(
        "source", "n_chars DIV 50 AS bucket"
    )
    per = binned.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    pool = binned.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    sizes = per.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_src")
    )
    n_pool = pool.agg(F.sum("d").cast("bigint").alias("n_pool"))
    # dense (pooled-bucket × source) grid — the Q-half needs every
    # pooled bucket per source with the source's count defaulted to 0;
    # the grid is histogram×k-bounded, never corpus-sized
    j = (
        pool.crossJoin(F.broadcast(sizes))
        .join(per, ["bucket", "source"], "left")
        .join(F.broadcast(n_pool))
        .selectExpr(
            "source",
            "bucket",
            "COALESCE(c, 0) AS c",
            "d",
            "n_src",
            "n_pool",
        )
    )
    # dense per-(source, bucket) grid over occupied pooled buckets:
    # m ∝ c·n_pool + d·n_src (common denominator 2·n_src·n_pool)
    grid = j.selectExpr(
        "source",
        "c",
        "d",
        "n_src",
        "n_pool",
        "CAST(c AS DECIMAL(38,0)) * n_pool AS cm",
        "CAST(d AS DECIMAL(38,0)) * n_src AS dn",
    )
    p_half = with_portable_ln(
        grid.filter("c > 0"),
        "CASE WHEN 2 * cm >= cm + dn THEN 2 * cm ELSE cm + dn END",
        "CASE WHEN 2 * cm >= cm + dn THEN cm + dn ELSE 2 * cm END",
        "__plp",
    ).selectExpr(
        "source",
        "c * CAST(floor((CASE WHEN 2 * cm >= cm + dn THEN __plp"
        " ELSE -__plp END) * 1000000.0 + 0.5) AS BIGINT) AS p_u",
    )
    q_half = with_portable_ln(
        grid,
        "CASE WHEN 2 * dn >= cm + dn THEN 2 * dn ELSE cm + dn END",
        "CASE WHEN 2 * dn >= cm + dn THEN cm + dn ELSE 2 * dn END",
        "__plq",
    ).selectExpr(
        "source",
        "d * CAST(floor((CASE WHEN 2 * dn >= cm + dn THEN __plq"
        " ELSE -__plq END) * 1000000.0 + 0.5) AS BIGINT) AS q_u",
    )
    psum = p_half.groupBy("source").agg(
        F.sum(F.expr("CAST(p_u AS DECIMAL(38,0))")).alias("p_sum_u")
    )
    qsum = q_half.groupBy("source").agg(
        F.sum(F.expr("CAST(q_u AS DECIMAL(38,0))")).alias("q_sum_u")
    )
    out = (
        psum.join(qsum, "source")
        .join(F.broadcast(sizes), "source")
        .join(F.broadcast(n_pool))
    )
    return out.selectExpr(*_js_final("DIV")).orderBy("source")


def _js_sql() -> str:
    final = ",\n       ".join(_js_final("//"))
    lnp = portable_ln_duck_ctes(
        "pgrid",
        "source, c, cm, dn",
        "CASE WHEN 2 * cm >= cm + dn THEN 2 * cm ELSE cm + dn END",
        "CASE WHEN 2 * cm >= cm + dn THEN cm + dn ELSE 2 * cm END",
        "plp",
        "jp",
    )
    lnq = portable_ln_duck_ctes(
        "grid",
        "source, d, cm, dn",
        "CASE WHEN 2 * dn >= cm + dn THEN 2 * dn ELSE cm + dn END",
        "CASE WHEN 2 * dn >= cm + dn THEN cm + dn ELSE 2 * dn END",
        "plq",
        "jq",
    )
    return f"""
WITH binned AS (
  SELECT source, n_chars // 50 AS bucket FROM documents
),
per AS (
  SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM binned GROUP BY 1, 2
),
pool AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS d
  FROM binned GROUP BY 1
),
sizes AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_src FROM per GROUP BY 1
),
npool AS (
  SELECT CAST(SUM(d) AS BIGINT) AS n_pool FROM pool
),
grid AS (
  SELECT s.source, COALESCE(p.c, 0) AS c, l.d, s.n_src, np.n_pool,
         CAST(COALESCE(p.c, 0) AS HUGEINT) * np.n_pool AS cm,
         CAST(l.d AS HUGEINT) * s.n_src AS dn
  FROM pool l
  CROSS JOIN sizes s
  CROSS JOIN npool np
  LEFT JOIN per p ON p.bucket = l.bucket AND p.source = s.source
),
pgrid AS (SELECT * FROM grid WHERE c > 0),
{lnp},
{lnq},
psum AS (
  SELECT source,
         SUM(c * CAST(floor((CASE WHEN 2 * cm >= cm + dn THEN plp
             ELSE -plp END) * 1000000.0 + 0.5) AS BIGINT)) AS p_sum_u
  FROM jp_out GROUP BY 1
),
qsum AS (
  SELECT source,
         SUM(d * CAST(floor((CASE WHEN 2 * dn >= cm + dn THEN plq
             ELSE -plq END) * 1000000.0 + 0.5) AS BIGINT)) AS q_sum_u
  FROM jq_out GROUP BY 1
)
SELECT {final}
FROM psum JOIN qsum USING (source)
JOIN sizes USING (source) CROSS JOIN npool
ORDER BY source
"""


REGISTRY["js_divergence_sources"] = {
    "fn": js_divergence_sources,
    "sql": _js_sql(),
}


# --------------------------------------------------------------------------
# Population Stability Index of the $50 value-bucket distribution,
# reference window (first half of the log's calendar month, before
# 2024-01-16) vs current window — the standard "did the scored
# population shift" monitor run before every model refresh. Bucket
# masses are Laplace-smoothed IN INTEGERS (2c+1 per bucket over the
# union bucket set, totals 2N+k) so one-sided-empty buckets stay
# finite; each ln(p_i/q_i) is then the portable ln of an integer
# rational (max/min flip), micro-quantized, and the weighted sum
# Σ (p_num − q_num)·⌊ln·10⁶⌉ is carried 128-bit — the (p−q) and
# ln(p/q) signs always agree, so every term is non-negative. Scale:
# one groupBy to the (bucket × window) table.
# --------------------------------------------------------------------------

_PSI_SPLIT = "2024-01-16 00:00:00"


def _psi_final(div: str) -> list[str]:
    return [
        "n_ref",
        "n_cur",
        "k_buckets",
        f"{_w2d('psi_num', div)} / (CAST(a_tot AS DOUBLE)"
        " * CAST(b_tot AS DOUBLE) * 1000000.0) AS psi",
    ]


def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per = (
        load_events_finite(spark, sf_dir)
        .selectExpr(
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 5000 AS bucket",
            f"CAST(ts < TIMESTAMP '{_PSI_SPLIT}' AS BIGINT) AS is_ref",
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_ref").cast("bigint").alias("a"),
            F.sum(F.expr("1 - is_ref")).cast("bigint").alias("b"),
        )
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_buckets"),
        F.sum("a").cast("bigint").alias("n_ref"),
        F.sum("b").cast("bigint").alias("n_cur"),
    )
    sm = per.crossJoin(F.broadcast(tot)).selectExpr(
        "n_ref",
        "n_cur",
        "k_buckets",
        "2 * n_ref + k_buckets AS a_tot",
        "2 * n_cur + k_buckets AS b_tot",
        "CAST(2 * a + 1 AS DECIMAL(38,0)) * (2 * n_cur + k_buckets)"
        " AS p_num",
        "CAST(2 * b + 1 AS DECIMAL(38,0)) * (2 * n_ref + k_buckets)"
        " AS q_num",
    )
    lned = with_portable_ln(
        sm,
        "CASE WHEN p_num >= q_num THEN p_num ELSE q_num END",
        "CASE WHEN p_num >= q_num THEN q_num ELSE p_num END",
        "__pln",
    ).selectExpr(
        "n_ref",
        "n_cur",
        "k_buckets",
        "a_tot",
        "b_tot",
        "(p_num - q_num)"
        " * CAST(floor((CASE WHEN p_num >= q_num THEN __pln"
        " ELSE -__pln END) * 1000000.0 + 0.5) AS BIGINT) AS term",
    )
    agg = lned.groupBy(
        "n_ref", "n_cur", "k_buckets", "a_tot", "b_tot"
    ).agg(F.sum("term").alias("psi_num"))
    return agg.selectExpr(*_psi_final("DIV"))


def _psi_sql() -> str:
    final = ",\n       ".join(_psi_final("//"))
    ln_ctes = portable_ln_duck_ctes(
        "sm",
        "n_ref, n_cur, k_buckets, a_tot, b_tot, p_num, q_num",
        "CASE WHEN p_num >= q_num THEN p_num ELSE q_num END",
        "CASE WHEN p_num >= q_num THEN q_num ELSE p_num END",
        "pln",
        "ps",
    )
    return f"""
WITH per AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 5000
           AS bucket,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}'
                       THEN 0 ELSE 1 END) AS BIGINT) AS b
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_buckets,
         CAST(SUM(a) AS BIGINT) AS n_ref,
         CAST(SUM(b) AS BIGINT) AS n_cur
  FROM per
),
sm AS (
  SELECT n_ref, n_cur, k_buckets,
         2 * n_ref + k_buckets AS a_tot,
         2 * n_cur + k_buckets AS b_tot,
         CAST(2 * a + 1 AS HUGEINT) * (2 * n_cur + k_buckets) AS p_num,
         CAST(2 * b + 1 AS HUGEINT) * (2 * n_ref + k_buckets) AS q_num
  FROM per CROSS JOIN tot
),
{ln_ctes},
lned AS (
  SELECT n_ref, n_cur, k_buckets, a_tot, b_tot,
         (p_num - q_num)
           * CAST(floor((CASE WHEN p_num >= q_num THEN pln
             ELSE -pln END) * 1000000.0 + 0.5) AS BIGINT) AS term
  FROM ps_out
)
SELECT {final}
FROM (
  SELECT n_ref, n_cur, k_buckets, a_tot, b_tot, SUM(term) AS psi_num
  FROM lned GROUP BY 1, 2, 3, 4, 5
)
"""


REGISTRY["psi_value_drift"] = {
    "fn": psi_value_drift,
    "sql": _psi_sql(),
}


# --------------------------------------------------------------------------
# Murphy decomposition of the Brier score (reliability − resolution +
# uncertainty) for a bucket-calibrated purchase forecaster: forecasts
# are the plus-one-smoothed per-($50-bucket) purchase rates fit on the
# FIRST calendar half, evaluated on the SECOND — the standard "is the
# calibrated scorecard still calibrated" audit. Every squared-gap term
# is an exact integer rational quantized HALF-UP at micro precision
# through chained 128-bit divisions (wide_halfup_div_sql — the
# denominators n1s²·n₂ and n₂·N₂² exceed int64 independently), then
# integer-summed; the final normalizations are a fixed IEEE chain.
# Buckets absent from the evaluation half contribute nothing (n₂=0);
# buckets absent from training still get the smoothed prior 1/2.
# Scale: one groupBy to the (bucket × half) table.
# --------------------------------------------------------------------------


def _brier_final(div: str) -> list[str]:
    rel = (
        f"({_w2d('rel_u', div)} / NULLIF(CAST(n2_tot AS DOUBLE)"
        " * 1000000.0, 0.0))"
    )
    res = (
        f"({_w2d('res_u', div)} / NULLIF(CAST(n2_tot AS DOUBLE)"
        " * 1000000.0, 0.0))"
    )
    unc = (
        f"({_w2d('unc_num', div)} / NULLIF(CAST(n2_tot AS DOUBLE)"
        " * CAST(n2_tot AS DOUBLE), 0.0))"
    )
    return [
        "n1_tot",
        "n2_tot",
        f"{rel} AS reliability",
        f"{res} AS resolution",
        f"{unc} AS uncertainty",
        f"({rel} - {res}) + {unc} AS brier",
    ]


def _brier_stages(div: str) -> list[list[str]]:
    """The chained half-up divisions STAGED through named columns —
    each wide_halfup_div_sql references its numerator ~6×, so nesting
    three deep would blow the expression tree ~200× (measured: 16 s
    analysis+eval vs ~2 s staged). Same stage shape on both engines.

    REL term: n2·(p̂ − ō_k)² with p̂ = g1s/n1s, ō_k = g2/n2
      = (g1s·n2 − g2·n1s)² / (n1s²·n2), micro-scaled.
    RES term: n2·(ō_k − ō)² = (g2·N2 − G2·n2)² / (n2·N2²).
    """
    big = _big(div)
    # keep is a LIST of bare column names (not one comma-joined string)
    # so selectExpr items never need string splitting downstream —
    # computed expressions may legitimately contain commas (NULLIF).
    keep = ["n1_tot", "n2_tot", "g2_tot", "n2g"]
    s0 = [
        "n1_tot",
        "n2_tot",
        "g2_tot",
        "n1s",
        "n2",
        "CASE WHEN n2 = 0 THEN 1 ELSE n2 END AS n2g",
        f"CAST(g1s AS {big}) * n2 - CAST(g2 AS {big}) * n1s AS rel_d",
        f"CAST(g2 AS {big}) * n2_tot - CAST(g2_tot AS {big}) * n2"
        " AS res_d",
    ]
    s1 = [
        *keep,
        "n1s",
        "n2",
        "rel_d * rel_d * 1000000 AS rel_p",
        "res_d * res_d * 1000000 AS res_p",
    ]
    s2 = [
        *keep,
        "n1s",
        "n2",
        f"{_whd('rel_p', 'n1s', div)} AS rel_1",
        f"{_whd('res_p', 'n2g', div)} AS res_1",
    ]
    s3 = [
        *keep,
        "n2",
        f"{_whd('rel_1', 'n1s', div)} AS rel_2",
        f"{_whd('res_1', 'n2_tot', div)} AS res_2",
    ]
    s4 = [
        *keep,
        "n2",
        f"{_whd('rel_2', 'n2g', div)} AS rel_3",
        f"{_whd('res_2', 'n2_tot', div)} AS res_3",
    ]
    s5 = [
        "n1_tot",
        "n2_tot",
        "g2_tot",
        f"CASE WHEN n2 = 0 THEN CAST(0 AS {big}) ELSE rel_3 END"
        " AS rel_t",
        f"CASE WHEN n2 = 0 THEN CAST(0 AS {big}) ELSE res_3 END"
        " AS res_t",
    ]
    return [s0, s1, s2, s3, s4, s5]


def brier_decomposition_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per = (
        load_events_finite(spark, sf_dir).filter(
            F.col("event_type").isNotNull()
        )
        .selectExpr(
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 5000 AS bucket",
            f"CAST(ts < TIMESTAMP '{_PSI_SPLIT}' AS BIGINT) AS is_ref",
            "CAST(event_type = 'purchase' AS BIGINT) AS is_pos",
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_ref").cast("bigint").alias("n1"),
            F.sum(F.expr("is_ref * is_pos")).cast("bigint").alias("g1"),
            F.sum(F.expr("1 - is_ref")).cast("bigint").alias("n2"),
            F.sum(F.expr("(1 - is_ref) * is_pos"))
            .cast("bigint")
            .alias("g2"),
        )
    )
    tot = per.agg(
        F.sum("n1").cast("bigint").alias("n1_tot"),
        F.sum("n2").cast("bigint").alias("n2_tot"),
        F.sum("g2").cast("bigint").alias("g2_tot"),
    )
    sm = per.crossJoin(F.broadcast(tot)).selectExpr(
        "n1_tot",
        "n2_tot",
        "g2_tot",
        "n2",
        "g2",
        "2 * g1 + 1 AS g1s",
        "2 * n1 + 2 AS n1s",
    )
    terms = sm
    for stage in _brier_stages("DIV"):
        terms = terms.selectExpr(*stage)
    agg = terms.groupBy("n1_tot", "n2_tot", "g2_tot").agg(
        F.sum("rel_t").alias("rel_u"),
        F.sum("res_t").alias("res_u"),
    )
    staged = agg.selectExpr(
        "n1_tot",
        "n2_tot",
        "rel_u",
        "res_u",
        "CAST(g2_tot AS DECIMAL(38,0)) * (n2_tot - g2_tot) AS unc_num",
    )
    return staged.selectExpr(*_brier_final("DIV"))


def _brier_sql() -> str:
    stages = _brier_stages("//")
    ctes = ",\n".join(
        f"t{i} AS (\n  SELECT {', '.join(stage)}\n"
        f"  FROM {'sm' if i == 0 else f't{i - 1}'}\n)"
        for i, stage in enumerate(stages)
    )
    final = ",\n       ".join(_brier_final("//"))
    return f"""
WITH per AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 5000
           AS bucket,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}'
                        AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS g1,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_PSI_SPLIT}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_PSI_SPLIT}'
                        AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS g2
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n1) AS BIGINT) AS n1_tot,
         CAST(SUM(n2) AS BIGINT) AS n2_tot,
         CAST(SUM(g2) AS BIGINT) AS g2_tot
  FROM per
),
sm AS (
  SELECT n1_tot, n2_tot, g2_tot, n2, g2,
         2 * g1 + 1 AS g1s,
         2 * n1 + 2 AS n1s
  FROM per CROSS JOIN tot
),
{ctes},
agg AS (
  SELECT n1_tot, n2_tot, g2_tot,
         SUM(rel_t) AS rel_u, SUM(res_t) AS res_u
  FROM t{len(stages) - 1} GROUP BY 1, 2, 3
),
staged AS (
  SELECT n1_tot, n2_tot, rel_u, res_u,
         CAST(g2_tot AS HUGEINT) * (n2_tot - g2_tot) AS unc_num
  FROM agg
)
SELECT {final}
FROM staged
"""


REGISTRY["brier_decomposition_events"] = {
    "fn": brier_decomposition_events,
    "sql": _brier_sql(),
}


# --------------------------------------------------------------------------
# NDCG@20 of the popularity recommender — completing the ranking-eval
# trio (hit-rate, MAP@K in mldataq4) with the graded-relevance
# standard. Same train/test date split and top-K popularity ranking
# as map_at_k_orders; the per-position discount 1/log₂(pos+1) and its
# ideal prefix sums are PYTHON-PRECOMPUTED micro-integer literals
# (positions are bounded by K, so no runtime logarithm exists in
# either engine — exactness by construction). Per-customer
# nDCG = DCG_u / IDCG_u is one half-up integer division; the mean is
# exact-integer over customers. Scale: identical to map_at_k (one
# broadcast top-K table, per-customer aggregates).
# --------------------------------------------------------------------------

import math as _math

NDCG_K = 20
_NDCG_GAIN_U = [
    _math.floor(1_000_000 / _math.log2(p + 1) + 0.5)
    for p in range(1, NDCG_K + 1)
]
_NDCG_IDEAL_U = [
    sum(_NDCG_GAIN_U[: i + 1]) for i in range(NDCG_K)
]


def _gain_case(col: str) -> str:
    arms = " ".join(
        f"WHEN {p + 1} THEN {g}" for p, g in enumerate(_NDCG_GAIN_U)
    )
    return f"(CASE {col} {arms} END)"


def _ideal_case(col: str) -> str:
    arms = " ".join(
        f"WHEN {i + 1} THEN {s}" for i, s in enumerate(_NDCG_IDEAL_U)
    )
    return f"(CASE {col} {arms} END)"


def ndcg_at_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql,
    )
    from de4ml_spark.queries.mldataq4 import (
        POP_SPLIT_DEN,
        POP_SPLIT_NUM,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    split = orders.agg(
        F.expr(
            f"CAST(date_add(MIN(od), CAST(datediff(MAX(od), MIN(od))"
            f" * {POP_SPLIT_NUM} DIV {POP_SPLIT_DEN} AS INT)) AS DATE)"
        ).alias("split_day")
    )
    o = orders.crossJoin(F.broadcast(split))
    train_orders = o.filter("od <= split_day")
    test_orders = o.filter("od > split_day")
    topk = (
        train_orders.join(li, train_orders.o_orderkey == li.l_orderkey)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col("l_partkey"))
        .limit(NDCG_K)
        .selectExpr(
            "l_partkey",
            "ROW_NUMBER() OVER (ORDER BY cnt DESC, l_partkey) AS pos",
        )
    )
    holdout = (
        test_orders.join(li, test_orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    n_hold = holdout.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_holdout")
    )
    dcg = (
        holdout.join(F.broadcast(topk), "l_partkey")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.expr(_gain_case("pos"))).alias("dcg_u")
        )
    )
    per_cust = (
        dcg.join(n_hold, "o_custkey", "right")
        .na.fill({"dcg_u": 0})
        .selectExpr(
            "o_custkey",
            "dcg_u",
            f"{_ideal_case(f'LEAST(n_holdout, {NDCG_K})')} AS idcg_u",
        )
        .selectExpr(
            "o_custkey",
            "CAST((2 * dcg_u * 1000000 + idcg_u) DIV (2 * idcg_u)"
            " AS BIGINT) AS ndcg_u",
        )
    )
    tot = per_cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("ndcg_u").cast("bigint").alias("sum_ndcg_u"),
    )
    return tot.selectExpr(
        "n_customers",
        "sum_ndcg_u",
        f"""({exact_round_div_sql('sum_ndcg_u',
                                  'n_customers * 1000000', 'DIV')})
            AS ndcg_r""",
    )


def _ndcg_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql,
    )
    from de4ml_spark.queries.mldataq4 import (
        POP_SPLIT_DEN,
        POP_SPLIT_NUM,
    )

    return f"""
WITH o AS (
  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od
  FROM orders
),
split AS (
  SELECT MIN(od) + TO_DAYS(CAST(datediff('day', MIN(od), MAX(od))
         * {POP_SPLIT_NUM} // {POP_SPLIT_DEN} AS INT)) AS split_day
  FROM o
),
train_orders AS (
  SELECT o.* FROM o CROSS JOIN split WHERE od <= split_day
),
test_orders AS (
  SELECT o.* FROM o CROSS JOIN split WHERE od > split_day
),
topk AS (
  SELECT l_partkey,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, l_partkey) AS pos
  FROM (
    SELECT l_partkey, COUNT(*) AS cnt
    FROM train_orders t JOIN lineitem l ON t.o_orderkey = l.l_orderkey
    GROUP BY 1
  )
  ORDER BY cnt DESC, l_partkey
  LIMIT {NDCG_K}
),
holdout AS (
  SELECT DISTINCT t.o_custkey, l.l_partkey
  FROM test_orders t JOIN lineitem l ON t.o_orderkey = l.l_orderkey
),
n_hold AS (
  SELECT o_custkey, COUNT(*) AS n_holdout FROM holdout GROUP BY 1
),
dcg AS (
  SELECT h.o_custkey, SUM({_gain_case("tk.pos")}) AS dcg_u
  FROM holdout h JOIN topk tk USING (l_partkey)
  GROUP BY 1
),
per_cust AS (
  SELECT n.o_custkey,
         CAST((2 * COALESCE(d.dcg_u, 0) * 1000000
               + {_ideal_case(f"LEAST(n.n_holdout, {NDCG_K})")})
              // (2 * {_ideal_case(f"LEAST(n.n_holdout, {NDCG_K})")})
              AS BIGINT) AS ndcg_u
  FROM n_hold n LEFT JOIN dcg d USING (o_custkey)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(ndcg_u) AS BIGINT) AS sum_ndcg_u,
       ({exact_round_div_sql('CAST(SUM(ndcg_u) AS BIGINT)',
                             'COUNT(*) * 1000000', '//')}) AS ndcg_r
FROM per_cust
"""


REGISTRY["ndcg_at_k_orders"] = {
    "fn": ndcg_at_k_orders,
    "sql": _ndcg_sql(),
}
