"""ML-data queries, round 4 late tier: corpus novelty scoring, winsorized
robust statistics, and class-balance reporting. All fully oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de4ml_spark.operators.portable_hash import (
    exact_round_div_sql,
    exact_round_div_sql_wide,
)
from de4ml_spark.operators.text import tokens
from de4ml_spark.session import load_table

# --------------------------------------------------------------------------
# Corpus novelty: per doc, the fraction of its trigram occurrences whose
# trigram appears NOWHERE else in the corpus — high novelty = unique
# content, low novelty = boilerplate/memorized text. The complement of the
# repetition/dup screens: those look within/between docs, this against the
# whole corpus gram distribution.
# --------------------------------------------------------------------------

NOVELTY_N = 3


def novelty_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id, n_grams, n_novel (corpus-frequency-1 occurrences),
    novelty_r (exact integer rounding).

    Scale: wordcount over grams (map-side combine) + a broadcast-able
    join of per-doc gram counts against the corpus-unique gram set; one
    corpus scan feeds both sides and Spark reuses the exploded relation's
    shuffle across the two aggregations."""
    from de4ml_spark.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = tokens("text")
    from de4ml_spark.operators.text import zip_grams

    grams = docs.select(
        "doc_id",
        F.explode(zip_grams(toks, NOVELTY_N)).alias("g"),
    )
    per_doc = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    corpus = per_doc.groupBy("g").agg(F.sum("c").alias("cf"))
    joined = per_doc.join(corpus.filter(F.col("cf") == 1).select("g"), "g", "left_semi")
    novel = joined.groupBy("doc_id").agg(F.sum("c").alias("n_novel"))
    totals = per_doc.groupBy("doc_id").agg(F.sum("c").alias("n_grams"))
    return (
        totals.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.expr(
                exact_round_div_sql("COALESCE(n_novel, 0)", "n_grams", "DIV")
            ).alias("novelty_r"),
        )
    )


NOVELTY_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - {NOVELTY_N - 1}),
                i -> array_to_string(toks[i:i+{NOVELTY_N - 1}], ' '))) AS g
  FROM t WHERE len(toks) >= {NOVELTY_N}
),
per_doc AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2),
corpus AS (SELECT g, SUM(c) AS cf FROM per_doc GROUP BY 1),
novel AS (
  SELECT p.doc_id, CAST(SUM(p.c) AS BIGINT) AS n_novel
  FROM per_doc p JOIN corpus u ON p.g = u.g AND u.cf = 1
  GROUP BY 1
),
totals AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams
           FROM per_doc GROUP BY 1)
SELECT t2.doc_id, t2.n_grams,
       COALESCE(n.n_novel, 0) AS n_novel,
       {exact_round_div_sql('COALESCE(n.n_novel, 0)', 't2.n_grams', '//')}
         AS novelty_r
FROM totals t2 LEFT JOIN novel n ON t2.doc_id = n.doc_id
"""


# --------------------------------------------------------------------------
# Winsorized statistics: clip l_extendedprice at the exact p01/p99 fences
# and report the clipped counts and the winsorized (decimal-exact) mean —
# the robust-mean screen for long-tailed measures.
# --------------------------------------------------------------------------


def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row report: p01/p99 fences (histogram-exact), rows clipped
    low/high, raw vs winsorized decimal-exact means.

    Scale: quantiles via the histogram operator (no raw-row buffering);
    the clip+mean is one more scan with the 1-row fence table broadcast."""
    from de4ml_spark.profile.battery import grouped_exact_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    fences = grouped_exact_quantiles(
        li.withColumn("__g", F.lit(1)), ["__g"], "l_extendedprice", [0.01, 0.99]
    ).select(F.col("q1").alias("lo"), F.col("q99").alias("hi"))
    v = F.col("l_extendedprice")
    clipped = F.when(v < F.col("lo"), F.col("lo")).when(
        v > F.col("hi"), F.col("hi")
    ).otherwise(v)
    j = li.select("l_extendedprice").crossJoin(F.broadcast(fences))
    return j.agg(
        F.round(F.first("lo"), 6).alias("p01_r"),
        F.round(F.first("hi"), 6).alias("p99_r"),
        F.count(F.when(v < F.col("lo"), 1)).alias("n_clipped_low"),
        F.count(F.when(v > F.col("hi"), 1)).alias("n_clipped_high"),
        (F.sum(v.cast("decimal(30,6)")).cast("double") / F.count(v)).alias(
            "mean_raw"
        ),
        (
            F.sum(clipped.cast("decimal(30,6)")).cast("double")
            / F.count(clipped)
        ).alias("mean_winsorized"),
    )


WINSORIZE_SQL = """
WITH fences AS (
  SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
         quantile_cont(l_extendedprice, 0.99) AS hi
  FROM lineitem
)
SELECT ROUND(MIN(lo), 6) AS p01_r,
       ROUND(MIN(hi), 6) AS p99_r,
       COUNT(*) FILTER (WHERE l_extendedprice < lo) AS n_clipped_low,
       COUNT(*) FILTER (WHERE l_extendedprice > hi) AS n_clipped_high,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(l_extendedprice) AS mean_raw,
       CAST(SUM(CAST(CASE WHEN l_extendedprice < lo THEN lo
                          WHEN l_extendedprice > hi THEN hi
                          ELSE l_extendedprice END AS DECIMAL(30,6))) AS DOUBLE)
         / COUNT(l_extendedprice) AS mean_winsorized
FROM lineitem CROSS JOIN fences
"""


# --------------------------------------------------------------------------
# Class balance: per-label counts and shares over embeddings.label with
# the imbalance ratio vs the majority class — the standard skew screen
# before training/eval splits.
# --------------------------------------------------------------------------


def label_balance_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    total = "CAST(SUM(n) OVER () AS BIGINT)"
    majority = "CAST(MAX(n) OVER () AS BIGINT)"
    return counts.select(
        "label",
        "n",
        F.expr(exact_round_div_sql("n", total, "DIV")).alias("share_r"),
        F.expr(exact_round_div_sql("n", majority, "DIV")).alias(
            "vs_majority_r"
        ),
    )


LABEL_BALANCE_SQL = f"""
WITH counts AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1)
SELECT label, n,
       {exact_round_div_sql('n', 'CAST(SUM(n) OVER () AS BIGINT)', '//')}
         AS share_r,
       {exact_round_div_sql('n', 'CAST(MAX(n) OVER () AS BIGINT)', '//')}
         AS vs_majority_r
FROM counts
"""


# --------------------------------------------------------------------------
# MAD (median absolute deviation): the robust scale estimate — median of
# |x - median(x)| — two nested exact medians, both histogram-based (the
# outlier-resistant sibling of std; 1.4826*MAD ~ sigma for normal data).
# --------------------------------------------------------------------------


def mad_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single row: exact median and MAD of l_extendedprice.

    Scale (r17, guide §2.3 — aggregate before you shuffle): ONE raw scan.
    The value histogram (distinct price → count) persists once and serves
    both halves — the median reads it through the cumulative window, and
    the DEVIATION histogram derives from it by re-keying each distinct
    price to |price − median| and summing counts (the multiset of
    deviations is identical row-for-row to scanning lineitem again, since
    every row with the same price has the same deviation). Arithmetic is
    unchanged — same histogram pairs, same interpolation — the old second
    raw scan + crossJoin of |lineitem| rows is just gone."""
    from de4ml_spark.cache import release_after
    from de4ml_spark.profile.battery import (
        grouped_exact_quantiles_from_hist,
    )

    li = load_table(spark, sf_dir, "lineitem")
    v = F.col("l_extendedprice")
    hist = (
        li.filter(v.isNotNull())
        .groupBy(F.lit(1).alias("__g"), v.alias("__v"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .persist()
    )
    med = grouped_exact_quantiles_from_hist(hist, ["__g"], [0.5]).select(
        F.col("q50").alias("med")
    )
    devhist = (
        hist.crossJoin(F.broadcast(med))
        .groupBy(
            F.lit(1).alias("__g"),
            F.abs(F.col("__v") - F.col("med")).alias("__v"),
        )
        .agg(F.sum("__cnt").alias("__cnt"))
    )
    mad = grouped_exact_quantiles_from_hist(devhist, ["__g"], [0.5]).select(
        F.col("q50").alias("mad"), F.col("n").alias("n")
    )
    out = (
        med.crossJoin(mad)
        .select(
            F.round("med", 6).alias("median_r"),
            F.round("mad", 6).alias("mad_r"),
            "n",
        )
    )
    return release_after(out, hist)


MAD_SQL = """
WITH m AS (SELECT quantile_cont(l_extendedprice, 0.5) AS med FROM lineitem)
SELECT ROUND(MIN(med), 6) AS median_r,
       ROUND(quantile_cont(ABS(l_extendedprice - med), 0.5), 6) AS mad_r,
       COUNT(l_extendedprice) AS n
FROM lineitem CROSS JOIN m
HAVING COUNT(l_extendedprice) > 0
"""
# HAVING: empty-input parity — the Spark histogram-quantile path
# (grouped_exact_quantiles) yields zero groups on an empty shard, so
# the oracle's global aggregate must not emit its NULL-stat row there;
# a no-op on any non-empty input.


# --------------------------------------------------------------------------
# Distributional drift via total variation distance: TVD between the
# per-event-type distribution of the first and second half of the event
# window — 0.5 * Σ|p_i - q_i| computed as EXACT integer rationals
# (|n1_i*N2 - n2_i*N1| / (2*N1*N2)), so it is engine-identical with no
# log/float hazards (the PSI/KL alternatives need logs, which are not
# bit-portable). Complements profile_drift (mean/std) with a full-shape
# test.
# --------------------------------------------------------------------------

DRIFT_CUTOFF = "2024-01-16 00:00:00"


def categorical_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: event counts per window and the exact TVD between the two
    event_type distributions.

    Scale: one scan with conditional counts per category (map-side
    combine on the tiny type key), then integer arithmetic on the 5-row
    result — the drift monitor shape for any categorical column."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(DRIFT_CUTOFF).cast("timestamp_ntz")
    per = ev.groupBy("event_type").agg(
        F.count(F.when(F.col("ts") < cutoff, 1)).alias("n1"),
        F.count(F.when(F.col("ts") >= cutoff, 1)).alias("n2"),
    )
    tot = per.agg(
        F.sum("n1").alias("t1"),
        F.sum("n2").alias("t2"),
        F.count(F.lit(1)).alias("n_categories"),
    )
    j = per.crossJoin(F.broadcast(tot))
    # count cross-products and their sum are DECIMAL(38,0) (HUGEINT on the
    # oracle side): n1*t2 alone exceeds int64 near ~3e9 rows/window, and
    # the 2e6-scaled rounding numerator near ~1.5e6 — the wide rounding
    # helper keeps the whole TVD rational exact to ~1e16-row windows
    wide = "decimal(38,0)"
    num = F.abs(
        F.col("n1").cast(wide) * F.col("t2")
        - F.col("n2").cast(wide) * F.col("t1")
    )
    agg = j.agg(
        F.first("t1").alias("rows_before"),
        F.first("t2").alias("rows_after"),
        F.first("n_categories").alias("n_categories"),
        F.sum(num).alias("__num"),
        F.first(F.col("t1").cast(wide) * F.col("t2")).alias("__den"),
    )
    return agg.select(
        "rows_before",
        "rows_after",
        "n_categories",
        F.expr(exact_round_div_sql_wide("__num", "2 * __den", "DIV")).alias(
            "tvd_r"
        ),
    )


DRIFT_TVD_SQL = f"""
WITH per AS (
  SELECT event_type,
         COUNT(*) FILTER (WHERE ts < TIMESTAMP '{DRIFT_CUTOFF}') AS n1,
         COUNT(*) FILTER (WHERE ts >= TIMESTAMP '{DRIFT_CUTOFF}') AS n2
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n1) AS BIGINT) AS t1, CAST(SUM(n2) AS BIGINT) AS t2,
         COUNT(*) AS n_categories
  FROM per
)
SELECT MIN(t1) AS rows_before,
       MIN(t2) AS rows_after,
       MIN(n_categories) AS n_categories,
       {exact_round_div_sql_wide(
           'SUM(ABS(CAST(n1 AS HUGEINT) * t2 - CAST(n2 AS HUGEINT) * t1))',
           '2 * CAST(MIN(t1) AS HUGEINT) * MIN(t2)', '//')} AS tvd_r
FROM per CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# Embedding-norm outlier screen: vectors whose L2 norm falls outside the
# Tukey fences — the degenerate-embedding check (zero / exploding vectors
# from failed encoders) every vector pipeline runs before indexing.
# Norms are the SAME left-to-right double dot products the knn oracles
# already bit-match, so the quantile fences are engine-identical.
# --------------------------------------------------------------------------


def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: exact q1/q3 of the vector L2 norms, Tukey-fence outlier
    count, min/max norm."""
    from de4ml_spark.operators.similarity import norm_sql
    from de4ml_spark.profile.battery import grouped_exact_quantiles

    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select(
        F.transform("embedding", lambda x: x.cast("double")).alias("e")
    ).select(F.expr(norm_sql("e", 64)).alias("nrm"))
    q = grouped_exact_quantiles(
        norms.withColumn("__g", F.lit(1)), ["__g"], "nrm", [0.25, 0.75]
    ).select(
        F.col("q25").alias("lo_q"),
        F.col("q75").alias("hi_q"),
        (F.col("q25") - 1.5 * (F.col("q75") - F.col("q25"))).alias("__lo"),
        (F.col("q75") + 1.5 * (F.col("q75") - F.col("q25"))).alias("__hi"),
    )
    j = norms.crossJoin(F.broadcast(q))
    return j.agg(
        F.round(F.first("lo_q"), 6).alias("q1_r"),
        F.round(F.first("hi_q"), 6).alias("q3_r"),
        F.round(F.min("nrm"), 6).alias("min_norm_r"),
        F.round(F.max("nrm"), 6).alias("max_norm_r"),
        F.count(
            F.when((F.col("nrm") < F.col("__lo")) | (F.col("nrm") > F.col("__hi")), 1)
        ).alias("n_outliers"),
        F.count(F.lit(1)).alias("n_vectors"),
    )


def _norm_outliers_sql() -> str:
    return """
WITH v AS (SELECT embedding::DOUBLE[] AS e FROM embeddings),
n AS (SELECT sqrt(list_dot_product(e, e)) AS nrm FROM v),
f AS (
  SELECT quantile_cont(nrm, 0.25) AS lo_q, quantile_cont(nrm, 0.75) AS hi_q,
         quantile_cont(nrm, 0.25)
           - 1.5 * (quantile_cont(nrm, 0.75) - quantile_cont(nrm, 0.25)) AS lo,
         quantile_cont(nrm, 0.75)
           + 1.5 * (quantile_cont(nrm, 0.75) - quantile_cont(nrm, 0.25)) AS hi
  FROM n
)
SELECT ROUND(MIN(lo_q), 6) AS q1_r,
       ROUND(MIN(hi_q), 6) AS q3_r,
       ROUND(MIN(nrm), 6) AS min_norm_r,
       ROUND(MAX(nrm), 6) AS max_norm_r,
       COUNT(*) FILTER (WHERE nrm < lo OR nrm > hi) AS n_outliers,
       COUNT(*) AS n_vectors
FROM n CROSS JOIN f
"""


# --------------------------------------------------------------------------
# Heartbeat / silent-gap diagnostic: per user, the LARGEST gap between
# consecutive events — top-20 by gap (the instrumentation-outage and
# churn-risk readout).
# --------------------------------------------------------------------------


def max_event_gap_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by largest silent gap (seconds), deterministic
    (gap desc, user asc) order with rank.

    Scale: one per-user window sort (lag) + max aggregate +
    TakeOrdered top-K — never a global sort."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    agg = gaps.groupBy("user_id").agg(F.max("gap_s").alias("max_gap_s"))
    w2 = Window.orderBy(F.desc("max_gap_s"), F.asc("user_id"))
    return (
        agg.orderBy(F.desc("max_gap_s"), F.asc("user_id"))
        .limit(20)
        .select("user_id", "max_gap_s", F.row_number().over(w2).alias("rank"))
    )


MAX_GAP_SQL = """
WITH gaps AS (
  SELECT user_id,
         date_diff('second',
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_s
  FROM events
),
agg AS (
  SELECT user_id, MAX(gap_s) AS max_gap_s
  FROM gaps WHERE gap_s IS NOT NULL GROUP BY user_id
)
SELECT user_id, max_gap_s,
       ROW_NUMBER() OVER (ORDER BY max_gap_s DESC, user_id ASC) AS rank
FROM agg
ORDER BY max_gap_s DESC, user_id LIMIT 20
"""


REGISTRY: dict[str, dict] = {
    "novelty_docs": {"fn": novelty_docs, "sql": NOVELTY_SQL},
    "mad_price": {"fn": mad_price, "sql": MAD_SQL},
    "embedding_norm_outliers": {
        "fn": embedding_norm_outliers,
        "sql": _norm_outliers_sql(),
    },
    "max_event_gap_users": {"fn": max_event_gap_users, "sql": MAX_GAP_SQL},
    "categorical_drift_tvd": {
        "fn": categorical_drift_tvd,
        "sql": DRIFT_TVD_SQL,
    },
    "winsorized_price_stats": {
        "fn": winsorized_price_stats,
        "sql": WINSORIZE_SQL,
    },
    "label_balance_embeddings": {
        "fn": label_balance_embeddings,
        "sql": LABEL_BALANCE_SQL,
    },
}
