"""ML-data curation tier 3: hard quality-rule batteries, corpus mixing
plans, cross-split contamination audits, and wide-to-long reshaping.

- ``gopher_rules_docs``: Gopher-style HARD filter rules (Rae et al. 2021,
  §A1.1) as per-document boolean flags + the conjunctive keep decision —
  the hard-gate complement of ``quality_docs``'s soft score. Every rule
  is an exact integer comparison (no float ratios), so the flags are
  engine-identical by construction.
- ``epoch_mix_plan``: per-source epoch/repeat factors to hit a token
  budget at uniform source weighting — the "how many epochs of each
  source" table an LLM pre-training mixture needs. Exact rational
  arithmetic on token counts.
- ``split_leakage_embeddings``: near-duplicate pairs (cosine >= 0.45)
  that STRADDLE the deterministic train/test split — the cross-split
  contamination audit (a test vector with a near-dup in train leaks
  evaluation signal). Composes the md5 group split with the exact
  cosine pair scorer.
- ``unpivot_part_metrics``: wide-to-long UNPIVOT (Spark ``stack``) of the
  part measure columns, then per (brand, metric) stats with DECIMAL
  sums — the reshape every profiling/BI export needs.

Scale notes per entry in the section comments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de4ml_spark.operators.portable_hash import (
    exact_round_div_sql,
    exact_round_div_sql_wide,
)
from de4ml_spark.operators.sampling import key_hex_sql
from de4ml_spark.session import load_table

REGISTRY: dict[str, dict] = {}


# --------------------------------------------------------------------------
# Gopher rule battery. Rules (integer-exact forms):
#   r_len:      40 <= n_tok <= 100000
#   r_wordlen:  3 <= mean word length <= 10   ->  3*n_tok <= n_nospace
#                                             AND n_nospace <= 10*n_tok
#   r_symbol:   (# of '#' and ellipsis) / n_tok <= 0.1
#                                             ->  10*n_sym <= n_tok
#   r_bullet:   fraction of lines starting with a bullet <= 0.9
#                                             ->  10*n_bullet <= 9*n_lines
#   r_stop:     at least 2 DISTINCT common stopwords present
#   r_alpha:    >= 80% of tokens contain an alphabetic char
#                                             ->  5*n_alpha_tok >= 4*n_tok
# Scale: map-only (zero shuffles); one regexp pass per rule input, shared
# token array across rules.
# --------------------------------------------------------------------------

_GOPHER_STOPS = ["the", "a", "of", "and"]


def gopher_rules_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("bigint")
    n_nospace = F.length(F.regexp_replace(F.col("text"), r"\s", "")).cast(
        "bigint"
    )
    n_sym = (
        F.length(F.col("text"))
        - F.length(F.regexp_replace(F.col("text"), r"[#…]", ""))
    ).cast("bigint")
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines).cast("bigint")
    n_bullet = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"^\s*[-*•]"))
    ).cast("bigint")
    n_stop_distinct = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in _GOPHER_STOPS]),
        )
    ).cast("bigint")
    n_alpha_tok = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    ).cast("bigint")
    flagged = docs.select(
        "doc_id",
        ((n_tok >= 40) & (n_tok <= 100000)).alias("r_len"),
        ((3 * n_tok <= n_nospace) & (n_nospace <= 10 * n_tok)).alias(
            "r_wordlen"
        ),
        (10 * n_sym <= n_tok).alias("r_symbol"),
        (10 * n_bullet <= 9 * n_lines).alias("r_bullet"),
        (n_stop_distinct >= 2).alias("r_stop"),
        (5 * n_alpha_tok >= 4 * n_tok).alias("r_alpha"),
    )
    return flagged.withColumn(
        "keep",
        F.col("r_len")
        & F.col("r_wordlen")
        & F.col("r_symbol")
        & F.col("r_bullet")
        & F.col("r_stop")
        & F.col("r_alpha"),
    )


GOPHER_RULES_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT)
           AS n_nospace,
         CAST(length(text) - length(regexp_replace(text, '[#' || chr(8230)
              || ']', '', 'g')) AS BIGINT) AS n_sym,
         CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
         CAST(len(list_filter(string_split(text, chr(10)),
              ln -> regexp_matches(ln, '^\s*[-*' || chr(8226) || ']')))
              AS BIGINT) AS n_bullet,
         CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
              ['the','a','of','and'])) AS BIGINT) AS n_stop_distinct,
         CAST(len(list_filter(string_split(text, ' '),
              x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha_tok
  FROM documents
)
SELECT doc_id,
       (n_tok >= 40 AND n_tok <= 100000) AS r_len,
       (3 * n_tok <= n_nospace AND n_nospace <= 10 * n_tok) AS r_wordlen,
       (10 * n_sym <= n_tok) AS r_symbol,
       (10 * n_bullet <= 9 * n_lines) AS r_bullet,
       (n_stop_distinct >= 2) AS r_stop,
       (5 * n_alpha_tok >= 4 * n_tok) AS r_alpha,
       ((n_tok >= 40 AND n_tok <= 100000)
        AND (3 * n_tok <= n_nospace AND n_nospace <= 10 * n_tok)
        AND (10 * n_sym <= n_tok)
        AND (10 * n_bullet <= 9 * n_lines)
        AND (n_stop_distinct >= 2)
        AND (5 * n_alpha_tok >= 4 * n_tok)) AS keep
FROM t
"""

REGISTRY["gopher_rules_docs"] = {
    "fn": gopher_rules_docs,
    "sql": GOPHER_RULES_SQL,
}


# --------------------------------------------------------------------------
# Epoch mixing plan: token budget = EPOCH_BUDGET x the corpus total,
# split uniformly across sources; per source report the repeat factor
# (epochs) needed to fill its share. All-exact rationals: target share
# = budget_total / n_sources, epochs = target / actual tokens.
# Scale: one map-side-combined groupBy to per-source totals, then a
# broadcast scalar join with the corpus totals (bounded frames only).
# --------------------------------------------------------------------------

EPOCH_BUDGET = 3  # train for ~3 corpus passes, rebalanced uniformly


def epoch_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast("bigint")).alias(
            "n_tokens"
        ),
    )
    totals = per_src.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    joined = per_src.crossJoin(F.broadcast(totals))
    return joined.select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr(
            exact_round_div_sql(
                f"{EPOCH_BUDGET} * total_tokens", "n_sources", "DIV", 0
            )
        )
        .cast("bigint")
        .alias("target_tokens"),
        F.expr(
            exact_round_div_sql(
                f"{EPOCH_BUDGET} * total_tokens",
                "n_sources * n_tokens",
                "DIV",
            )
        ).alias("epochs_r"),
    )


EPOCH_MIX_SQL = f"""
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         COUNT(*) AS n_sources FROM per_src
)
SELECT source, n_docs, n_tokens,
       CAST({exact_round_div_sql(
           f"{EPOCH_BUDGET} * total_tokens", "n_sources", "//", 0)}
         AS BIGINT) AS target_tokens,
       {exact_round_div_sql(
           f"{EPOCH_BUDGET} * total_tokens",
           "n_sources * n_tokens", "//")} AS epochs_r
FROM per_src, tot
"""

REGISTRY["epoch_mix_plan"] = {"fn": epoch_mix_plan, "sql": EPOCH_MIX_SQL}


# --------------------------------------------------------------------------
# Cross-split near-dup contamination: near-dup pairs straddling the
# deterministic 25% test split. Test-scale path reuses the exact O(n^2)
# cosine pair join (same posture as dedup_embedding_cosine); at 100 TB the
# candidate set comes from LSH bucketing with the same rescoring — the
# split-membership semi-join is unchanged. Split assignment is a pure
# md5 function of vec_id, so the oracle reproduces the exact row set.
# --------------------------------------------------------------------------

_SPLIT_THR = "40000000"  # 25% test


def split_leakage_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.dedup import embedding_neardup_pairs_fast

    emb = load_table(spark, sf_dir, "embeddings")
    split = F.when(
        F.substring(
            F.md5(F.concat(F.col("vec_id").cast("string"), F.lit("split"))),
            1,
            8,
        )
        < _SPLIT_THR,
        F.lit("test"),
    ).otherwise(F.lit("train"))
    splits = emb.select("vec_id", split.alias("split"))
    # r17: same exact-values fast path as dedup_embedding_cosine
    # (blocked-BLAS candidates + unrolled-dot rescore; 23.5 s -> ~1 s)
    pairs = embedding_neardup_pairs_fast(emb, threshold=0.45)
    return (
        pairs.join(
            splits.withColumnRenamed("vec_id", "id_a").withColumnRenamed(
                "split", "split_a"
            ),
            "id_a",
        )
        .join(
            splits.withColumnRenamed("vec_id", "id_b").withColumnRenamed(
                "split", "split_b"
            ),
            "id_b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "cos_sim")
    )


SPLIT_LEAKAGE_SQL = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         CASE WHEN {key_hex_sql("vec_id", "split")} < '{_SPLIT_THR}'
              THEN 'test' ELSE 'train' END AS split
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       a.split AS split_a, b.split AS split_b,
       ROUND(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e))
                * sqrt(list_dot_product(b.e, b.e))), 6) AS cos_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.e, b.e)
            / (sqrt(list_dot_product(a.e, a.e))
               * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.45
  AND a.split <> b.split
"""

REGISTRY["split_leakage_embeddings"] = {
    "fn": split_leakage_embeddings,
    "sql": SPLIT_LEAKAGE_SQL,
}


# --------------------------------------------------------------------------
# Wide-to-long UNPIVOT + per (brand, metric) stats. Spark's ``stack``
# table-generating expression is the codegen'd unpivot (no shuffle for
# the reshape itself); the stats groupBy map-side combines. DECIMAL(18,2)
# sums keep the aggregate order-independent and engine-exact.
# --------------------------------------------------------------------------


def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    long = part.select(
        "p_brand",
        F.expr(
            "stack(2, 'size', CAST(p_size AS DECIMAL(18,2)),"
            " 'retailprice', CAST(p_retailprice AS DECIMAL(18,2)))"
            " AS (metric, val)"
        ),
    )
    return long.groupBy("p_brand", "metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("val").cast("double").alias("min_val"),
        F.max("val").cast("double").alias("max_val"),
        F.sum("val").cast("double").alias("sum_val"),
    )


UNPIVOT_SQL = """
WITH long AS (
  SELECT p_brand, 'size' AS metric, CAST(p_size AS DECIMAL(18,2)) AS val
  FROM part
  UNION ALL
  SELECT p_brand, 'retailprice', CAST(p_retailprice AS DECIMAL(18,2))
  FROM part
)
SELECT p_brand, metric, COUNT(*) AS n,
       CAST(MIN(val) AS DOUBLE) AS min_val,
       CAST(MAX(val) AS DOUBLE) AS max_val,
       CAST(SUM(val) AS DOUBLE) AS sum_val
FROM long
GROUP BY p_brand, metric
"""

REGISTRY["unpivot_part_metrics"] = {
    "fn": unpivot_part_metrics,
    "sql": UNPIVOT_SQL,
}


# --------------------------------------------------------------------------
# Cross-source vocabulary overlap: Jaccard similarity of the DISTINCT
# token vocabularies of every source pair — the corpus-composition
# diagnostic behind "are these two crawls the same content?" decisions
# (complement of dedup_source_matrix, which compares near-dup DOCUMENTS;
# this compares aggregate vocabularies).
# Scale: one distinct (source, token) shuffle; the token self-join emits
# at most C(n_sources, 2) pairs PER TOKEN — bounded by the source count,
# not data volume — and the final matrix is n_sources^2-bounded.
# Jaccard as the exact integer rational.
# --------------------------------------------------------------------------


def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .distinct()
    )
    vocab = st.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    a, b = st.alias("a"), st.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("s_a"), F.col("b.source").alias("s_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    va = vocab.select(F.col("source").alias("s_a"), F.col("v").alias("v_a"))
    vb = vocab.select(F.col("source").alias("s_b"), F.col("v").alias("v_b"))
    return (
        inter.join(F.broadcast(va), "s_a")
        .join(F.broadcast(vb), "s_b")
        .select(
            "s_a",
            "s_b",
            "v_a",
            "v_b",
            "n_common",
            F.expr(
                exact_round_div_sql(
                    "n_common", "v_a + v_b - n_common", "DIV"
                )
            ).alias("jaccard_r"),
        )
    )


SOURCE_VOCAB_SQL = f"""
WITH st AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
vocab AS (SELECT source, COUNT(*) AS v FROM st GROUP BY source),
inter AS (
  SELECT a.source AS s_a, b.source AS s_b, COUNT(*) AS n_common
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.s_a, i.s_b, va.v AS v_a, vb.v AS v_b, i.n_common,
       {exact_round_div_sql("i.n_common", "va.v + vb.v - i.n_common", "//")}
         AS jaccard_r
FROM inter i
JOIN vocab va ON va.source = i.s_a
JOIN vocab vb ON vb.source = i.s_b
"""

REGISTRY["source_vocab_overlap"] = {
    "fn": source_vocab_overlap,
    "sql": SOURCE_VOCAB_SQL,
}


# --------------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov drift test: value distribution of
# the month's first half vs second half. D = max |ECDF1 - ECDF2| computed
# ENTIRELY in integers: on the cents grid, D = max |c1*n2 - c2*n1| /
# (n1*n2), so the statistic is exact and engine-identical (float ECDFs
# would disagree in the last ulp). The cumulative window runs over the
# cents grid — bounded by the VALUE DOMAIN (<= ~49k cells here), not row
# count, same class as the histogram-quantile windows.
# --------------------------------------------------------------------------

KS_SPLIT_DAY = 16  # days 1-15 vs 16-30


def ks_drift_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    half = F.when(F.dayofmonth("ts") < KS_SPLIT_DAY, 1).otherwise(2)
    # Cents grid via DECIMAL(18,2) cast, not ROUND(double): double-ROUND is
    # not engine-stable at half boundaries (portable_hash.py:121-127); the
    # decimal cast rounds the decimal expansion identically on both engines
    # and *100 on the decimal is exact integer arithmetic.
    cells = (
        ev.select(
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("vc"),
            half.alias("half"),
        )
        .groupBy("vc")
        .agg(
            F.count(F.when(F.col("half") == 1, 1)).alias("c1"),
            F.count(F.when(F.col("half") == 2, 1)).alias("c2"),
        )
    )
    totals = cells.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    from pyspark.sql import Window as W

    wc = W.orderBy("vc").rowsBetween(W.unboundedPreceding, 0)
    cum = cells.select(
        "vc",
        F.sum("c1").over(wc).alias("cum1"),
        F.sum("c2").over(wc).alias("cum2"),
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            "n1",
            "n2",
            F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
            .alias("dnum"),
        )
        .groupBy("n1", "n2")
        .agg(F.max("dnum").alias("max_d_num"))
        .select(
            "n1",
            "n2",
            "max_d_num",
            F.expr(
                # wide variant: the scaled numerator max_d_num * 2e6 can
                # pass int64 once halves reach ~2e6 rows (n1*n2 ~ 4e12);
                # DECIMAL(38,0)/HUGEINT intermediates keep it exact to
                # ~1e16-row halves
                exact_round_div_sql_wide("max_d_num", "n1 * n2", "DIV")
            ).alias("ks_d_r"),
        )
    )


KS_DRIFT_SQL = f"""
WITH cells AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
         COUNT(*) FILTER (WHERE date_part('day', ts) < {KS_SPLIT_DAY}) AS c1,
         COUNT(*) FILTER (WHERE date_part('day', ts) >= {KS_SPLIT_DAY}) AS c2
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c2) AS BIGINT) AS n2 FROM cells),
cum AS (
  SELECT vc,
         CAST(SUM(c1) OVER (ORDER BY vc
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum1,
         CAST(SUM(c2) OVER (ORDER BY vc
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum2
  FROM cells
)
SELECT t.n1, t.n2,
       MAX(ABS(cum1 * t.n2 - cum2 * t.n1)) AS max_d_num,
       {exact_round_div_sql_wide("MAX(ABS(cum1 * t.n2 - cum2 * t.n1))",
                                 "t.n1 * t.n2", "//")} AS ks_d_r
FROM cum, tot t
GROUP BY t.n1, t.n2
"""

REGISTRY["ks_drift_value"] = {"fn": ks_drift_value, "sql": KS_DRIFT_SQL}
