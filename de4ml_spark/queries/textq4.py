"""Text-analysis tier IV (round 9b): lexical-richness and
readability diagnostics per source — Yule's K, type-token / hapax
ratios, the Zipf rank-frequency slope, Flesch reading ease, and the
Hellinger distance between per-source length distributions. These are
the corpus-curation signals ("is this source templated junk, is it
readable prose, does its length profile match the mixture") that sit
beside the Gopher-rule battery in a pretraining data pipeline.

Tokenizer convention: single-space split (string_split(text, ' ') /
F.split — the same convention as pipelineq.vocab_top_terms), so
type/token counts agree across engines by construction.

Exactness discipline: integer token counts end-to-end; ln through
the portable series; per-row doubles (ln, sqrt) micro-quantized to
integers BEFORE cross-row summation; final chains same-text.

Scale posture (100 TB): every entry is wordcount-shaped (explode →
map-side-combined groupBy on (source, token) or (source, bucket));
freq-of-freq and bucket tables are small; top-K slope fits ride a
K-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.operators.portable_hash import (
    wide_to_double_sql as _w2d,
)
from de4ml_spark.session import load_table

REGISTRY: dict = {}


def _big(div: str) -> str:
    return "DECIMAL(38,0)" if div.upper() == "DIV" else "HUGEINT"


# --------------------------------------------------------------------------
# Yule's K per source — the repeated-vocabulary characteristic
# (high K = templated/repetitive source). From the frequency-of-
# frequency table: K = 10⁴·(Σ_f f²·V_f − N)/N², all exact integers
# until one wide ratio. Two wordcount groupBys, both map-side
# combined; the f-o-f table is tiny.
# --------------------------------------------------------------------------


def _yule_final(div: str) -> list[str]:
    big = _big(div)
    num = f"(s_f2v - CAST(n_tok AS {big}))"
    den = f"(CAST(n_tok AS {big}) * n_tok)"
    return [
        "source",
        "n_tok",
        "n_types",
        f"10000.0 * {_w2d(num, div)} / {_w2d(den, div)} AS yule_k",
    ]


def yule_k_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    counts = tok.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    fof = counts.groupBy("source", "f").agg(
        F.count(F.lit(1)).cast("bigint").alias("v_f")
    )
    agg = fof.groupBy("source").agg(
        F.sum(F.expr("f * v_f")).cast("bigint").alias("n_tok"),
        F.sum("v_f").cast("bigint").alias("n_types"),
        F.sum(
            F.expr("CAST(f AS DECIMAL(38,0)) * f * v_f")
        ).alias("s_f2v"),
    )
    return agg.selectExpr(*_yule_final("DIV")).orderBy("source")


def _yule_sql() -> str:
    final = ",\n       ".join(_yule_final("//"))
    return f"""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
),
counts AS (
  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS f
  FROM tok GROUP BY 1, 2
),
fof AS (
  SELECT source, f, CAST(COUNT(*) AS BIGINT) AS v_f
  FROM counts GROUP BY 1, 2
),
agg AS (
  SELECT source,
         CAST(SUM(f * v_f) AS BIGINT) AS n_tok,
         CAST(SUM(v_f) AS BIGINT) AS n_types,
         SUM(CAST(f AS HUGEINT) * f * v_f) AS s_f2v
  FROM fof GROUP BY 1
)
SELECT {final}
FROM agg
ORDER BY source
"""


REGISTRY["yule_k_docs"] = {"fn": yule_k_docs, "sql": _yule_sql()}


# --------------------------------------------------------------------------
# Type-token ratio + hapax legomena share per source — the quick
# vocabulary-richness profile that pairs with Yule's K. Exact counts;
# the two ratios are single divisions.
# --------------------------------------------------------------------------

_TTR_FINAL = [
    "source",
    "n_tok",
    "n_types",
    "n_hapax",
    "CAST(n_types AS DOUBLE) / CAST(n_tok AS DOUBLE) AS ttr",
    "CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE)"
    " AS hapax_share",
]


def ttr_hapax_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    counts = tok.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    agg = counts.groupBy("source").agg(
        F.sum("f").cast("bigint").alias("n_tok"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.expr("CAST(f = 1 AS BIGINT)"))
        .cast("bigint")
        .alias("n_hapax"),
    )
    return agg.selectExpr(*_TTR_FINAL).orderBy("source")


def _ttr_sql() -> str:
    final = ",\n       ".join(_TTR_FINAL)
    return f"""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
),
counts AS (
  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS f
  FROM tok GROUP BY 1, 2
),
agg AS (
  SELECT source,
         CAST(SUM(f) AS BIGINT) AS n_tok,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hapax
  FROM counts GROUP BY 1
)
SELECT {final}
FROM agg
ORDER BY source
"""


REGISTRY["ttr_hapax_docs"] = {"fn": ttr_hapax_docs, "sql": _ttr_sql()}


# --------------------------------------------------------------------------
# Zipf rank-frequency slope over the top-100 corpus tokens: OLS of
# ln(count) on ln(rank) — a healthy natural-language corpus sits
# near −1. Both logs go through the portable-ln series and are
# micro-quantized BEFORE the OLS moment sums (cross-row double sums
# are engine-order dependent); the slope is one wide ratio. The
# K-row fit frame is a broadcast; upstream is the vocab wordcount.
# --------------------------------------------------------------------------

ZIPF_K = 100


def _zipf_final(div: str) -> list[str]:
    big = _big(div)
    num = f"(CAST(n AS {big}) * sxy - CAST(sx AS {big}) * sy)"
    den = f"(CAST(n AS {big}) * sxx - CAST(sx AS {big}) * sx)"
    return [
        "n",
        f"{_w2d(num, div)} / {_w2d(den, div)} AS zipf_slope",
    ]


def zipf_slope_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import with_portable_ln

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(F.split(F.col("text"), " ")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    topk = (
        counts.orderBy(F.desc("cnt"), F.asc("t"))
        .limit(ZIPF_K)
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), F.asc("t")))
            .cast("bigint"),
        )
    )
    lned = with_portable_ln(topk, "rnk", "1", "__lnx")
    lned = with_portable_ln(lned, "cnt", "1", "__lny")
    q = lned.selectExpr(
        "CAST(floor(__lnx * 1000000.0 + 0.5) AS BIGINT) AS x_u",
        "CAST(floor(__lny * 1000000.0 + 0.5) AS BIGINT) AS y_u",
    )
    mom = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x_u").cast("bigint").alias("sx"),
        F.sum("y_u").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(x_u AS DECIMAL(38,0)) * y_u")).alias(
            "sxy"
        ),
        F.sum(F.expr("CAST(x_u AS DECIMAL(38,0)) * x_u")).alias(
            "sxx"
        ),
    )
    return mom.selectExpr(*_zipf_final("DIV"))


def _zipf_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
    )

    lnx = portable_ln_duck_ctes(
        "topk", "rnk, cnt", "rnk", "1", "__lnx", "zx"
    )
    lny = portable_ln_duck_ctes(
        "zx_out", "rnk, cnt, __lnx", "cnt", "1", "__lny", "zy"
    )
    final = ",\n       ".join(_zipf_final("//"))
    return f"""
WITH counts AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  GROUP BY 1
),
topk AS (
  SELECT cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, t) AS BIGINT)
           AS rnk
  FROM counts ORDER BY cnt DESC, t LIMIT {ZIPF_K}
),
{lnx},
{lny},
q AS (
  SELECT CAST(floor(__lnx * 1000000.0 + 0.5) AS BIGINT) AS x_u,
         CAST(floor(__lny * 1000000.0 + 0.5) AS BIGINT) AS y_u
  FROM zy_out
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x_u) AS BIGINT) AS sx,
         CAST(SUM(y_u) AS BIGINT) AS sy,
         SUM(CAST(x_u AS HUGEINT) * y_u) AS sxy,
         SUM(CAST(x_u AS HUGEINT) * x_u) AS sxx
  FROM q
)
SELECT {final}
FROM mom
"""


REGISTRY["zipf_slope_docs"] = {
    "fn": zipf_slope_docs,
    "sql": _zipf_sql(),
}


# --------------------------------------------------------------------------
# Flesch reading ease per source, from corpus-level totals: words =
# space-split tokens, sentences = [.!?]+ runs (min 1 per doc),
# syllables ≈ vowel-group runs — the standard regex heuristic,
# identical pattern both engines. FRE = 206.835 − 1.015·(W/S) −
# 84.6·(Y/W) on the exact per-source integer totals. Map-only
# per-doc regex counts + one groupBy.
# --------------------------------------------------------------------------

_FLESCH_FINAL = [
    "source",
    "n_docs",
    "n_words",
    "n_sentences",
    "n_syllables",
    "206.835 - 1.015 * (CAST(n_words AS DOUBLE)"
    " / CAST(n_sentences AS DOUBLE))"
    " - 84.6 * (CAST(n_syllables AS DOUBLE)"
    " / CAST(n_words AS DOUBLE)) AS flesch",
]


def flesch_reading_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per = docs.selectExpr(
        "source",
        "CAST(size(split(text, ' ')) AS BIGINT) AS w",
        "CAST(GREATEST(size(regexp_extract_all(text, '[.!?]+', 0)), 1)"
        " AS BIGINT) AS s",
        "CAST(size(regexp_extract_all(text, '[aeiouyAEIOUY]+', 0))"
        " AS BIGINT) AS y",
    )
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("n_words"),
        F.sum("s").cast("bigint").alias("n_sentences"),
        F.sum("y").cast("bigint").alias("n_syllables"),
    )
    return agg.selectExpr(*_FLESCH_FINAL).orderBy("source")


def _flesch_sql() -> str:
    final = ",\n       ".join(_FLESCH_FINAL)
    return f"""
WITH per AS (
  SELECT source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS s,
         CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
              AS BIGINT) AS y
  FROM documents
),
agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(w) AS BIGINT) AS n_words,
         CAST(SUM(s) AS BIGINT) AS n_sentences,
         CAST(SUM(y) AS BIGINT) AS n_syllables
  FROM per GROUP BY 1
)
SELECT {final}
FROM agg
ORDER BY source
"""


REGISTRY["flesch_reading_docs"] = {
    "fn": flesch_reading_docs,
    "sql": _flesch_sql(),
}


# --------------------------------------------------------------------------
# Hellinger distance between each source's document-length
# distribution (50-char buckets) and the pooled corpus — the metric
# sibling of js_divergence_sources (mldataq5.py), bounded [0,1].
# BC = Σ_b √(c_b·d_b) / √(n_src·n_pool): each per-bucket √(c·d) is
# one correctly-rounded IEEE sqrt on exact integers, micro-quantized
# and integer-summed; H = √(1−BC) with a 0-clamp for quantization
# spill. Bucket grid is histogram×k-bounded.
# --------------------------------------------------------------------------


def _hell_final(div: str) -> list[str]:
    big = _big(div)
    bc = (
        "(CAST(s_u AS DOUBLE) / 1000000.0)"
        f" / sqrt({_w2d(f'CAST(n_src AS {big}) * n_pool', div)})"
    )
    return [
        "source",
        "n_src",
        f"sqrt(GREATEST(1.0 - {bc}, 0.0)) AS hellinger",
    ]


def hellinger_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    binned = docs.selectExpr("source", "n_chars DIV 50 AS bucket")
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
    terms = (
        per.join(F.broadcast(pool), "bucket")
        .selectExpr(
            "source",
            "CAST(floor(sqrt(CAST(c AS DOUBLE) * CAST(d AS DOUBLE))"
            " * 1000000.0 + 0.5) AS BIGINT) AS t_u",
        )
        .groupBy("source")
        .agg(F.sum("t_u").cast("bigint").alias("s_u"))
    )
    j = (
        terms.join(F.broadcast(sizes), "source")
        .crossJoin(F.broadcast(n_pool))
    )
    return j.selectExpr(*_hell_final("DIV")).orderBy("source")


def _hell_sql() -> str:
    final = ",\n       ".join(_hell_final("//"))
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
n_pool AS (SELECT CAST(SUM(d) AS BIGINT) AS n_pool FROM pool),
terms AS (
  SELECT source,
         CAST(SUM(CAST(floor(sqrt(CAST(c AS DOUBLE)
           * CAST(d AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT))
           AS BIGINT) AS s_u
  FROM per JOIN pool USING (bucket)
  GROUP BY 1
)
SELECT {final}
FROM terms JOIN sizes USING (source) CROSS JOIN n_pool
ORDER BY source
"""


REGISTRY["hellinger_sources"] = {
    "fn": hellinger_sources,
    "sql": _hell_sql(),
}


# --------------------------------------------------------------------------
# Heaps' law fit across sources: vocabulary growth V = K·n^β, i.e.
# ln V = ln K + β·ln n with one (token_count, vocab_size) point per
# source. The token/vocab counts are exact integers (one explode +
# two groupBys, shuffled on token only within source); the log-log
# fit is the same micro-quantized portable-ln OLS as zipf_slope.
# β ∈ (0,1) for natural corpora — the scale diagnostic a dedup
# pipeline watches to spot template-flooded sources.
# --------------------------------------------------------------------------


def _heaps_final(div: str) -> list[str]:
    big = _big(div)
    num = f"(CAST(n AS {big}) * sxy - CAST(sx AS {big}) * sy)"
    den = f"(CAST(n AS {big}) * sxx - CAST(sx AS {big}) * sx)"
    beta = f"{_w2d(num, div)} / NULLIF({_w2d(den, div)}, 0.0)"
    return [
        "n AS n_sources",
        f"{beta} AS heaps_beta",
        f"(CAST(sy AS DOUBLE) - ({beta}) * CAST(sx AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * 1000000.0) AS heaps_ln_k",
    ]


def heaps_law_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import with_portable_ln

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    per = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok"),
        F.countDistinct("t").cast("bigint").alias("vocab"),
    )
    lned = with_portable_ln(per, "n_tok", "1", "__lnx")
    lned = with_portable_ln(lned, "vocab", "1", "__lny")
    q = lned.selectExpr(
        "CAST(floor(__lnx * 1000000.0 + 0.5) AS BIGINT) AS x_u",
        "CAST(floor(__lny * 1000000.0 + 0.5) AS BIGINT) AS y_u",
    )
    mom = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x_u").cast("bigint").alias("sx"),
        F.sum("y_u").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(x_u AS DECIMAL(38,0)) * y_u")).alias("sxy"),
        F.sum(F.expr("CAST(x_u AS DECIMAL(38,0)) * x_u")).alias("sxx"),
    )
    return mom.selectExpr(*_heaps_final("DIV"))


def _heaps_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
    )

    lnx = portable_ln_duck_ctes(
        "per", "n_tok, vocab", "n_tok", "1", "__lnx", "hx"
    )
    lny = portable_ln_duck_ctes(
        "hx_out", "n_tok, vocab, __lnx", "vocab", "1", "__lny", "hy"
    )
    final = ",\n       ".join(_heaps_final("//"))
    return f"""
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_tok,
         CAST(COUNT(DISTINCT t) AS BIGINT) AS vocab
  FROM (
    SELECT source, unnest(string_split(text, ' ')) AS t
    FROM documents
  )
  GROUP BY 1
),
{lnx},
{lny},
q AS (
  SELECT CAST(floor(__lnx * 1000000.0 + 0.5) AS BIGINT) AS x_u,
         CAST(floor(__lny * 1000000.0 + 0.5) AS BIGINT) AS y_u
  FROM hy_out
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x_u) AS BIGINT) AS sx,
         CAST(SUM(y_u) AS BIGINT) AS sy,
         SUM(CAST(x_u AS HUGEINT) * y_u) AS sxy,
         SUM(CAST(x_u AS HUGEINT) * x_u) AS sxx
  FROM q
)
SELECT {final}
FROM mom
"""


REGISTRY["heaps_law_sources"] = {
    "fn": heaps_law_sources,
    "sql": _heaps_sql(),
}


# --------------------------------------------------------------------------
# Chapman capture-recapture estimate of the shared-document universe
# between the two largest sources: treating each source's exact
# fingerprint set as one "capture", N̂ = (n1+1)(n2+1)/(m+1) − 1
# estimates the true universe a dedup pipeline is sampling — the
# coverage audit run before trusting cross-source dedup rates.
# Fingerprints are md5(text) (exact-dup class); all counts exact,
# one ratio. Sources are picked by doc count (ties by name) so the
# entry is deterministic at any scale.
# --------------------------------------------------------------------------

_CHAPMAN_FINAL = [
    "src_a",
    "src_b",
    "n1",
    "n2",
    "m_common",
    "(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)"
    " / CAST(m_common + 1 AS DOUBLE)) - 1.0 AS chapman_n_hat",
]


def chapman_overlap_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    top2 = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("source"))
        .limit(2)
        .selectExpr(
            "source",
            "row_number() OVER (ORDER BY n_docs DESC, source)"
            " AS side",
        )
    )
    fps = (
        docs.join(F.broadcast(top2), "source")
        .selectExpr("side", "md5(CAST(text AS BINARY)) AS fp")
        .distinct()
    )
    names = top2.groupBy().agg(
        F.max(F.expr("CASE WHEN side = 1 THEN source END")).alias(
            "src_a"
        ),
        F.max(F.expr("CASE WHEN side = 2 THEN source END")).alias(
            "src_b"
        ),
    )
    counts = fps.groupBy("fp").agg(
        F.sum(F.expr("CAST(side = 1 AS BIGINT)")).alias("in_a"),
        F.sum(F.expr("CAST(side = 2 AS BIGINT)")).alias("in_b"),
    ).agg(
        F.sum("in_a").cast("bigint").alias("n1"),
        F.sum("in_b").cast("bigint").alias("n2"),
        F.sum(F.expr("CAST(in_a = 1 AND in_b = 1 AS BIGINT)"))
        .cast("bigint")
        .alias("m_common"),
    )
    return counts.crossJoin(F.broadcast(names)).selectExpr(
        *_CHAPMAN_FINAL
    )


def _chapman_sql() -> str:
    final = ",\n       ".join(_CHAPMAN_FINAL)
    return f"""
WITH top2 AS (
  SELECT source,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, source) AS side
  FROM documents GROUP BY source
  ORDER BY COUNT(*) DESC, source LIMIT 2
),
fps AS (
  SELECT DISTINCT side, md5(text) AS fp
  FROM documents JOIN top2 USING (source)
),
names AS (
  SELECT MAX(CASE WHEN side = 1 THEN source END) AS src_a,
         MAX(CASE WHEN side = 2 THEN source END) AS src_b
  FROM top2
),
counts AS (
  SELECT CAST(SUM(in_a) AS BIGINT) AS n1,
         CAST(SUM(in_b) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS m_common
  FROM (
    SELECT fp,
           SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS in_a,
           SUM(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS in_b
    FROM fps GROUP BY 1
  )
)
SELECT {final}
FROM counts CROSS JOIN names
"""


REGISTRY["chapman_overlap_sources"] = {
    "fn": chapman_overlap_sources,
    "sql": _chapman_sql(),
}


# --------------------------------------------------------------------------
# Pairwise vocabulary Jaccard between sources: per unordered source
# pair, |V_a ∩ V_b| / |V_a ∪ V_b| over distinct tokens. One explode
# + distinct, then the per-token source LIST pair-explodes into the
# (sources choose 2)-bounded pair frame — intersection counts come
# from the token side, union by inclusion-exclusion; no token-level
# join. The cross-source contamination screen beside
# js_divergence_sources (mass overlap) and heaps_law_sources
# (growth).
# --------------------------------------------------------------------------

_VOCAB_JACCARD_FINAL = [
    "src_a",
    "src_b",
    "inter_v",
    "union_v",
    "CAST(inter_v AS DOUBLE) / CAST(union_v AS DOUBLE)"
    " AS vocab_jaccard",
]


def vocab_jaccard_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("t")
    ).distinct()
    sizes = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    a = tok.selectExpr("t", "source AS src_a")
    b = tok.selectExpr("t", "source AS src_b")
    inter = (
        a.join(b, "t")
        .filter("src_a < src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter_v"))
    )
    sa = sizes.selectExpr("source AS src_a", "v AS va")
    sb = sizes.selectExpr("source AS src_b", "v AS vb")
    out = (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .selectExpr(
            "src_a",
            "src_b",
            "inter_v",
            "va + vb - inter_v AS union_v",
        )
    )
    return out.selectExpr(*_VOCAB_JACCARD_FINAL).orderBy(
        "src_a", "src_b"
    )


def _vocab_jaccard_sql() -> str:
    final = ",\n       ".join(_VOCAB_JACCARD_FINAL)
    return f"""
WITH tok AS (
  SELECT DISTINCT source, t
  FROM (SELECT source, unnest(string_split(text, ' ')) AS t
        FROM documents)
),
sizes AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS v FROM tok GROUP BY 1
),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS inter_v
  FROM tok a JOIN tok b ON a.t = b.t AND a.source < b.source
  GROUP BY 1, 2
)
SELECT {final}
FROM (
  SELECT src_a, src_b, inter_v, sa.v + sb.v - inter_v AS union_v
  FROM inter
  JOIN sizes sa ON sa.source = src_a
  JOIN sizes sb ON sb.source = src_b
)
ORDER BY src_a, src_b
"""


REGISTRY["vocab_jaccard_sources"] = {
    "fn": vocab_jaccard_sources,
    "sql": _vocab_jaccard_sql(),
}


# --------------------------------------------------------------------------
# Dunning log-likelihood keyness: the 20 terms most over/under-
# represented between the two largest sources (corpus-linguistics
# keyword extraction; the signed G² beside g_test's global table).
# Per term with counts (a, b) and totals (Na, Nb):
#   G² = 2·[a·ln(a·N/(Na·(a+b))) + b·ln(b·N/(Nb·(a+b)))]
# — each ln is the portable-ln on exact integer rationals with sign,
# micro-quantized, weighted by exact counts, so g2_micro is an exact
# integer and the top-20-by-(G², term) cut is engine-deterministic.
# Sign: positive when the term leans toward source A.
# --------------------------------------------------------------------------

KEYNESS_K = 20

_KEYNESS_FINAL = [
    "term",
    "cnt_a",
    "cnt_b",
    "CAST(g2_u AS DOUBLE) / 1000000.0 AS g2_keyness",
    "CAST(lean_a AS INT) AS leans_a",
]


def keyness_terms_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import with_portable_ln

    docs = load_table(spark, sf_dir, "documents")
    top2 = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("source"))
        .limit(2)
        .selectExpr(
            "source",
            "row_number() OVER (ORDER BY n_docs DESC, source)"
            " AS side",
        )
    )
    toks = (
        docs.join(F.broadcast(top2), "source")
        .select(
            "side", F.explode(F.split(F.col("text"), " ")).alias("t")
        )
        .groupBy("t")
        .agg(
            F.sum(F.expr("CAST(side = 1 AS BIGINT)"))
            .cast("bigint")
            .alias("a"),
            F.sum(F.expr("CAST(side = 2 AS BIGINT)"))
            .cast("bigint")
            .alias("b"),
        )
    )
    tot = toks.agg(
        F.sum("a").cast("bigint").alias("na"),
        F.sum("b").cast("bigint").alias("nb"),
    )
    j = toks.crossJoin(F.broadcast(tot)).selectExpr(
        "t",
        "a",
        "b",
        # term A: ln(a·(na+nb) / (na·(a+b))), term B symmetric
        "CAST(a AS DECIMAL(38,0)) * (na + nb) AS a_num",
        "CAST(na AS DECIMAL(38,0)) * (a + b) AS a_den",
        "CAST(b AS DECIMAL(38,0)) * (na + nb) AS b_num",
        "CAST(nb AS DECIMAL(38,0)) * (a + b) AS b_den",
    )
    la = with_portable_ln(
        j.filter("a > 0"),
        "CASE WHEN a_num >= a_den THEN a_num ELSE a_den END",
        "CASE WHEN a_num >= a_den THEN a_den ELSE a_num END",
        "__la",
    ).selectExpr(
        "t",
        "CAST(a AS DECIMAL(38,0))"
        " * CAST(floor((CASE WHEN a_num >= a_den THEN __la"
        " ELSE -__la END) * 1000000.0 + 0.5) AS BIGINT) AS w_a",
    )
    lb = with_portable_ln(
        j.filter("b > 0"),
        "CASE WHEN b_num >= b_den THEN b_num ELSE b_den END",
        "CASE WHEN b_num >= b_den THEN b_den ELSE b_num END",
        "__lb",
    ).selectExpr(
        "t",
        "CAST(b AS DECIMAL(38,0))"
        " * CAST(floor((CASE WHEN b_num >= b_den THEN __lb"
        " ELSE -__lb END) * 1000000.0 + 0.5) AS BIGINT) AS w_b",
    )
    g2 = (
        toks.join(la, "t", "left")
        .join(lb, "t", "left")
        .selectExpr(
            "t AS term",
            "a AS cnt_a",
            "b AS cnt_b",
            "CAST(2 * (COALESCE(w_a, 0) + COALESCE(w_b, 0))"
            " AS BIGINT) AS g2_u",
            "CAST(COALESCE(w_a, 0) >= 0 AS INT) AS lean_a",
        )
    )
    top = g2.orderBy(
        F.desc("g2_u"), F.asc("term")
    ).limit(KEYNESS_K)
    return top.selectExpr(*_KEYNESS_FINAL)


def _keyness_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
    )

    lna = portable_ln_duck_ctes(
        "ja",
        "t, a, a_num, a_den",
        "CASE WHEN a_num >= a_den THEN a_num ELSE a_den END",
        "CASE WHEN a_num >= a_den THEN a_den ELSE a_num END",
        "__la",
        "ka",
    )
    lnb = portable_ln_duck_ctes(
        "jb",
        "t, b, b_num, b_den",
        "CASE WHEN b_num >= b_den THEN b_num ELSE b_den END",
        "CASE WHEN b_num >= b_den THEN b_den ELSE b_num END",
        "__lb",
        "kb",
    )
    final = ",\n       ".join(_KEYNESS_FINAL)
    return f"""
WITH top2 AS (
  SELECT source,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, source) AS side
  FROM documents GROUP BY source
  ORDER BY COUNT(*) DESC, source LIMIT 2
),
toks AS (
  SELECT t,
         CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS a,
         CAST(SUM(CASE WHEN side = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS b
  FROM (
    SELECT side, unnest(string_split(text, ' ')) AS t
    FROM documents JOIN top2 USING (source)
  )
  GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
  FROM toks
),
j AS (
  SELECT t, a, b,
         CAST(a AS HUGEINT) * (na + nb) AS a_num,
         CAST(na AS HUGEINT) * (a + b) AS a_den,
         CAST(b AS HUGEINT) * (na + nb) AS b_num,
         CAST(nb AS HUGEINT) * (a + b) AS b_den
  FROM toks CROSS JOIN tot
),
ja AS (SELECT * FROM j WHERE a > 0),
jb AS (SELECT * FROM j WHERE b > 0),
{lna},
{lnb},
wa AS (
  SELECT t,
         CAST(a AS HUGEINT)
         * CAST(floor((CASE WHEN a_num >= a_den THEN __la
           ELSE -__la END) * 1000000.0 + 0.5) AS BIGINT) AS w_a
  FROM ka_out
),
wb AS (
  SELECT t,
         CAST(b AS HUGEINT)
         * CAST(floor((CASE WHEN b_num >= b_den THEN __lb
           ELSE -__lb END) * 1000000.0 + 0.5) AS BIGINT) AS w_b
  FROM kb_out
),
g2 AS (
  SELECT toks.t AS term, a AS cnt_a, b AS cnt_b,
         CAST(2 * (COALESCE(w_a, 0) + COALESCE(w_b, 0)) AS BIGINT)
           AS g2_u,
         CAST(COALESCE(w_a, 0) >= 0 AS INT) AS lean_a
  FROM toks
  LEFT JOIN wa ON wa.t = toks.t
  LEFT JOIN wb ON wb.t = toks.t
)
SELECT {final}
FROM (
  SELECT * FROM g2 ORDER BY g2_u DESC, term ASC LIMIT {KEYNESS_K}
)
"""


REGISTRY["keyness_terms_sources"] = {
    "fn": keyness_terms_sources,
    "sql": _keyness_sql(),
}


# --------------------------------------------------------------------------
# Burrows' Delta between the two largest sources — the classic
# stylometric distance: over the top-K corpus terms, Delta =
# mean_t |z_A(t) − z_B(t)| where z standardizes each term's relative
# frequency across ALL sources (the means cancel in the difference,
# so Delta = mean_t |f_A − f_B| / σ_t). Relative frequencies are
# nano-quantized exact integers (halfup c·1e9/N_s); per-term
# population variance across sources is an exact S-scaled integer;
# each |Δf|/σ term is micro-quantized on the SAME IEEE text both
# engines; the K-term frame is broadcast-bounded.
# --------------------------------------------------------------------------

BURROWS_K = 50

_BURROWS_FINAL = [
    "src_a",
    "src_b",
    "n_terms",
    # mean over the terms actually available (the synthetic sf0.001
    # corpus has a vocabulary smaller than K)
    "CAST(delta_u AS DOUBLE)"
    " / (CAST(n_terms AS DOUBLE) * 1000000.0) AS burrows_delta",
]


def burrows_delta_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        wide_halfup_div_sql as _whd,
        wide_to_double_sql as _w2d_,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    counts = toks.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    topk = (
        counts.groupBy("t")
        .agg(F.sum("c").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("t"))
        .limit(BURROWS_K)
        .select("t")
    )
    totals = counts.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_s")
    )
    sources = totals.select("source")
    grid = (
        sources.crossJoin(F.broadcast(topk))
        .join(counts, ["source", "t"], "left")
        .join(totals, "source")
        .selectExpr(
            "source",
            "t",
            "COALESCE(c, 0) AS c",
            "n_s",
        )
        .selectExpr(
            "source",
            "t",
            f"CAST({_whd('CAST(c AS DECIMAL(38,0)) * 1000000000', 'n_s', 'DIV')}"
            " AS BIGINT) AS f9",
        )
    )
    var_t = grid.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("s_cnt"),
        F.sum("f9").cast("bigint").alias("sf"),
        F.sum(F.expr("CAST(f9 AS DECIMAL(38,0)) * f9")).alias("sf2"),
    ).selectExpr(
        "t",
        "s_cnt",
        "CAST(s_cnt AS DECIMAL(38,0)) * sf2"
        " - CAST(sf AS DECIMAL(38,0)) * sf AS v9",
    )
    top2 = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("source"))
        .limit(2)
        .selectExpr(
            "source",
            "row_number() OVER (ORDER BY n_docs DESC, source)"
            " AS side",
        )
    )
    ab = (
        grid.join(F.broadcast(top2), "source")
        .groupBy("t")
        .agg(
            F.max(F.expr("CASE WHEN side = 1 THEN f9 END")).alias(
                "f_a"
            ),
            F.max(F.expr("CASE WHEN side = 2 THEN f9 END")).alias(
                "f_b"
            ),
        )
    )
    terms = ab.join(var_t, "t").selectExpr(
        "t",
        "CAST(floor(1000000.0 * CAST(s_cnt AS DOUBLE)"
        f" * CAST(abs(f_a - f_b) AS DOUBLE) / sqrt({_w2d_('v9', 'DIV')})"
        " + 0.5) AS BIGINT) AS t_u",
    )
    names = top2.groupBy().agg(
        F.max(F.expr("CASE WHEN side = 1 THEN source END")).alias(
            "src_a"
        ),
        F.max(F.expr("CASE WHEN side = 2 THEN source END")).alias(
            "src_b"
        ),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum("t_u").cast("bigint").alias("delta_u"),
    )
    return agg.crossJoin(F.broadcast(names)).selectExpr(
        *_BURROWS_FINAL
    )


def _burrows_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        wide_halfup_div_sql as _whd,
        wide_to_double_sql as _w2d_,
    )

    final = ",\n       ".join(_BURROWS_FINAL)
    return f"""
WITH counts AS (
  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS t
        FROM documents)
  GROUP BY 1, 2
),
topk AS (
  SELECT t FROM (
    SELECT t, SUM(c) AS cnt FROM counts GROUP BY 1
  ) ORDER BY cnt DESC, t LIMIT {BURROWS_K}
),
totals AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM counts GROUP BY 1
),
grid AS (
  SELECT source, t,
         CAST({_whd('CAST(COALESCE(c, 0) AS HUGEINT) * 1000000000',
                    'n_s', '//')} AS BIGINT) AS f9
  FROM (
    SELECT s.source, k.t, c.c, s.n_s
    FROM totals s CROSS JOIN topk k
    LEFT JOIN counts c ON c.source = s.source AND c.t = k.t
  )
),
var_t AS (
  SELECT t,
         CAST(COUNT(*) AS BIGINT) AS s_cnt,
         CAST(COUNT(*) AS HUGEINT) * SUM(CAST(f9 AS HUGEINT) * f9)
         - CAST(SUM(f9) AS HUGEINT) * SUM(f9) AS v9
  FROM grid GROUP BY 1
),
top2 AS (
  SELECT source,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, source) AS side
  FROM documents GROUP BY source
  ORDER BY COUNT(*) DESC, source LIMIT 2
),
ab AS (
  SELECT t,
         MAX(CASE WHEN side = 1 THEN f9 END) AS f_a,
         MAX(CASE WHEN side = 2 THEN f9 END) AS f_b
  FROM grid JOIN top2 USING (source)
  GROUP BY 1
),
terms AS (
  SELECT ab.t,
         CAST(floor(1000000.0 * CAST(s_cnt AS DOUBLE)
              * CAST(abs(f_a - f_b) AS DOUBLE)
              / sqrt({_w2d_('v9', '//')}) + 0.5) AS BIGINT) AS t_u
  FROM ab JOIN var_t ON var_t.t = ab.t
),
names AS (
  SELECT MAX(CASE WHEN side = 1 THEN source END) AS src_a,
         MAX(CASE WHEN side = 2 THEN source END) AS src_b
  FROM top2
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(t_u) AS BIGINT) AS delta_u
  FROM terms
)
SELECT {final}
FROM agg CROSS JOIN names
"""


REGISTRY["burrows_delta_sources"] = {
    "fn": burrows_delta_sources,
    "sql": _burrows_sql(),
}
