"""Lexical search operators, round 4: positional inverted-index phrase
search and collocation (phrase) mining. Complements the BM25 scoring in
textq3 — together they are the lexical retrieval layer of a corpus
pipeline (BM25 ranks, phrase search filters, collocation mining feeds the
tokenizer/vocabulary with multi-word units).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de4ml_spark.operators.portable_hash import exact_round_div_sql
from de4ml_spark.operators.text import tokens
from de4ml_spark.session import load_table

# --------------------------------------------------------------------------
# Positional phrase search: find documents containing an exact token
# phrase via a posting-list self-join on adjacent positions — the
# inverted-index query shape (term postings join on doc & pos+1), not a
# substring scan.
# --------------------------------------------------------------------------

PHRASE = ("table", "hash")


def phrase_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs containing the exact phrase ``PHRASE``, with occurrence count
    and first position (1-indexed).

    Scale: each term's postings are filtered BEFORE the join (selective
    term predicates prune the exploded postings at the scan), then
    adjacent-position equi-joins on (doc, pos) — the plan a real inverted
    index executes as lookups; here the "index" is the exploded postings
    relation. Join fan-out is bounded by per-doc term frequency, never
    the corpus."""
    from de4ml_spark.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    ex = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    out = ex.filter(F.col("tok") == PHRASE[0]).select("doc_id", "pos")
    for i, term in enumerate(PHRASE[1:], start=1):
        nxt = ex.filter(F.col("tok") == term).select(
            "doc_id", (F.col("pos") - i).alias("pos")
        )
        out = out.join(nxt, ["doc_id", "pos"])
    return out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("pos").alias("first_pos"),
    )


def _phrase_sql() -> str:
    conds = " AND ".join(
        f"toks[pos + {i}] = '{t}'" for i, t in enumerate(PHRASE)
    )
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
p AS (
  SELECT doc_id, unnest(generate_series(1, len(toks) - {len(PHRASE) - 1}))
           AS pos, toks
  FROM t WHERE len(toks) >= {len(PHRASE)}
)
SELECT doc_id, COUNT(*) AS n_occurrences, MIN(pos) AS first_pos
FROM p WHERE {conds}
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Collocation mining: top bigrams by the word2vec phrase score
# count(ab) * N / (count(a) * count(b)) — exact integer rounding, so the
# ranking is engine-identical. Feeds multi-word units into vocabulary
# construction (vocab_top_terms's sibling).
# --------------------------------------------------------------------------

PMI_MIN_COUNT = 5
PMI_TOP = 20


def pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``PMI_TOP`` bigrams by exact lift score with unigram counts.

    Scale: two wordcount aggregations (unigrams, bigrams — both map-side
    combined) + two broadcast-able joins of the bigram relation against
    the unigram counts, and a TakeOrdered top-K. The score is a single
    integer rational rounded exactly, so cross-engine ranking ties are
    impossible beyond the (score, bigram) total order."""
    from de4ml_spark.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = tokens("text")
    uni = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n1 = uni.agg(F.sum("c").alias("__n1"))
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
    ).otherwise(F.array().cast("array<int>"))
    bi = (
        docs.select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("a"),
                        F.element_at(toks, i + 1).alias("b"),
                    ),
                )
            ).alias("g")
        )
        .select("g.a", "g.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_COUNT)
    )
    ua = uni.select(F.col("tok").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c").alias("c_b"))
    scored = (
        bi.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(n1))
        .select(
            F.concat_ws(" ", "a", "b").alias("bigram"),
            "c_ab",
            "c_a",
            "c_b",
            F.expr(
                exact_round_div_sql("c_ab * __n1", "c_a * c_b", "DIV")
            ).alias("score_r"),
        )
    )
    return scored.orderBy(F.desc("score_r"), F.asc("bigram")).limit(PMI_TOP)


PMI_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
uni AS (
  SELECT unnest(toks) AS tok FROM t
),
uc AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY 1),
n1 AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uc),
bi AS (
  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                i -> struct_pack(a := toks[i], b := toks[i + 1]))) AS g
  FROM t WHERE len(toks) >= 2
),
bc AS (
  SELECT g.a AS a, g.b AS b, COUNT(*) AS c_ab
  FROM bi GROUP BY 1, 2 HAVING COUNT(*) >= {PMI_MIN_COUNT}
),
scored AS (
  SELECT a || ' ' || b AS bigram, c_ab, ua.c AS c_a, ub.c AS c_b,
         {exact_round_div_sql('c_ab * n1.n', 'ua.c * ub.c', '//')} AS score_r
  FROM bc JOIN uc ua ON bc.a = ua.tok
          JOIN uc ub ON bc.b = ub.tok
          CROSS JOIN n1
)
SELECT bigram, c_ab, c_a, c_b, score_r
FROM scored ORDER BY score_r DESC, bigram LIMIT {PMI_TOP}
"""


# --------------------------------------------------------------------------
# EWMA (exponential smoothing) — a RECURSIVE statistic (y_i depends on
# y_{i-1}), normally inexpressible as a window function. With alpha = 1/2
# it has an exact integer closed form: y_i = T_i / 2^(i-1) where
# T_i = X_1 + Σ_{j=2..i} 2^(j-2) X_j over micro-unit integer daily totals.
# Integer window sums are order-independent (bit-exact at any
# parallelism), powers of two are exact in binary floating point, and the
# final casts/divisions are single correctly-rounded IEEE ops — so the
# unrounded DOUBLE output is engine-identical with no rounding hedge.
# Constraint: the series length per key must stay < 63 (2^(i-2) in
# BIGINT); the events table spans 30 days. At longer horizons, restart
# the recurrence per calendar month (the carry-in is one number per key).
# --------------------------------------------------------------------------


def ewma_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily purchase totals with alpha=1/2 EWMA over observed
    days (day index = row_number per user)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").cast("date").alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(
            (F.sum(F.col("value").cast("decimal(24,6)")) * 1000000)
            .cast("bigint")
            .alias("x")
        )
    )
    w = Window.partitionBy("user_id").orderBy("day")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    i = F.row_number().over(w)
    term = F.when(i == 1, F.col("x")).otherwise(
        F.col("x") * F.expr("shiftleft(CAST(1 AS BIGINT), i - 2)")
    )
    staged = daily.withColumn("i", i).withColumn("t", term)
    return staged.select(
        "user_id",
        "day",
        (F.col("x").cast("double") / F.lit(1000000.0)).alias("daily_total"),
        (
            F.sum("t").over(wcum).cast("double")
            / F.expr("CAST(shiftleft(CAST(1 AS BIGINT), i - 1) AS DOUBLE)")
            / F.lit(1000000.0)
        ).alias("ewma"),
    )


EWMA_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(24,6))) * 1000000 AS BIGINT) AS x
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
),
idx AS (
  SELECT user_id, day, x,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS i
  FROM daily
),
terms AS (
  SELECT *, CASE WHEN i = 1 THEN x
                 ELSE x * (CAST(1 AS BIGINT) << (i - 2)) END AS t
  FROM idx
)
SELECT user_id, day,
       CAST(x AS DOUBLE) / 1000000.0 AS daily_total,
       CAST(CAST(SUM(t) OVER (PARTITION BY user_id ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS DOUBLE)
         / CAST(CAST(1 AS BIGINT) << (i - 1) AS DOUBLE) / 1000000.0 AS ewma
FROM terms
"""


REGISTRY: dict[str, dict] = {
    "phrase_search_docs": {"fn": phrase_search_docs, "sql": _phrase_sql()},
    "pmi_bigrams": {"fn": pmi_bigrams, "sql": PMI_SQL},
    "ewma_user_daily": {"fn": ewma_user_daily, "sql": EWMA_SQL},
}
