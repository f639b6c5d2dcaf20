"""ML-training-data queries (extension tier, round 2): intra-document
repetition filtering (Gopher/MassiveText-style) and temperature-adjusted
mixture rates. Both fully oracle-gated — every step is exact integer math,
IEEE-exact sqrt, or order-free decimal summation (see operator docstrings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de4ml_spark.operators.sampling import temperature_rates
from de4ml_spark.operators.text import chunk_rows, repetition_stats
from de4ml_spark.session import load_table

# Flag thresholds sit at ~p90 of the corpus distribution (measured at
# sf0.01: dup2 p90 = 0.065, top2 p90 = 0.069) — non-vacuous on testdata.
DUP2_FLAG = 0.06
TOP2_FLAG = 0.08


def repetition_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repeated-n-gram fractions (n=2,3) + the pretraining filter
    flag — the standard screen for looping/boilerplate documents."""
    docs = load_table(spark, sf_dir, "documents")
    stats = repetition_stats(docs, ns=(2, 3))
    return stats.withColumn(
        "flagged",
        (F.col("dup2_frac") >= DUP2_FLAG) | (F.col("top2_frac") >= TOP2_FLAG),
    )


def _rep_sql() -> str:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    def r(p: str, q: str) -> str:
        return exact_round_div_sql(p, q, "//")

    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g2 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
             i -> array_to_string(toks[i:i+1], ' '))) AS gram
       FROM t WHERE len(toks) >= 2),
c2 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
s2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS t, COUNT(*) AS d,
              MAX(c) AS p
       FROM c2 GROUP BY doc_id),
g3 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
             i -> array_to_string(toks[i:i+2], ' '))) AS gram
       FROM t WHERE len(toks) >= 3),
c3 AS (SELECT doc_id, gram, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
s3 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS t, COUNT(*) AS d,
              MAX(c) AS p
       FROM c3 GROUP BY doc_id),
f AS (
  SELECT s2.doc_id,
         {r('s2.t - s2.d', 's2.t')} AS dup2_frac,
         {r('s2.p', 's2.t')} AS top2_frac,
         {r('s3.t - s3.d', 's3.t')} AS dup3_frac,
         {r('s3.p', 's3.t')} AS top3_frac
  FROM s2 JOIN s3 ON s2.doc_id = s3.doc_id
)
SELECT doc_id, dup2_frac, top2_frac, dup3_frac, top3_frac,
       (dup2_frac >= {DUP2_FLAG} OR top2_frac >= {TOP2_FLAG}) AS flagged
FROM f
"""


REPETITION_SQL = _rep_sql()


def temperature_mix_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source temperature (alpha=0.5) mixture rates over the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return temperature_rates(docs, source_col="source")


TEMPERATURE_SQL = """
WITH counts AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
x AS (
  SELECT source, n_docs,
         n_docs / SUM(n_docs) OVER () AS p,
         CAST(ROUND(sqrt(n_docs / SUM(n_docs) OVER ()), 12)
              AS DECIMAL(24,12)) AS wgt
  FROM counts
),
y AS (
  SELECT source, n_docs, p,
         CAST(wgt AS DOUBLE) / CAST(SUM(wgt) OVER () AS DOUBLE) AS q
  FROM x
),
z AS (SELECT source, n_docs, p, q, q / p AS rate_raw FROM y),
fin AS (SELECT source, n_docs, p, q,
               rate_raw / MAX(rate_raw) OVER () AS rate
        FROM z)
SELECT source, n_docs, ROUND(p, 6) AS p, ROUND(q, 6) AS q,
       ROUND(rate, 6) AS rate, ROUND(rate * n_docs, 2) AS expected_docs
FROM fin
"""


def chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (64-token windows, stride 48) — summarized
    per doc so the graded result stays small while still pinning every
    chunk boundary: chunk count, total/ min/max chunk token counts, and an
    md5 over the concatenated chunk texts in chunk order."""
    # a NULL-text doc has no chunks — filter on both engines (round-14
    # nulldocs parity sweep: Spark chunked NULL into one empty chunk
    # while the oracle's string_agg dropped the NULL chunk text)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    ch = chunk_rows(docs, chunk_size=64, stride=48)
    return ch.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.md5(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text")))
                .getField("chunk_text")
            )
        ).alias("chunks_md5"),
    )


CHUNK_DOCS_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE text IS NOT NULL),
s AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, greatest(len(toks) - 16, 1), 48)) AS st
  FROM t
),
ch AS (
  SELECT doc_id,
         CAST((st - 1) // 48 AS INTEGER) AS chunk_id,
         CAST(len(toks[st:st+63]) AS INTEGER) AS n_tokens,
         array_to_string(toks[st:st+63], ' ') AS chunk_text
  FROM s
)
SELECT doc_id, COUNT(*) AS n_chunks,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(n_tokens) AS min_tokens,
       MAX(n_tokens) AS max_tokens,
       md5(string_agg(chunk_text, chr(1) ORDER BY chunk_id)) AS chunks_md5
FROM ch
GROUP BY doc_id
"""


REGISTRY: dict[str, dict] = {
    "repetition_docs": {"fn": repetition_docs, "sql": REPETITION_SQL},
    "chunk_docs": {"fn": chunk_docs, "sql": CHUNK_DOCS_SQL},
    "temperature_mix_rates": {
        "fn": temperature_mix_rates,
        "sql": TEMPERATURE_SQL,
    },
}
