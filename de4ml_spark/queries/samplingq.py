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
from de4ml_spark.session import load_table


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


REGISTRY: dict[str, dict] = {
    "sample_docs": {"fn": sample_docs, "sql": SAMPLE_DOCS_SQL},
    "mix_docs": {"fn": mix_docs, "sql": MIX_DOCS_SQL},
    "split_events": {"fn": split_events, "sql": SPLIT_EVENTS_SQL},
    "weighted_sample_docs": {
        "fn": weighted_sample_docs,
        "sql": WEIGHTED_SAMPLE_SQL,
    },
}
