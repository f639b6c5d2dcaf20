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


REGISTRY: dict[str, dict] = {
    "sample_docs": {"fn": sample_docs, "sql": SAMPLE_DOCS_SQL},
    "mix_docs": {"fn": mix_docs, "sql": MIX_DOCS_SQL},
    "split_events": {"fn": split_events, "sql": SPLIT_EVENTS_SQL},
}
