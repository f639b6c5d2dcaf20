"""ETL + multimodal queries that exercise the library plumbing with oracles.

``multimodal_meta`` runs the real mapInPandas Arrow path; its oracle
recomputes byte_len/magic/width/height arithmetically in SQL (the fake
payload is MAGIC + UTF-8 text, so byte_len = 4 + octet_length(text)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from de4ml_spark.operators.multimodal import extract_meta, fake_payload
from de4ml_spark.session import load_table


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    # a NULL-text doc has no payload to decode — filter on both
    # engines (round-14 nulldocs sweep: the Arrow extract UDF crashed
    # iterating a None payload)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return extract_meta(fake_payload(docs))


MULTIMODAL_META_SQL = """
SELECT doc_id,
       4 + octet_length(encode(text)) AS byte_len,
       'IMG0' AS magic,
       CAST((4 + octet_length(encode(text))) % 640 AS INT) AS width,
       CAST((4 + octet_length(encode(text))) % 480 AS INT) AS height
FROM documents
WHERE text IS NOT NULL
"""


REGISTRY: dict[str, dict] = {
    "multimodal_meta": {"fn": multimodal_meta, "sql": MULTIMODAL_META_SQL},
}
