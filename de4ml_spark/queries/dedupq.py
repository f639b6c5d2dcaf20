"""Deduplication queries over ``documents`` / ``embeddings`` (extension tier):
exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

MinHash and SimHash signatures are built on Spark's xxhash64, which DuckDB
cannot reproduce — those two are registered without an oracle (rows-only
check); their correctness gate is tests/test_dedup.py, which asserts the LSH
candidate sets recover the exact-Jaccard / exact-Hamming pair sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de4ml_spark.operators.dedup import (
    embedding_neardup_blocked,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from de4ml_spark.session import load_table


def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs)


DEDUP_EXACT_SQL = r"""
SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
       MIN(doc_id) AS doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.8, n=3).select(
        "id_a", "id_b", "inter", "n_a", "n_b", F.round("jaccard", 6).alias("jaccard_r")
    )


DEDUP_NGRAM_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(toks) - 2),
                       i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t WHERE len(toks) >= 3
),
e AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
c AS (SELECT doc_id, len(sh) AS n FROM s),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.id_a, p.id_b, p.inter, c1.n AS n_a, c2.n AS n_b,
       ROUND(p.inter * 1.0 / (c1.n + c2.n - p.inter), 6) AS jaccard_r
FROM p
JOIN c c1 ON p.id_a = c1.doc_id
JOIN c c2 ON p.id_b = c2.doc_id
WHERE p.inter * 1.0 / (c1.n + c2.n - p.inter) >= 0.8
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # 24 hashes / 12 bands (r=2): P(candidate | j=0.8) = 1-(1-0.64)^12
    # ≈ 1 - 5e-6 — recall indistinguishable from 32/16 (pair sets verified
    # identical at sf0.01 and sf0.1) at ~25% less signature work.
    return minhash_lsh_pairs(docs, threshold=0.8, num_hashes=24, bands=12).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard_r")
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, max_hamming=3)


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.45)


DEDUP_EMBEDDING_SQL = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e))
                * sqrt(list_dot_product(b.e, b.e))), 6) AS cos_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.e, b.e)
            / (sqrt(list_dot_product(a.e, a.e))
               * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.45
"""


def dedup_embedding_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-BLAS exact pair scoring (the 100 TB path for the same
    operator as dedup_embedding_cosine). The oracle compares the PAIR SET
    only: BLAS summation order can shift raw cosines by ~1 ulp, so the
    rounded similarity is not guaranteed bit-identical, but threshold
    membership is (no testdata pair sits within 1e-9 of the threshold)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_blocked(emb, threshold=0.45).select("id_a", "id_b")


DEDUP_EMBEDDING_BLOCKED_SQL = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.e, b.e)
            / (sqrt(list_dot_product(a.e, a.e))
               * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.45
"""


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignment over the exact n-gram near-dup graph (Jaccard >=
    0.8): every document labeled with the min doc_id reachable through near-
    dup pairs (singletons label themselves) — the survivor-selection step of
    a dedup pipeline. Iterative min-label propagation; oracle = recursive
    CTE transitive closure."""
    from de4ml_spark.operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, n=3).select("id_a", "id_b")
    return connected_components(pairs, docs, id_col="doc_id")


DEDUP_COMPONENTS_SQL = """
WITH RECURSIVE
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(toks) - 2),
                       i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t WHERE len(toks) >= 3
),
e AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
c AS (SELECT doc_id, len(sh) AS n FROM s),
p AS (
  SELECT q.id_a, q.id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
    FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ) q
  JOIN c c1 ON q.id_a = c1.doc_id
  JOIN c c2 ON q.id_b = c2.doc_id
  WHERE q.inter * 1.0 / (c1.n + c2.n - q.inter) >= 0.8
),
edges AS (SELECT id_a AS a, id_b AS b FROM p
          UNION SELECT id_b, id_a FROM p),
reach(n, m) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.n, e2.b FROM reach r JOIN edges e2 ON r.m = e2.a
)
SELECT d.doc_id,
       LEAST(d.doc_id, COALESCE(MIN(r.m), d.doc_id)) AS component
FROM documents d
LEFT JOIN reach r ON d.doc_id = r.n
GROUP BY d.doc_id
"""


REGISTRY: dict[str, dict] = {
    "dedup_exact_docs": {"fn": dedup_exact_docs, "sql": DEDUP_EXACT_SQL},
    "dedup_components": {"fn": dedup_components, "sql": DEDUP_COMPONENTS_SQL},
    "dedup_ngram_jaccard": {"fn": dedup_ngram_jaccard, "sql": DEDUP_NGRAM_SQL},
    "dedup_minhash_lsh": {"fn": dedup_minhash_lsh, "sql": None},
    "dedup_simhash": {"fn": dedup_simhash, "sql": None},
    "dedup_embedding_cosine": {
        "fn": dedup_embedding_cosine,
        "sql": DEDUP_EMBEDDING_SQL,
    },
    "dedup_embedding_blocked": {
        "fn": dedup_embedding_blocked,
        "sql": DEDUP_EMBEDDING_BLOCKED_SQL,
    },
}
