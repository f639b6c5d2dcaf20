"""Similarity-search queries over ``embeddings`` (extension tier): exact
brute-force cosine top-k, LSH-bucketed approximate top-k (both fully
oracle-gated — the LSH hyperplanes are Python-deterministic ±1 literals that
inline identically into the DuckDB twin), IVF centroid-probing (rows-only:
k-means is iterative), RRF fusion, and per-dimension stats. Recall is gated
in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de4ml_spark.operators.similarity import topk_bruteforce, topk_lsh
from de4ml_spark.session import load_table

K = 5
N_QUERIES = 10


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return topk_bruteforce(queries, emb, k=K).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


KNN_BRUTEFORCE_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         ROUND(list_dot_product(qe, e)
               / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e))),
               6) AS cos_sim
  FROM q JOIN v ON q.query_id <> v.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {K}
"""


LSH_BITS = 6


def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return topk_lsh(queries, emb, k=K, bits=LSH_BITS).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


def knn_lsh_oracle_sql(
    k: int = K, bits: int = LSH_BITS, n_queries: int = N_QUERIES, dim: int = 64
) -> str:
    """DuckDB twin of ``topk_lsh``: the ±1 hyperplane coefficients come from
    plain-Python md5 parity (similarity.plane_coeffs), so the exact same
    literals inline here — identical sign bits, buckets, candidate sets, and
    exact-cosine rescoring on both engines (±1.0 multiplies are exact)."""
    from de4ml_spark.operators.similarity import plane_coeffs

    projs = ",\n         ".join(
        "list_dot_product(e, CAST(["
        + ", ".join(repr(c) for c in plane_coeffs(p, dim))
        + f"] AS DOUBLE[])) AS p{p}"
        for p in range(bits)
    )
    bucket = " + ".join(
        f"(CASE WHEN p{p} > 0 THEN {1 << p} ELSE 0 END)" for p in range(bits)
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
prj AS (
  SELECT vec_id, e,
         {projs}
  FROM v
),
b AS (SELECT vec_id, e, {bucket} AS bucket FROM prj),
q AS (SELECT vec_id AS query_id, e AS qe, bucket FROM b
      WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         ROUND(list_dot_product(qe, c.e)
               / (sqrt(list_dot_product(qe, qe))
                  * sqrt(list_dot_product(c.e, c.e))), 6) AS cos_sim
  FROM q JOIN b c ON q.bucket = c.bucket AND q.query_id <> c.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {k}
"""


def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.ivf import fit_centroids, topk_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    cents = fit_centroids(emb, k_cells=16, sample_n=2000)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return topk_ivf(queries, emb, cents, k=K, nprobe=4).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/std across the corpus — the fit step of vector
    standardization (normalize-then-index pipelines). posexplode keeps the
    dimension index; one shuffle on the (64-value) dim key with map-side
    partial aggregation."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "v"
        )
    )
    return (
        ex.groupBy((F.col("pos") + 1).alias("dim"))
        .agg(
            F.round(F.avg("v"), 6).alias("mean"),
            F.round(F.stddev_samp("v"), 6).alias("std"),
            F.count(F.lit(1)).alias("n"),
        )
    )


EMBEDDING_DIM_STATS_SQL = """
SELECT i AS dim,
       ROUND(AVG(embedding[i]), 6) AS mean,
       ROUND(STDDEV_SAMP(embedding[i]), 6) AS std,
       COUNT(*) AS n
FROM embeddings, generate_series(1, 64) AS s(i)
GROUP BY i
"""


# --------------------------------------------------------------------------
# Reciprocal-rank fusion (RRF): combine two retrieval rankings (cosine and
# raw inner product here; in production typically dense + BM25) with
# score = sum 1/(60 + rank). The standard hybrid-retrieval merge — rank
# computation per scorer, one join on (query, neighbor), re-rank.
# --------------------------------------------------------------------------

RRF_K = 60


def knn_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from de4ml_spark.operators.similarity import dot_sql, norm_sql

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qe"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("ce"),
    ).withColumn("cn", F.expr(norm_sql("ce", 64)))
    scored = (
        F.broadcast(q.withColumn("qn", F.expr(norm_sql("qe", 64))))
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.expr(dot_sql("qe", "ce", 64)) / (F.col("qn") * F.col("cn")), 6
            ).alias("cos_sim"),
            F.round(F.expr(dot_sql("qe", "ce", 64)), 6).alias("ip"),
        )
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    w_ip = Window.partitionBy("query_id").orderBy(
        F.desc("ip"), F.asc("neighbor_id")
    )
    fused = (
        scored.withColumn("r_cos", F.row_number().over(w_cos))
        .withColumn("r_ip", F.row_number().over(w_ip))
        .withColumn(
            "rrf",
            F.round(
                1.0 / (RRF_K + F.col("r_cos")) + 1.0 / (RRF_K + F.col("r_ip")),
                9,
            ),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.desc("rrf"), F.asc("neighbor_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w_f))
        .filter(F.col("rank") <= K)
        .select("query_id", "neighbor_id", "rrf", "rank")
    )


KNN_RRF_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         ROUND(list_dot_product(qe, e)
               / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e))),
               6) AS cos_sim,
         ROUND(list_dot_product(qe, e), 6) AS ip
  FROM q JOIN v ON q.query_id <> v.vec_id
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS r_cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ip DESC, neighbor_id ASC) AS r_ip
  FROM scored
),
fused AS (
  SELECT query_id, neighbor_id,
         ROUND(1.0 / ({RRF_K} + r_cos) + 1.0 / ({RRF_K} + r_ip), 9) AS rrf
  FROM ranked
)
SELECT query_id, neighbor_id, rrf,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY rrf DESC, neighbor_id ASC) AS rank
FROM fused
QUALIFY rank <= {K}
"""


REGISTRY: dict[str, dict] = {
    "knn_bruteforce": {"fn": knn_bruteforce, "sql": KNN_BRUTEFORCE_SQL},
    "knn_rrf_fusion": {"fn": knn_rrf_fusion, "sql": KNN_RRF_SQL},
    "knn_lsh": {"fn": knn_lsh, "sql": knn_lsh_oracle_sql()},
    # k-means is genuinely iterative (Lloyd refinement on a driver-side
    # sample) — not SQL-expressible; gate = rows-only + recall tests.
    "knn_ivf": {"fn": knn_ivf, "sql": None},
    "embedding_dim_stats": {
        "fn": embedding_dim_stats,
        "sql": EMBEDDING_DIM_STATS_SQL,
    },
}
