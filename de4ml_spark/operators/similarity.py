"""Similarity search over embedding columns: exact brute-force top-k and an
LSH-bucketed approximate variant for scale.

Scale design: brute-force top-k is a broadcast of the (small) query set
against a full corpus scan — one pass, no shuffle except the final per-query
top-k (row_number over query partition). The LSH variant buckets the corpus
once (single scan; signatures from deterministic hash-derived hyperplanes —
no stored model needed) and joins queries to their bucket, cutting the
scored candidates by ~2^bits; exact cosine rescoring keeps ranking quality.
An IVF variant (operators/ivf.py) covers the centroid-probing family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential fold — deterministic summation order, engine-reproducible."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _as_double(df: DataFrame, vec_col: str) -> Column:
    return F.transform(vec_col, lambda x: x.cast("double"))


def topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).
    Similarity rounded to 6 decimals before ranking with id tiebreak —
    deterministic across engines and partitionings."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(queries, vec_col).alias("qe")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(corpus, vec_col).alias("ce")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def random_hyperplane_buckets(
    df: DataFrame,
    bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-LSH bucket id per vector. Hyperplane p's coefficient for
    dimension d is derived from xxhash64(p, d) mapped to ±1 — deterministic,
    no stored model, identical across executors."""
    e = _as_double(df, vec_col)
    planes = []
    for p in range(bits):
        coef = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d, p=p: F.when(
                F.xxhash64(F.lit(p), d) % 2 == 0, F.lit(1.0)
            ).otherwise(F.lit(-1.0)),
        )
        proj = dot(e, coef)
        planes.append(
            F.when(proj > 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0))
        )
    bucket = planes[0]
    for pl in planes[1:]:
        bucket = bucket.bitwiseOR(pl)
    return df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket; exact
    cosine rescoring within the bucket. Recall measured in tests against
    topk_bruteforce."""
    qb = random_hyperplane_buckets(queries, bits, dim, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("qe"),
        F.col("bucket"),
    )
    cb = random_hyperplane_buckets(corpus, bits, dim, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("ce"),
        F.col("bucket"),
    )
    scored = (
        F.broadcast(qb)
        .join(cb, (qb["bucket"] == cb["bucket"]) & (F.col("query_id") != F.col("neighbor_id")))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
