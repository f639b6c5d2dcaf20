"""IVF (inverted-file) approximate nearest neighbor: coarse k-means
quantizer + probe-nearest-cells search — the centroid-probing counterpart to
the hyperplane LSH in similarity.py.

Scale design: the quantizer is fit driver-side on a bounded deterministic
sample (sampling a model ≪ data is the standard IVF recipe); centroids ship
to executors as literal expressions (a few KB — no broadcast join needed).
Corpus assignment is one scan; the probe join is an equi-join on cell id
(queries replicated nprobe times, corpus never replicated), cutting scored
candidates to ~nprobe/k_cells of the corpus before exact cosine rescoring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from de4ml_spark.operators.similarity import cosine, dot


def fit_centroids(
    df: DataFrame,
    k_cells: int = 16,
    sample_n: int = 2000,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd's k-means on a bounded sample (first ``sample_n``
    ids): init = first k distinct sample vectors. Returns plain Python lists
    so centroids embed as literals in the plan."""
    import numpy as np

    sample = (
        df.orderBy(id_col)
        .limit(sample_n)
        .select(vec_col)
        .collect()
    )
    x = np.array([r[0] for r in sample], dtype=np.float64)
    cents = x[:k_cells].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k_cells):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [[float(v) for v in c] for c in cents]


def _centroid_lits(centroids: list[list[float]]) -> list[Column]:
    return [F.array(*[F.lit(v) for v in c]) for c in centroids]


def _nearest_cells(vec: Column, centroids: list[list[float]], n: int) -> Column:
    """Array of the n nearest cell ids by squared L2 (ascending, id tiebreak)."""
    cells = F.array(
        *[
            F.struct(
                dot(
                    F.zip_with(vec, lit_c, lambda a, b: a - b),
                    F.zip_with(vec, lit_c, lambda a, b: a - b),
                ).alias("d2"),
                F.lit(i).alias("cell"),
            )
            for i, lit_c in enumerate(_centroid_lits(centroids))
        ]
    )
    return F.slice(F.array_sort(cells), 1, n).getField("cell")


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    e = F.transform(vec_col, lambda x: x.cast("double"))
    return df.select(
        F.col(id_col),
        e.alias("e"),
        _nearest_cells(e, centroids, 1).getItem(0).alias("cell"),
    )


def topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the query's ``nprobe`` nearest cells, exact
    cosine rescore within them. Output: query_id, neighbor_id, cos_sim, rank."""
    c = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("e").alias("ce"), "cell"
    )
    qe = F.transform(vec_col, lambda x: x.cast("double"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        qe.alias("qe"),
        F.explode(_nearest_cells(qe, centroids, nprobe)).alias("cell"),
    )
    scored = (
        F.broadcast(q)
        .join(c, ["cell"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
