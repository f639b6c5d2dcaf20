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

from de4ml_spark.cache import release_after
from de4ml_spark.operators.similarity import dot_sql, norm_sql


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


def _sq_l2_sql(vec: str, cent: list[float]) -> str:
    """SQL text of the unrolled Σ_d (vec[d] - c_d)² with centroid coords as
    double literals. Emitted as ONE string/F.expr call — building it from
    PySpark Column operators would cost dim*2 Py4J round trips per centroid
    at plan-build time (measured tens of seconds for 16x64 plans)."""
    return "(" + " + ".join(
        f"({vec}[{d}] - {v!r}D) * ({vec}[{d}] - {v!r}D)" for d, v in enumerate(cent)
    ) + ")"


def _with_nearest_cells(
    df: DataFrame, vec: str, centroids: list[list[float]], n: int, out: str
) -> DataFrame:
    """Adds ``out`` = array of the n nearest cell ids by squared L2
    (ascending, id tiebreak — array_sort on (d2, cell) structs orders by d2
    then cell).

    Two projections on purpose: the per-centroid d2 sums land in SEPARATE
    columns first, then a tiny sort-slice combines them. One fused
    expression (k_cells * dim * 2 nodes) exceeds the JVM's 64 KB method
    limit, which aborts whole-stage codegen for the stage and drops every
    row into interpreted expression evaluation — measured ~10x slower.
    Separate columns split into separate codegen methods."""
    with_d2 = df.select(
        "*",
        *[
            F.expr(_sq_l2_sql(vec, cent)).alias(f"__d2_{i}")
            for i, cent in enumerate(centroids)
        ],
    )
    structs = ", ".join(
        f"named_struct('d2', __d2_{i}, 'cell', {i})"
        for i in range(len(centroids))
    )
    return with_d2.select(
        *df.columns,
        F.expr(f"slice(array_sort(array({structs})), 1, {n}).cell").alias(out),
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    e = df.select(
        F.col(id_col),
        F.transform(vec_col, lambda x: x.cast("double")).alias("e"),
    )
    return _with_nearest_cells(e, "e", centroids, 1, "__cells").select(
        F.col(id_col), F.col("e"), F.expr("element_at(__cells, 1)").alias("cell")
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
    dim = len(centroids[0]) if centroids else 0
    # Materialize the assigned corpus: this IS the IVF index (in production
    # it would be written out partitioned/bucketed by cell). Persisting also
    # stops Catalyst from inlining the k_cells*dim assignment expression
    # into both the join's null-filter and the projection (CollapseProject +
    # predicate pushdown re-fuse split columns), which made the giant
    # expression evaluate twice per row in interpreted (non-codegen) stages.
    c = (
        ivf_assign(corpus, centroids, id_col, vec_col)
        .select(
            F.col(id_col).alias("neighbor_id"), F.col("e").alias("ce"), "cell"
        )
        .withColumn("cn", F.expr(norm_sql("ce", dim)))
        .persist()
    )
    qbase = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("qe"),
    )
    q = (
        _with_nearest_cells(qbase, "qe", centroids, nprobe, "__cells")
        .select(
            "query_id", "qe", F.expr("explode(__cells)").alias("cell")
        )
        .withColumn("qn", F.expr(norm_sql("qe", dim)))
    )
    scored = (
        F.broadcast(q)
        .join(c, ["cell"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.expr(dot_sql("qe", "ce", dim)) / (F.col("qn") * F.col("cn")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    result = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    return release_after(result, c)
