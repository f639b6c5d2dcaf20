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
    if not sample:
        return []  # empty corpus: no model; topk_ivf returns empty
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


MICRO = 1_000_000  # integer grid scale for the engine-exact quantizer
_OFF = 2 * MICRO  # shift making per-dim sums non-negative (|x| <= 2.0)


def fit_centroids_exact(
    df: DataFrame,
    k_cells: int = 16,
    sample_n: int = 2000,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]]:
    """Lloyd's k-means on the INTEGER MICRO-GRID — every operation is
    exact integer arithmetic, so the fit is bit-reproducible in plain
    Python, numpy int64, Spark SQL, and DuckDB SQL (the unrolled-iteration
    oracle in queries/simq.py replays it):

    - inputs quantize as floor(x * 1e6 + 0.5) (identical IEEE ops
      everywhere; float32 widens to double exactly),
    - assignment = argmin of integer squared L2 (ties -> lowest cell id),
    - centroid update = per-dim round-half-up integer mean, computed in
      the +2e6-shifted non-negative domain so floor-division rounding is
      engine-agnostic; empty cells keep their previous centroid.

    Bounds: |x|<=2 -> d2 <= 64*(4e6)^2 ~ 1e15 and shifted dim sums
    <= n*4e6 — all far inside int64."""
    import numpy as np

    sample = df.orderBy(id_col).limit(sample_n).select(vec_col).collect()
    if not sample:
        return []  # empty corpus: no model; topk_ivf returns empty
    x = np.array(
        [[int(v) for v in np.floor(np.array(r[0], dtype=np.float64) * MICRO + 0.5)]
         for r in sample],
        dtype=np.int64,
    )
    cents = x[:k_cells].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # first occurrence wins = lowest cell id
        for c in range(k_cells):
            members = x[assign == c]
            if len(members):
                n = np.int64(len(members))
                ssum = members.sum(axis=0) + n * _OFF
                cents[c] = (2 * ssum + n) // (2 * n) - _OFF
    return [[int(v) for v in c] for c in cents]


def _sq_l2_sql(vec: str, cent: list, lit: str = "D") -> str:
    """SQL text of the unrolled Σ_d (vec[d] - c_d)² with centroid coords as
    double (``lit="D"``) or bigint (``lit="L"``) literals. Emitted as ONE
    string/F.expr call — building it from PySpark Column operators would
    cost dim*2 Py4J round trips per centroid at plan-build time (measured
    tens of seconds for 16x64 plans)."""
    return "(" + " + ".join(
        f"({vec}[{d}] - {v!r}{lit}) * ({vec}[{d}] - {v!r}{lit})"
        for d, v in enumerate(cent)
    ) + ")"


def _with_nearest_cells(
    df: DataFrame,
    vec: str,
    centroids: list,
    n: int,
    out: str,
    lit: str = "D",
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
            F.expr(_sq_l2_sql(vec, cent, lit)).alias(f"__d2_{i}")
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


def _int_grid(col: str):
    """floor(x*1e6 + 0.5) per element — the exact micro-grid quantization
    (identical IEEE double ops in Spark, DuckDB, and numpy)."""
    return F.transform(
        col,
        lambda x: F.floor(x.cast("double") * MICRO + F.lit(0.5)).cast("bigint"),
    )


def ivf_assign(
    df: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    integer_grid: bool = False,
) -> DataFrame:
    e = df.select(
        F.col(id_col),
        F.transform(vec_col, lambda x: x.cast("double")).alias("e"),
        *([_int_grid(vec_col).alias("ei")] if integer_grid else []),
    )
    assign_vec, lit = ("ei", "L") if integer_grid else ("e", "D")
    return _with_nearest_cells(e, assign_vec, centroids, 1, "__cells", lit).select(
        F.col(id_col), F.col("e"), F.expr("element_at(__cells, 1)").alias("cell")
    )


def topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    integer_grid: bool = False,
) -> DataFrame:
    """Approximate top-k: probe the query's ``nprobe`` nearest cells, exact
    cosine rescore within them. Output: query_id, neighbor_id, cos_sim, rank."""
    dim = len(centroids[0]) if centroids else 0
    if not centroids:
        # no model (empty training corpus): the probe set has no cells to
        # search — the correct result is empty, not a malformed plan.
        # query_id types from the QUERIES frame and neighbor_id from the
        # corpus, exactly as the non-empty join path below types them.
        qt = queries.schema[id_col].dataType.simpleString()
        idt = corpus.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [],
            f"query_id {qt}, neighbor_id {idt}, cos_sim DOUBLE, rank INT",
        )
    # Materialize the assigned corpus: this IS the IVF index (in production
    # it would be written out partitioned/bucketed by cell). Persisting also
    # stops Catalyst from inlining the k_cells*dim assignment expression
    # into both the join's null-filter and the projection (CollapseProject +
    # predicate pushdown re-fuse split columns), which made the giant
    # expression evaluate twice per row in interpreted (non-codegen) stages.
    c = (
        ivf_assign(corpus, centroids, id_col, vec_col, integer_grid)
        .select(
            F.col(id_col).alias("neighbor_id"), F.col("e").alias("ce"), "cell"
        )
        .withColumn("cn", F.expr(norm_sql("ce", dim)))
        .persist()
    )
    qbase = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("qe"),
        *([_int_grid(vec_col).alias("qi")] if integer_grid else []),
    )
    qvec, qlit = ("qi", "L") if integer_grid else ("qe", "D")
    q = (
        _with_nearest_cells(qbase, qvec, centroids, nprobe, "__cells", qlit)
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
