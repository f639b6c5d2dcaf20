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
from de4ml_spark.operators.portable_hash import wide_to_double_sql as _w2d

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


IVF_CELLS = 16
IVF_SAMPLE = 2000
IVF_ITERS = 5
IVF_NPROBE = 4


def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with the INTEGER-GRID exact quantizer: the k-means fit is
    pure integer arithmetic (operators/ivf.py: fit_centroids_exact), so
    the DuckDB oracle replays the SAME Lloyd iterations bit-for-bit as
    unrolled SQL — upgrading this entry from rows-only to a full
    value-hash oracle. Assignment/probe compare integer squared-L2 with
    lowest-cell tiebreaks; the final rescore is the exact cosine the
    other knn entries use."""
    from de4ml_spark.operators.ivf import fit_centroids_exact, topk_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    cents = fit_centroids_exact(
        emb, k_cells=IVF_CELLS, sample_n=IVF_SAMPLE, iters=IVF_ITERS
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return topk_ivf(
        queries, emb, cents, k=K, nprobe=IVF_NPROBE, integer_grid=True
    ).select("query_id", "neighbor_id", "cos_sim", "rank")


def knn_ivf_oracle_sql(
    k: int = K,
    k_cells: int = IVF_CELLS,
    sample_n: int = IVF_SAMPLE,
    iters: int = IVF_ITERS,
    nprobe: int = IVF_NPROBE,
    dim: int = 64,
    n_queries: int = N_QUERIES,
) -> str:
    """DuckDB replay of the integer-grid IVF: quantize -> ``iters``
    unrolled Lloyd iterations (integer d2 assignment with lowest-cell
    tiebreak; round-half-up integer means in the shifted non-negative
    domain; empty cells carry the previous centroid) -> corpus assign ->
    probe -> exact cosine rescore. Every intermediate is integer, so this
    is bit-identical to fit_centroids_exact's numpy int64 computation."""
    from de4ml_spark.operators.ivf import _OFF

    def d2(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
        )

    qint = (
        "list_transform(embedding, x -> "
        "CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"
    )
    ctes = [
        f"""s AS (
  SELECT vec_id, {qint} AS e
  FROM embeddings ORDER BY vec_id LIMIT {sample_n}
)""",
        f"""c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, e
  FROM (SELECT * FROM s ORDER BY vec_id LIMIT {k_cells})
)""",
    ]
    for t in range(1, iters + 1):
        prev = f"c{t - 1}"
        ctes.append(f"""a{t} AS (
  SELECT vec_id, e, cell FROM (
    SELECT s.vec_id, s.e, c.cell,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id
             ORDER BY {d2('s.e', 'c.e')}, c.cell) AS rn
    FROM s, {prev} c
  ) WHERE rn = 1
)""")
        ctes.append(f"""c{t} AS (
  SELECT p.cell, COALESCE(n.e, p.e) AS e
  FROM {prev} p LEFT JOIN (
    SELECT cell, list(val ORDER BY dim) AS e FROM (
      SELECT a.cell, u.i AS dim,
             CAST((2 * (SUM(a.e[u.i]) + COUNT(*) * {_OFF}) + COUNT(*))
                  // (2 * COUNT(*)) - {_OFF} AS BIGINT) AS val
      FROM a{t} a, generate_series(1, {dim}) AS u(i)
      GROUP BY a.cell, u.i
    ) GROUP BY cell
  ) n ON p.cell = n.cell
)""")
    final = f"c{iters}"
    ctes.append(f"""v AS (
  SELECT vec_id, embedding::DOUBLE[] AS ed, {qint} AS ei FROM embeddings
)""")
    ctes.append(f"""cass AS (
  SELECT vec_id, ed, cell FROM (
    SELECT v.vec_id, v.ed, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {d2('v.ei', 'c.e')}, c.cell) AS rn
    FROM v, {final} c
  ) WHERE rn = 1
)""")
    ctes.append(f"""qprobe AS (
  SELECT query_id, qd, cell FROM (
    SELECT v.vec_id AS query_id, v.ed AS qd, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {d2('v.ei', 'c.e')}, c.cell) AS rn
    FROM v, {final} c WHERE v.vec_id < {n_queries}
  ) WHERE rn <= {nprobe}
)""")
    ctes.append("""scored AS (
  SELECT q.query_id, t.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.qd, t.ed)
               / (sqrt(list_dot_product(q.qd, q.qd))
                  * sqrt(list_dot_product(t.ed, t.ed))), 6) AS cos_sim
  FROM qprobe q JOIN cass t
    ON q.cell = t.cell AND q.query_id <> t.vec_id
)""")
    ctes.append("""ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT query_id, neighbor_id, cos_sim, rank FROM ranked"
        + f" WHERE rank <= {k}\n"
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
    # round 4: the integer-grid exact quantizer makes the Lloyd fit
    # bit-replayable as unrolled SQL — full value-hash oracle.
    "knn_ivf": {"fn": knn_ivf, "sql": knn_ivf_oracle_sql()},
    "embedding_dim_stats": {
        "fn": embedding_dim_stats,
        "sql": EMBEDDING_DIM_STATS_SQL,
    },
}


# --------------------------------------------------------------------------
# Label-centroid distance matrix: per-label mean embedding and the
# pairwise Euclidean distances between class centroids — the class-
# separation audit run before training on labeled embeddings (collapsed
# or overlapping centroids flag label noise / leakage). Exactness: each
# float32 component quantizes to integer micro-units FIRST (floor(v*1e6
# + 0.5) — float32 -> double is exact, floor is exact, so the integer is
# engine-identical even for negative components), per-(label, dim) sums
# and centroid components stay integers, squared-difference sums stay
# integers, and the final distance is ONE exact integer -> double cast +
# IEEE-correctly-rounded sqrt and division — bit-identical across
# engines, unlike a double AVG whose summation order differs.
# Scale: posexplode to (label, dim) integer sums (map-side combined,
# |labels| x 64 output rows); the pairwise join runs over that bounded
# centroid frame, never over rows.
# --------------------------------------------------------------------------


def label_centroid_distances(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("dim", "v"),
    ).selectExpr(
        "label",
        "dim",
        "CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS v_micro",
    )
    cent = ex.groupBy("label", "dim").agg(
        F.expr("CAST(SUM(v_micro) AS BIGINT)").alias("s_micro"),
        F.count(F.lit(1)).alias("n"),
    ).selectExpr(
        "label",
        "dim",
        "n",
        # centroid component in micro-units, half-up integer division
        "CAST((s_micro * 2 + n) DIV (2 * n) AS BIGINT) AS c_micro",
    )
    a = cent.selectExpr(
        "label AS label_a", "dim", "c_micro AS ca", "n AS n_a"
    )
    b = cent.selectExpr(
        "label AS label_b", "dim", "c_micro AS cb", "n AS n_b"
    )
    pairs = (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b", "n_a", "n_b")
        .agg(
            F.expr(
                "CAST(SUM((ca - cb) * (ca - cb)) AS BIGINT)"
            ).alias("sq_micro")
        )
    )
    return pairs.selectExpr(
        "label_a",
        "label_b",
        "CAST(n_a AS BIGINT) AS n_a",
        "CAST(n_b AS BIGINT) AS n_b",
        "sq_micro",
        "sqrt(CAST(sq_micro AS DOUBLE)) / 1000000.0 AS dist_r",
    )


def _label_centroid_sql() -> str:
    return """
WITH ex AS (
  SELECT label, s.i AS dim,
         CAST(floor(CAST(embedding[s.i] AS DOUBLE) * 1000000.0 + 0.5)
              AS BIGINT) AS v_micro
  FROM embeddings, generate_series(1, 64) AS s(i)
),
cent AS (
  SELECT label, dim,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST((CAST(SUM(v_micro) AS BIGINT) * 2 + COUNT(*))
              // (2 * COUNT(*)) AS BIGINT) AS c_micro
  FROM ex GROUP BY 1, 2
)
SELECT a.label AS label_a, b.label AS label_b,
       a.n AS n_a, b.n AS n_b,
       CAST(SUM((a.c_micro - b.c_micro) * (a.c_micro - b.c_micro))
            AS BIGINT) AS sq_micro,
       sqrt(CAST(CAST(SUM((a.c_micro - b.c_micro)
                          * (a.c_micro - b.c_micro)) AS BIGINT)
                 AS DOUBLE)) / 1000000.0 AS dist_r
FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
GROUP BY 1, 2, 3, 4
"""


REGISTRY["label_centroid_distances"] = {
    "fn": label_centroid_distances,
    "sql": _label_centroid_sql(),
}


# --------------------------------------------------------------------------
# Embedding covariance moments (upper triangle) — the whitening /
# PCA-prep statistic: for every dimension pair (j <= k), the exact
# moment sums over micro-quantized components, and the sample
# covariance as an engine-identical double of those exact integers.
# Quantize-then-sum is the exactness move (same as label centroids):
# float32 components convert exactly to double, one correctly-rounded
# multiply + exact floor lands them on the integer micro grid, and
# every aggregate after that is addition-order-independent. Scale:
# the (j, k) pair fan-out multiplies each VECTOR by d(d+1)/2 — at
# 100 TB you'd swap the explode+self-join for a mapInPandas BLAS
# accumulation per partition and SUM the per-partition moment
# matrices (the operators/similarity.py fold pattern); this entry
# keeps the declarative shape the oracle can state, with the moments
# contract identical either way.
# --------------------------------------------------------------------------


def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("dim", "v"),
    ).selectExpr(
        "vec_id",
        "dim",
        "CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS v_micro",
    )
    a = ex.selectExpr("vec_id", "dim AS j", "v_micro AS xj")
    b = ex.selectExpr("vec_id", "dim AS k", "v_micro AS xk")
    pairs = a.join(b, "vec_id").filter("j <= k")
    m = pairs.groupBy("j", "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xj").cast("bigint").alias("sj"),
        F.sum("xk").cast("bigint").alias("sk"),
        F.sum(
            F.expr("CAST(xj AS DECIMAL(38,0)) * xk")
        ).alias("_sjk"),
    )
    return m.selectExpr(
        "CAST(j AS BIGINT) AS j",
        "CAST(k AS BIGINT) AS k",
        "n",
        "sj",
        "sk",
        _w2d("_sjk", "DIV") + " AS sjk_d",
        # sample covariance in micro^2 units: (n*Sjk - Sj*Sk)/(n*(n-1))
        "CASE WHEN n <= 1 THEN NULL ELSE "
        + _w2d(
            "CAST(n AS DECIMAL(38,0)) * _sjk"
            " - CAST(sj AS DECIMAL(38,0)) * sk", "DIV"
        )
        + " / CAST(CAST(n AS BIGINT) * (n - 1) AS DOUBLE)"
        " / 1000000000000.0 END AS cov_r",
    )


EMB_COV_SQL = """
WITH ex AS (
  SELECT vec_id, gs.i - 1 AS dim,
         CAST(floor(CAST(embedding[gs.i] AS DOUBLE) * 1000000.0 + 0.5)
              AS BIGINT) AS v_micro
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)
         gs
),
pairs AS (
  SELECT a.vec_id, a.dim AS j, b.dim AS k,
         a.v_micro AS xj, b.v_micro AS xk
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.dim <= b.dim
),
m AS (
  SELECT j, k,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xj) AS BIGINT) AS sj,
         CAST(SUM(xk) AS BIGINT) AS sk,
         SUM(CAST(xj AS HUGEINT) * xk) AS sjk
  FROM pairs GROUP BY 1, 2
)
SELECT CAST(j AS BIGINT) AS j, CAST(k AS BIGINT) AS k, n, sj, sk,
       {COV_SJK} AS sjk_d,
       CASE WHEN n <= 1 THEN NULL ELSE
       {COV_NUM}
       / CAST(CAST(n AS BIGINT) * (n - 1) AS DOUBLE)
       / 1000000000000.0 END AS cov_r
FROM m
"""

REGISTRY["embedding_covariance"] = {
    "fn": embedding_covariance,
    "sql": EMB_COV_SQL.replace("{COV_SJK}", _w2d("sjk", "//")).replace(
        "{COV_NUM}",
        _w2d("CAST(n AS HUGEINT) * sjk - CAST(sj AS HUGEINT) * sk", "//"),
    ),
}


# --------------------------------------------------------------------------
# Grid-density clustering of the embedding cloud (DBSCAN-lite): project
# to the first two dimensions, land points on an integer micro-grid
# (cell = component DIV GRID_H — truncation toward zero is identical in
# Spark DIV and DuckDB //), call a cell CORE when it holds >= GRID_MINPTS
# points, and let clusters be connected components of core cells under
# 8-neighbour adjacency; points in non-core cells are NOISE. This is
# the density-clustering shape that actually scales: candidate
# adjacency is an equi-join on cell keys after a map-side 8-offset
# explode (never a distance theta-join), and the component iteration
# runs on the CORE-CELL graph, whose size is bounded by the GRID AREA
# (value range / GRID_H squared — a constant), not by the corpus: the
# one graph in this repo where a driver-side union-find is the correct
# scale design (the same bounded-model-fit rule as IVF's k-means
# sample), with the cluster map broadcast back over the points. The
# fixpoint equals the transitive closure, so the oracle states it as a
# recursive CTE.
# --------------------------------------------------------------------------

GRID_H = 100_000
GRID_MINPTS = 5
_GRID_OFF = 1_000  # cell-coordinate offset so keys stay positive


def _cell_key(cx: str, cy: str) -> str:
    return f"(({cx}) + {_GRID_OFF}) * 100000 + (({cy}) + {_GRID_OFF})"


def grid_density_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.selectExpr(
        "vec_id",
        f"CAST(floor(CAST(embedding[0] AS DOUBLE) * 1000000.0 + 0.5)"
        f" AS BIGINT) DIV {GRID_H} AS cx",
        f"CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0 + 0.5)"
        f" AS BIGINT) DIV {GRID_H} AS cy",
    )
    cells = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n"))
    core = cells.filter(F.col("n") >= GRID_MINPTS).selectExpr(
        "cx", "cy", f"{_cell_key('cx', 'cy')} AS cell"
    )
    # grid-bounded model fit: the core-cell set is a constant-size
    # frame at any corpus scale, so collect it once and union-find on
    # the driver (8-neighbour adjacency in a dict lookup)
    core_cells = [
        (r["cx"], r["cy"], r["cell"]) for r in core.collect()
    ]
    parent = {c: c for _, _, c in core_cells}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_coord = {(cx, cy): c for cx, cy, c in core_cells}
    for cx, cy, c in core_cells:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nbr = by_coord.get((cx + dx, cy + dy))
                if nbr is not None and nbr != c:
                    ra, rb = find(c), find(nbr)
                    if ra != rb:
                        # union by MIN root so the label is the min
                        # cell key of the component (oracle parity)
                        lo, hi = min(ra, rb), max(ra, rb)
                        parent[hi] = lo
    mapping = [(c, find(c)) for _, _, c in core_cells]
    comp = spark.createDataFrame(
        mapping, "cell BIGINT, cluster BIGINT"
    )
    labeled = (
        pts.selectExpr(
            "vec_id", "cx", "cy", f"{_cell_key('cx', 'cy')} AS cell"
        )
        .join(F.broadcast(comp), "cell", "left")
    )
    return labeled.selectExpr(
        "vec_id",
        "CAST(cx AS BIGINT) AS cx",
        "CAST(cy AS BIGINT) AS cy",
        "CAST(cluster AS BIGINT) AS cluster",
        "cluster IS NOT NULL AS is_core",
    )


GRID_DENSITY_SQL = f"""
WITH RECURSIVE
pts AS (
  SELECT vec_id,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0 + 0.5)
              AS BIGINT) // {GRID_H} AS cx,
         CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000.0 + 0.5)
              AS BIGINT) // {GRID_H} AS cy
  FROM embeddings
),
cells AS (SELECT cx, cy, COUNT(*) AS n FROM pts GROUP BY 1, 2),
core AS (
  SELECT cx, cy, (cx + {_GRID_OFF}) * 100000 + (cy + {_GRID_OFF})
    AS cell
  FROM cells WHERE n >= {GRID_MINPTS}
),
pairs AS (
  SELECT a.cell AS id_a, b.cell AS id_b
  FROM core a JOIN core b
    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
   AND a.cell < b.cell
),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(n, m) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.n, e2.b FROM reach r JOIN edges e2 ON r.m = e2.a
),
comp AS (
  SELECT c.cell,
         LEAST(c.cell, COALESCE(MIN(r.m), c.cell)) AS cluster
  FROM core c
  LEFT JOIN reach r ON c.cell = r.n
  GROUP BY c.cell
)
SELECT p.vec_id,
       CAST(p.cx AS BIGINT) AS cx,
       CAST(p.cy AS BIGINT) AS cy,
       CAST(k.cluster AS BIGINT) AS cluster,
       k.cluster IS NOT NULL AS is_core
FROM pts p
LEFT JOIN comp k
  ON (p.cx + {_GRID_OFF}) * 100000 + (p.cy + {_GRID_OFF}) = k.cell
"""

REGISTRY["grid_density_clusters"] = {
    "fn": grid_density_clusters,
    "sql": GRID_DENSITY_SQL,
}


# --------------------------------------------------------------------------
# Cluster purity of the grid-density clustering against the embedding
# labels — the external-validity check that closes the clustering
# loop: per cluster, the majority label's share (exact half-up ppm,
# deterministic tie-break by label id) plus the corpus-level weighted
# purity. Noise points (NULL cluster) are reported as their own row
# with a NULL purity (they have no cluster to be pure about). Scale:
# one join of the point labels to their cluster assignment, two
# groupBys over the (cluster, label) frame.
# --------------------------------------------------------------------------


def cluster_purity_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label"
    )
    assign = grid_density_clusters(spark, sf_dir).select(
        "vec_id", "cluster"
    )
    j = emb.join(assign, "vec_id")
    by_cl = j.groupBy("cluster", "label").agg(
        F.count(F.lit(1)).alias("n")
    )
    # NULLS LAST explicitly: a NULL label (pre-migration embeddings
    # file, driftemb parity shape) must not win the majority tie over a
    # real label — Spark's ASC default is NULLS FIRST where DuckDB's is
    # NULLS LAST, the documented ROW_NUMBER-over-nullable-key
    # divergence class; both engines now share the NULLS LAST text.
    wmaj = Window.partitionBy("cluster").orderBy(
        F.desc("n"), F.col("label").asc_nulls_last()
    )
    per_cluster = (
        by_cl.withColumn("rk", F.row_number().over(wmaj))
        .groupBy("cluster")
        .agg(
            F.sum("n").cast("bigint").alias("n_points"),
            F.max(F.expr("CASE WHEN rk = 1 THEN label END")).alias(
                "majority_label"
            ),
            F.max(F.expr("CASE WHEN rk = 1 THEN n END"))
            .cast("bigint")
            .alias("n_majority"),
        )
    )
    return per_cluster.selectExpr(
        "cluster",
        "CAST(majority_label AS BIGINT) AS majority_label",
        "n_points",
        "n_majority",
        f"""CASE WHEN cluster IS NULL THEN NULL
            ELSE {exact_round_div_sql('n_majority', 'n_points', 'DIV')}
            END AS purity_r""",
    )


CLUSTER_PURITY_SQL_TEMPLATE = """
WITH assign AS ({GRID_SQL}),
j AS (
  SELECT e.vec_id, e.label, a.cluster
  FROM embeddings e JOIN assign a USING (vec_id)
),
by_cl AS (
  SELECT cluster, label, COUNT(*) AS n FROM j GROUP BY 1, 2
),
ranked AS (
  SELECT cluster, label, n,
         ROW_NUMBER() OVER (PARTITION BY cluster
                            ORDER BY n DESC, label NULLS LAST) AS rk
  FROM by_cl
),
per_cluster AS (
  SELECT cluster,
         CAST(SUM(n) AS BIGINT) AS n_points,
         MAX(CASE WHEN rk = 1 THEN label END) AS majority_label,
         CAST(MAX(CASE WHEN rk = 1 THEN n END) AS BIGINT) AS n_majority
  FROM ranked GROUP BY 1
)
SELECT cluster,
       CAST(majority_label AS BIGINT) AS majority_label,
       n_points, n_majority,
       CASE WHEN cluster IS NULL THEN NULL
            ELSE {PURITY_DIV} END AS purity_r
FROM per_cluster
"""


def _cluster_purity_sql() -> str:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    return CLUSTER_PURITY_SQL_TEMPLATE.replace(
        "{GRID_SQL}", GRID_DENSITY_SQL.strip()
    ).replace(
        "{PURITY_DIV}",
        exact_round_div_sql("n_majority", "n_points", "//"),
    )


REGISTRY["cluster_purity_embeddings"] = {
    "fn": cluster_purity_embeddings,
    "sql": _cluster_purity_sql(),
}


# --------------------------------------------------------------------------
# Simplified silhouette per label over the embedding table: for each
# vector, a = distance to its OWN label centroid and b = the minimum
# distance to any OTHER centroid; s = (b−a)/max(a,b), averaged per
# label — the standard clustering-quality readout that, unlike the
# full silhouette, needs NO all-pairs pass (centroid-based: linear in
# n with a broadcast k×64 centroid table, the 100 TB-safe form).
# Exactness: components and centroids live on the micro-integer grid
# (the label_centroid_distances scheme), so every squared distance is
# an exact integer; a and b are sqrt's of exact integers
# (engine-identical), s is one IEEE chain, and the per-label mean is
# micro-quantized before the integer sum. Ties in the b-argmin don't
# arise (distinct integers or identical s either way).
# --------------------------------------------------------------------------


def silhouette_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("dim", "v"),
    ).selectExpr(
        "vec_id",
        "label",
        "dim",
        "CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS v_micro",
    )
    cent = ex.groupBy("label", "dim").agg(
        F.expr("CAST(SUM(v_micro) AS BIGINT)").alias("s_micro"),
        F.count(F.lit(1)).alias("n"),
    ).selectExpr(
        "label AS c_label",
        "dim",
        "CAST((s_micro * 2 + n) DIV (2 * n) AS BIGINT) AS c_micro",
    )
    sq = (
        ex.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "c_label")
        .agg(
            F.expr(
                "CAST(SUM((v_micro - c_micro) * (v_micro - c_micro))"
                " AS BIGINT)"
            ).alias("sq_micro")
        )
    )
    per_vec = sq.groupBy("vec_id", "label").agg(
        F.max(
            F.expr("CASE WHEN c_label = label THEN sq_micro END")
        ).alias("a_sq"),
        F.min(
            F.expr("CASE WHEN c_label <> label THEN sq_micro END")
        ).alias("b_sq"),
    )
    scored = per_vec.selectExpr(
        "label",
        "(sqrt(CAST(b_sq AS DOUBLE)) - sqrt(CAST(a_sq AS DOUBLE)))"
        " / (CASE WHEN b_sq > a_sq THEN sqrt(CAST(b_sq AS DOUBLE))"
        " ELSE sqrt(CAST(a_sq AS DOUBLE)) END) AS s",
    ).selectExpr(
        "label",
        "CAST(floor(s * 1000000.0 + 0.5) AS BIGINT) AS s_u",
    )
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum("s_u").cast("bigint").alias("s_sum_u"),
        )
        .selectExpr(
            "CAST(label AS BIGINT) AS label",
            "n_vecs",
            "CAST(s_sum_u AS DOUBLE)"
            " / (CAST(n_vecs AS DOUBLE) * 1000000.0)"
            " AS mean_silhouette",
        )
        .orderBy("label")
    )


SILHOUETTE_SQL = """
WITH ex AS (
  SELECT vec_id, label, s.i AS dim,
         CAST(floor(CAST(embedding[s.i] AS DOUBLE) * 1000000.0 + 0.5)
              AS BIGINT) AS v_micro
  FROM embeddings, generate_series(1, 64) AS s(i)
),
cent AS (
  SELECT label AS c_label, dim,
         CAST((CAST(SUM(v_micro) AS BIGINT) * 2 + COUNT(*))
              // (2 * COUNT(*)) AS BIGINT) AS c_micro
  FROM ex GROUP BY 1, 2
),
sq AS (
  SELECT e.vec_id, e.label, c.c_label,
         CAST(SUM((e.v_micro - c.c_micro) * (e.v_micro - c.c_micro))
              AS BIGINT) AS sq_micro
  FROM ex e JOIN cent c USING (dim)
  GROUP BY 1, 2, 3
),
per_vec AS (
  SELECT vec_id, label,
         MAX(CASE WHEN c_label = label THEN sq_micro END) AS a_sq,
         MIN(CASE WHEN c_label <> label THEN sq_micro END) AS b_sq
  FROM sq GROUP BY 1, 2
),
scored AS (
  SELECT label,
         CAST(floor(
           (sqrt(CAST(b_sq AS DOUBLE)) - sqrt(CAST(a_sq AS DOUBLE)))
           / (CASE WHEN b_sq > a_sq THEN sqrt(CAST(b_sq AS DOUBLE))
              ELSE sqrt(CAST(a_sq AS DOUBLE)) END)
           * 1000000.0 + 0.5) AS BIGINT) AS s_u
  FROM per_vec
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(CAST(SUM(s_u) AS BIGINT) AS DOUBLE)
         / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS mean_silhouette
FROM scored
GROUP BY 1
ORDER BY 1
"""


REGISTRY["silhouette_embeddings"] = {
    "fn": silhouette_embeddings,
    "sql": SILHOUETTE_SQL,
}


# --------------------------------------------------------------------------
# Participation ratio (effective dimensionality) of the embedding
# covariance: PR = (tr C)²/||C||²_F = (Σλ)²/Σλ² — trace identities,
# NO eigendecomposition. Rides the micro-quantized integer moments of
# embedding_covariance; each cell's covariance is signed-half-up
# requantized to an exact integer in micro² units (c_u =
# halfup(n·S_jk − S_j·S_k, n(n−1)), 128-bit long division — squaring
# the RAW n-scaled moment would overflow DECIMAL(38) at sf ≥ 0.1,
# this keeps every sum wide-safe at any corpus size). PR near d is a
# healthy isotropic space; PR ≪ d flags representation collapse —
# the diagnostic to check before trusting cosine blocking for dedup.
# The d² cell frame is dimension-bounded, never row-bounded.
# --------------------------------------------------------------------------


def _pr_cell(div: str) -> str:
    from de4ml_spark.operators.portable_hash import (
        wide_halfup_div_sql as _whd,
    )

    pos = _whd("njk", "CAST(n * (n - 1) AS BIGINT)", div)
    neg = _whd("-njk", "CAST(n * (n - 1) AS BIGINT)", div)
    return (
        f"CASE WHEN njk >= 0 THEN CAST({pos} AS BIGINT)"
        f" ELSE -CAST({neg} AS BIGINT) END"
    )


def _pr_final(div: str) -> list[str]:
    big = "DECIMAL(38,0)" if div.upper() == "DIV" else "HUGEINT"
    tr2 = f"CAST(tr_sum AS {big}) * tr_sum"
    return [
        "d_dims",
        "n_vecs",
        f"{_w2d(tr2, div)} / NULLIF({_w2d('frob_sum', div)}, 0.0)"
        " AS participation_ratio",
    ]


def participation_ratio_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("dim", "v"),
    ).selectExpr(
        "vec_id",
        "dim",
        "CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS v_micro",
    )
    a = ex.selectExpr("vec_id", "dim AS j", "v_micro AS xj")
    b = ex.selectExpr("vec_id", "dim AS k", "v_micro AS xk")
    cells = (
        a.join(b, "vec_id")
        .groupBy("j", "k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("xj").cast("bigint").alias("sj"),
            F.sum("xk").cast("bigint").alias("sk"),
            F.sum(F.expr("CAST(xj AS DECIMAL(38,0)) * xk")).alias(
                "sjk"
            ),
        )
        .selectExpr(
            "j",
            "k",
            "n",
            "CAST(n AS DECIMAL(38,0)) * sjk"
            " - CAST(sj AS DECIMAL(38,0)) * sk AS njk",
        )
        .selectExpr("j", "k", "n", f"{_pr_cell('DIV')} AS c_u")
    )
    agg = cells.agg(
        F.max("n").cast("bigint").alias("n_vecs"),
        F.countDistinct("j").cast("bigint").alias("d_dims"),
        F.sum(F.expr("CASE WHEN j = k THEN c_u END"))
        .cast("bigint")
        .alias("tr_sum"),
        F.sum(F.expr("CAST(c_u AS DECIMAL(38,0)) * c_u")).alias(
            "frob_sum"
        ),
    )
    return agg.selectExpr(*_pr_final("DIV"))


def _pr_sql() -> str:
    final = ",\n       ".join(_pr_final("//"))
    return f"""
WITH ex AS (
  SELECT vec_id, gs.i - 1 AS dim,
         CAST(floor(CAST(embedding[gs.i] AS DOUBLE) * 1000000.0 + 0.5)
              AS BIGINT) AS v_micro
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)
         gs
),
cells AS (
  SELECT j, k, n,
         CAST(n AS HUGEINT) * sjk
         - CAST(sj AS HUGEINT) * sk AS njk
  FROM (
    SELECT a.dim AS j, b.dim AS k,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(a.v_micro) AS BIGINT) AS sj,
           CAST(SUM(b.v_micro) AS BIGINT) AS sk,
           SUM(CAST(a.v_micro AS HUGEINT) * b.v_micro) AS sjk
    FROM ex a JOIN ex b USING (vec_id)
    GROUP BY 1, 2
  )
),
quant AS (
  SELECT j, k, n, {_pr_cell('//')} AS c_u FROM cells
),
agg AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n_vecs,
         CAST(COUNT(DISTINCT j) AS BIGINT) AS d_dims,
         CAST(SUM(CASE WHEN j = k THEN c_u END) AS BIGINT) AS tr_sum,
         SUM(CAST(c_u AS HUGEINT) * c_u) AS frob_sum
  FROM quant
)
SELECT {final}
FROM agg
"""


REGISTRY["participation_ratio_embeddings"] = {
    "fn": participation_ratio_embeddings,
    "sql": _pr_sql(),
}


# --------------------------------------------------------------------------
# Mean pairwise dot product of the raw embeddings via the centroid
# identity: Σ_{i≠i'} ⟨vᵢ, vᵢ'⟩ = ||Σᵢ vᵢ||² − Σᵢ ||vᵢ||² — per-dim
# integer sums only, NO pair join at all (the O(n²) definition
# collapses to one map + a d-bounded aggregate; this is the plan
# shape that survives 100 TB). Micro-quantized components; outputs
# the anisotropy diagnostic pair (mean pairwise dot, mean squared
# norm) — their ratio is the Ethayarajh-style anisotropy proxy.
# --------------------------------------------------------------------------


def _mpd_final(div: str) -> list[str]:
    pair = _w2d("pair_num", div)
    norm = _w2d("s_norm", div)
    return [
        "n_vecs",
        f"{pair} / NULLIF(CAST(n_vecs AS DOUBLE)"
        " * (CAST(n_vecs AS DOUBLE) - 1.0) * 1e12, 0.0)"
        " AS mean_pairwise_dot",
        f"{norm} / NULLIF(CAST(n_vecs AS DOUBLE) * 1e12, 0.0)"
        " AS mean_norm_sq",
        f"({pair} / NULLIF(CAST(n_vecs AS DOUBLE)"
        " * (CAST(n_vecs AS DOUBLE) - 1.0), 0.0))"
        f" / NULLIF({norm} / NULLIF(CAST(n_vecs AS DOUBLE), 0.0), 0.0)"
        " AS anisotropy_ratio",
    ]


def mean_pairwise_dot_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("dim", "v"),
    ).selectExpr(
        "vec_id",
        "dim",
        "CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS v_micro",
    )
    per_dim = ex.groupBy("dim").agg(
        F.sum("v_micro").cast("bigint").alias("sd"),
        F.sum(
            F.expr("CAST(v_micro AS DECIMAL(38,0)) * v_micro")
        ).alias("sd2"),
    )
    nv = emb.agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    agg = (
        per_dim.agg(
            F.sum(
                F.expr("CAST(sd AS DECIMAL(38,0)) * sd")
            ).alias("cent_sq"),
            F.sum("sd2").alias("s_norm"),
        )
        .crossJoin(F.broadcast(nv))
        # empty input: the global SUMs are NULL — drop the row so both
        # engines return zero rows (the oracle's GROUP BY over an empty
        # cross join); free filter on a 1-row aggregate
        .filter("s_norm IS NOT NULL")
        .selectExpr(
            "n_vecs",
            "cent_sq - s_norm AS pair_num",
            "CAST(s_norm AS DECIMAL(38,0)) AS s_norm",
        )
    )
    return agg.selectExpr(*_mpd_final("DIV"))


def _mpd_sql() -> str:
    final = ",\n       ".join(_mpd_final("//"))
    return f"""
WITH ex AS (
  SELECT vec_id, gs.i - 1 AS dim,
         CAST(floor(CAST(embedding[gs.i] AS DOUBLE) * 1000000.0 + 0.5)
              AS BIGINT) AS v_micro
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)
         gs
),
per_dim AS (
  SELECT dim,
         CAST(SUM(v_micro) AS BIGINT) AS sd,
         SUM(CAST(v_micro AS HUGEINT) * v_micro) AS sd2
  FROM ex GROUP BY 1
),
nv AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs FROM embeddings
),
agg AS (
  SELECT n_vecs,
         SUM(CAST(sd AS HUGEINT) * sd) - SUM(sd2) AS pair_num,
         CAST(SUM(sd2) AS HUGEINT) AS s_norm
  FROM per_dim CROSS JOIN nv
  GROUP BY 1
)
SELECT {final}
FROM agg
"""


REGISTRY["mean_pairwise_dot_embeddings"] = {
    "fn": mean_pairwise_dot_embeddings,
    "sql": _mpd_sql(),
}
