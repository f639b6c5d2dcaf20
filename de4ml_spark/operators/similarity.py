"""Similarity search over embedding columns: exact brute-force top-k and an
LSH-bucketed approximate variant for scale.

Scale design: brute-force top-k embeds the (small, by construction) query
set as literal coefficients in a projection over the corpus scan — one
codegen'd pass, no join, no shuffle except the final per-query top-k. The
LSH variant buckets the corpus once (single scan; signatures from
deterministic hash-derived hyperplanes — no stored model needed) and joins
queries to their bucket, cutting the scored candidates by ~2^bits; exact
cosine rescoring keeps ranking quality. An IVF variant (operators/ivf.py)
covers the centroid-probing family.

Expression-construction note (applies to every unrolled vector expression
in this package): a dim-64 unrolled sum built from PySpark ``Column``
operators costs hundreds of Py4J round trips PER EXPRESSION at plan-build
time — measured seconds of driver latency for multi-query/multi-centroid
plans before any execution starts. All unrolled math is therefore emitted
as a single SQL string wrapped in one ``F.expr(...)`` call: one RPC, parsed
JVM-side, identical analyzed plan. Float literals carry the ``D`` suffix
(SQL double), since bare decimal literals parse as DECIMAL in Spark SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from de4ml_spark.cache import release_after


def dot_sql(a: str, b: str, dim: int) -> str:
    """SQL text of the unrolled dot product a·b (left-to-right order —
    matches the HOF fold's summation order bit-for-bit)."""
    return "(" + " + ".join(f"{a}[{d}] * {b}[{d}]" for d in range(dim)) + ")"


def lit_dot_sql(a: str, v: list[float], dim: int | None = None) -> str:
    """SQL text of a·v with the vector v inlined as double literals."""
    dim = len(v) if dim is None else dim
    return "(" + " + ".join(f"{a}[{d}] * {v[d]!r}D" for d in range(dim)) + ")"


def norm_sql(a: str, dim: int) -> str:
    return f"sqrt({dot_sql(a, a, dim)})"


def dot(a: Column, b: Column) -> Column:
    """HOF-fold dot product (interpreted). Use inside operators that do not
    participate in whole-stage codegen (BroadcastNestedLoopJoin pair joins):
    there the fold's tight loop beats a deep unrolled tree, which would be
    evaluated by recursive interpretation. Inside codegen stages prefer
    ``F.expr(dot_sql(...))``."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a))


def _as_double(df: DataFrame, vec_col: str) -> Column:
    return F.transform(vec_col, lambda x: x.cast("double"))


def _py_norm(v: list[float]) -> float:
    """Norm in Python doubles with the same left-to-right summation order as
    the engine's unrolled sum — bit-identical IEEE result."""
    acc = v[0] * v[0]
    for x in v[1:]:
        acc += x * x
    return acc ** 0.5


def topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = 64,
    max_literal_queries: int = 1024,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).
    Similarity rounded to 6 decimals before ranking with id tiebreak —
    deterministic across engines and partitionings.

    Plan shape: the query set is small by construction (a top-k probe, not a
    table), so its vectors are collected and embedded as LITERAL
    coefficients in a projection over the corpus scan — each corpus row
    computes all |q| dot products inside whole-stage codegen, then explodes
    to (query, neighbor, cos) rows for the per-query top-k window
    (WindowGroupLimit keeps only k rows per query before the shuffle). No
    join at all: the alternative broadcast non-equi join executes as
    BroadcastNestedLoopJoin, which does not participate in codegen, leaving
    every per-pair expression interpreted (~2.5x slower measured). Falls
    back to that join path above ``max_literal_queries`` (plan size grows
    O(|q|*dim))."""
    q_rows = queries.select(F.col(id_col), _as_double(queries, vec_col)).collect()
    if len(q_rows) > max_literal_queries:
        return _topk_join_path(queries, corpus, k, id_col, vec_col)
    qvecs = [(r[0], [float(x) for x in r[1]]) for r in q_rows]
    if not qvecs:
        # zero queries (partition-pruned or empty probe set): the literal
        # path would build explode(array()) whose element type cannot be
        # inferred — return the empty result with the contract schema
        idt = corpus.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [],
            f"query_id BIGINT, neighbor_id {idt}, cos_sim DOUBLE, rank INT",
        )
    d = dim if dim is not None else (len(qvecs[0][1]) if qvecs else 0)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(corpus, vec_col).alias("ce")
    ).withColumn("cn", F.expr(norm_sql("ce", d)))

    # Per-query cosines land in SEPARATE columns before the explode: one
    # fused explode(array(<|q| x dim-term structs>)) expression exceeds the
    # JVM 64 KB method limit, aborting whole-stage codegen for the stage
    # (every row then evaluated interpreted, ~10x slower). Separate columns
    # split into separate codegen methods.
    # persist() is a materialization barrier: without it CollapseProject +
    # generate-pushdown re-fuse all |q| dot products into one giant explode
    # expression that exceeds the 64 KB codegen method limit (whole stage
    # falls back to interpreted eval, ~3x slower measured).
    with_cos = c.select(
        "neighbor_id",
        *[
            F.expr(
                f"round({lit_dot_sql('ce', qv)} / ({_py_norm(qv)!r}D * cn), 6)"
            ).alias(f"__cos_{i}")
            for i, (_, qv) in enumerate(qvecs)
        ],
    ).persist()
    structs = ", ".join(
        f"named_struct('query_id', CAST({qid} AS BIGINT), 'cos_sim', __cos_{i})"
        for i, (qid, _) in enumerate(qvecs)
    )
    scored = (
        with_cos.select(
            "neighbor_id", F.expr(f"explode(array({structs}))").alias("qc")
        )
        .select("qc.query_id", "neighbor_id", "qc.cos_sim")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    result = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return release_after(result, with_cos)


def _topk_join_path(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Broadcast non-equi join fallback for large query sets. Executes as
    BroadcastNestedLoopJoin (no codegen), so the per-pair dot uses the HOF
    fold. Norms still precompute in the (codegen'd) pre-join projections."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(queries, vec_col).alias("qe")
    ).withColumn("qn", norm(F.col("qe")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(corpus, vec_col).alias("ce")
    ).withColumn("cn", norm(F.col("ce")))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def plane_coeffs(p: int, dim: int) -> list[float]:
    """±1 coefficients of hyperplane p: parity of md5(f"{p}:{d}") byte 0.
    Deterministic and engine-independent (plain Python, fixed constants), so
    the same literals embed in both the Spark plan and the DuckDB oracle —
    no stored model, identical across executors."""
    import hashlib

    return [
        1.0 if hashlib.md5(f"{p}:{d}".encode()).digest()[0] % 2 == 0 else -1.0
        for d in range(dim)
    ]


def _plane_proj_sql(e: str, p: int, dim: int) -> str:
    """SQL text of hyperplane p's projection: a flat codegen'd ±e[d] sum
    with the ±1 coefficients inlined as double literals (exact multiply)."""
    cs = plane_coeffs(p, dim)
    return " + ".join(f"{e}[{d}] * {cs[d]!r}D" for d in range(dim))


def random_hyperplane_buckets(
    df: DataFrame,
    bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-LSH bucket id per vector. Deterministic, no stored model,
    identical across executors. Per-plane projections land in separate
    columns (separate codegen methods — a fused bits*dim expression can
    exceed the 64 KB method limit and abort codegen), then a tiny bit-pack
    combines the signs."""
    projected = df.select(
        F.col(id_col),
        F.col(vec_col),
        _as_double(df, vec_col).alias("__e"),
    ).select(
        F.col(id_col),
        F.col(vec_col),
        *[
            F.expr(_plane_proj_sql("__e", p, dim)).alias(f"__p{p}")
            for p in range(bits)
        ],
    )
    pack = " | ".join(
        f"(CASE WHEN __p{p} > 0 THEN shiftleft(1, {p}) ELSE 0 END)"
        for p in range(bits)
    )
    return projected.select(
        F.col(id_col), F.col(vec_col), F.expr(pack).alias("bucket")
    )


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
    topk_bruteforce. The bucket equi-join is a codegen'd broadcast hash
    join, so the per-pair dot is the unrolled SQL form."""
    qb = random_hyperplane_buckets(queries, bits, dim, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("qe"),
        F.col("bucket"),
    ).withColumn("qn", F.expr(norm_sql("qe", dim)))
    cb = random_hyperplane_buckets(corpus, bits, dim, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("ce"),
        F.col("bucket"),
    ).withColumn("cn", F.expr(norm_sql("ce", dim)))
    scored = (
        F.broadcast(qb)
        .join(
            cb,
            (qb["bucket"] == cb["bucket"])
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.expr(dot_sql("qe", "ce", dim)) / (F.col("qn") * F.col("cn")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_int8(
    df: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar int8 quantization of an embedding column: global symmetric
    scale (max |x| over the corpus -> codes in [-127, 127]). Cuts vector
    memory 4x — the standard ANN index compression; exact rescoring reads
    the original column only for final candidates.

    Returns (id, codes ARRAY<TINYINT>, scale DOUBLE). Reconstruction error
    per element is bounded by scale/2 (gated in tests). The global max-abs
    reduction is one tiny aggregate; quantization itself is one codegen'd
    projection pass with the scale inlined as a literal.
    """
    e = _as_double(df, vec_col)
    max_abs = df.select(
        F.max(F.expr(
            "aggregate(transform({c}, x -> abs(cast(x as double))), "
            "cast(0.0 as double), (a, x) -> greatest(a, x))".format(c=vec_col)
        )).alias("m")
    ).collect()[0]["m"]
    scale = (max_abs / 127.0) if max_abs else 1.0
    codes = F.transform(
        e, lambda x: F.round(x / F.lit(scale)).cast("tinyint")
    )
    return df.select(
        F.col(id_col),
        codes.alias("codes"),
        F.lit(float(scale)).alias("scale"),
    )
