"""Deduplication queries over ``documents`` / ``embeddings`` (extension tier):
exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

The catalog MinHash and SimHash entries use the engine-portable hash tier
(operators/portable_hash.py): signatures are md5-arithmetic values that
DuckDB reproduces bit-for-bit (``md5_number_lower``), so both pipelines are
fully oracle-gated — banding, candidate join, and exact verify replay
identically on both engines. The xxhash64-based variants remain in
operators/dedup.py for raw-throughput pipelines; tests/test_dedup.py gates
those against the exact-Jaccard / exact-Hamming pair sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.operators.dedup import (
    embedding_neardup_blocked,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs_portable,
    ngram_jaccard_pairs,
    simhash_bands,
    simhash_pairs,
)
from de4ml_spark.operators.portable_hash import (
    BAND_RADIX,
    P31,
    exact_round_div_sql,
    hash_family,
    phash_duck_sql,
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


# Engine-exact jaccard rounding: inter and the set sizes are integers, so
# round(inter/union, 6) computes in pure integer arithmetic on both
# engines (ROUND on doubles can differ in the last digit at half-way
# boundaries — portable_hash.exact_round_div_sql).
_JACCARD_SPARK = exact_round_div_sql("inter", "n_a + n_b - inter", "DIV")
_JACCARD_DUCK = exact_round_div_sql("i.inter", "c1.n + c2.n - i.inter", "//")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.8, n=3).select(
        "id_a",
        "id_b",
        "inter",
        "n_a",
        "n_b",
        F.expr(_JACCARD_SPARK).alias("jaccard_r"),
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
       {jac} AS jaccard_r
FROM p
JOIN c c1 ON p.id_a = c1.doc_id
JOIN c c2 ON p.id_b = c2.doc_id
WHERE p.inter * 1.0 / (c1.n + c2.n - p.inter) >= 0.8
""".format(
    jac=exact_round_div_sql("p.inter", "c1.n + c2.n - p.inter", "//")
)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # 24 hashes / 12 bands (r=2): P(candidate | j=0.8) = 1-(1-0.64)^12
    # ≈ 1 - 5e-6 — recall indistinguishable from 32/16 (pair sets verified
    # identical at sf0.01 and sf0.1) at ~25% less signature work.
    return minhash_lsh_pairs_portable(
        docs, threshold=0.8, num_hashes=24, bands=12
    ).select("id_a", "id_b", F.expr(_JACCARD_SPARK).alias("jaccard_r"))


def minhash_oracle_sql(
    num_hashes: int = 24, bands: int = 12, threshold: float = 0.8
) -> str:
    """DuckDB twin of ``minhash_lsh_pairs_portable`` — same seeded family
    constants, band packing, and exact-Jaccard verify, replayed in SQL."""
    fam = hash_family(num_hashes)
    mins = ",\n       ".join(
        f"MIN((x * {a} + {b}) % {P31}) AS h{s}" for s, (a, b) in enumerate(fam)
    )
    band_sel = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band, "
        f"h{2 * b} * {BAND_RADIX} + h{2 * b + 1} AS bucket FROM sig"
        for b in range(bands)
    )
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))) AS s
  FROM t WHERE len(toks) >= 3
),
e AS (SELECT DISTINCT doc_id, {phash_duck_sql('s', 32)} AS x FROM sh),
c AS (SELECT doc_id, COUNT(*) AS n FROM e GROUP BY 1),
sig AS (SELECT doc_id, {mins}
        FROM e GROUP BY doc_id),
bnd AS (
  {band_sel}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bnd a JOIN bnd b ON a.band = b.band AND a.bucket = b.bucket
                       AND a.doc_id < b.doc_id
),
i AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM e a JOIN e b ON a.x = b.x AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT cand.id_a, cand.id_b,
       {_JACCARD_DUCK} AS jaccard_r
FROM cand
JOIN i ON cand.id_a = i.id_a AND cand.id_b = i.id_b
JOIN c c1 ON cand.id_a = c1.doc_id
JOIN c c2 ON cand.id_b = c2.doc_id
WHERE i.inter * 1.0 / (c1.n + c2.n - i.inter) >= {threshold}
"""


SIMHASH_BITS = 59  # top portable-hash width: bit ops stay in positive BIGINT


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(
        docs,
        max_hamming=3,
        bits=SIMHASH_BITS,
        portable=True,
    )


def simhash_oracle_sql(max_hamming: int = 3, bits: int = SIMHASH_BITS) -> str:
    """DuckDB twin of the portable ``simhash_pairs``: per-token portable
    hash, bit-majority votes, band candidates, exact Hamming verify."""
    votes = ",\n       ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )
    sig = "\n     | ".join(
        f"(CASE WHEN v{j} > 0 THEN (1::BIGINT << {j}) ELSE 0 END)"
        for j in range(bits)
    )
    band_sel = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, sh, {b} AS band, "
        f"(sh >> {shift}) & {(1 << width) - 1} AS bucket FROM sig"
        for b, (shift, width) in enumerate(simhash_bands(bits))
    )
    return f"""
WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents),
h AS (SELECT doc_id, {phash_duck_sql('tok', bits)} AS h FROM tk),
v AS (SELECT doc_id, {votes}
      FROM h GROUP BY doc_id),
sig AS (SELECT doc_id, {sig} AS sh FROM v),
bnd AS (
  {band_sel}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sa, b.sh AS sb
  FROM bnd a JOIN bnd b ON a.band = b.band AND a.bucket = b.bucket
                       AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r17: blocked-BLAS candidates + exact unrolled-dot rescore —
    # identical pair set AND cos_sim bits as the old interpreted
    # all-pairs fold (operators/dedup.py embedding_neardup_pairs_fast
    # documents the guard-band argument); 22.4 s -> ~1 s at sf0.1.
    from de4ml_spark.operators.dedup import embedding_neardup_pairs_fast

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs_fast(emb, threshold=0.45)


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


# CTE chain shared with dedup_canonicalize's oracle (queries/pipelineq.py):
# everything up to and including the transitive closure `reach`.
COMPONENTS_CTES = """
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
)"""

COMPONENTS_SELECT = """
SELECT d.doc_id,
       LEAST(d.doc_id, COALESCE(MIN(r.m), d.doc_id)) AS component
FROM documents d
LEFT JOIN reach r ON d.doc_id = r.n
GROUP BY d.doc_id"""

DEDUP_COMPONENTS_SQL = COMPONENTS_CTES + COMPONENTS_SELECT + "\n"


# --------------------------------------------------------------------------
# LSH recall evaluation: the MinHash-LSH candidate pipeline vs the
# EXHAUSTIVE exact-Jaccard pair set — the acceptance gate for the
# approximate dedup index (sibling of knn_lsh_recall on the ANN side).
# --------------------------------------------------------------------------


def dedup_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row report: exhaustive near-dup pairs (Jaccard >= 0.8), pairs
    the banded MinHash-LSH pipeline surfaced, the intersection, and the
    exact recall ratio.

    Scale: both pair relations are bounded by near-dup density, not the
    corpus; the compare is a join on (id_a, id_b)."""
    exact = ngram_jaccard_pairs(docs := load_table(spark, sf_dir, "documents"),
                                threshold=0.8, n=3).select("id_a", "id_b")
    lsh = minhash_lsh_pairs_portable(
        docs, threshold=0.8, num_hashes=24, bands=12
    ).select("id_a", "id_b")
    hits = exact.join(lsh, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(lsh.agg(F.count(F.lit(1)).alias("n_lsh")))
        .crossJoin(hits)
        .select(
            "n_exact",
            "n_lsh",
            "n_hits",
            # NULLIF: a corpus with no exact near-dup pairs reports
            # NULL recall, not DIVIDE_BY_ZERO
            F.expr(
                exact_round_div_sql("n_hits", "NULLIF(n_exact, 0)", "DIV")
            ).alias("recall_r"),
        )
    )


def _minhash_recall_sql() -> str:
    exact_pairs = """
SELECT q.id_a, q.id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
    FROM (SELECT doc_id, unnest(sh) AS shingle FROM s2) a
    JOIN (SELECT doc_id, unnest(sh) AS shingle FROM s2) b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ) q
  JOIN (SELECT doc_id, len(sh) AS n FROM s2) c1 ON q.id_a = c1.doc_id
  JOIN (SELECT doc_id, len(sh) AS n FROM s2) c2 ON q.id_b = c2.doc_id
  WHERE q.inter * 1.0 / (c1.n + c2.n - q.inter) >= 0.8"""
    return f"""
WITH t2 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s2 AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(toks) - 2),
                       i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t2 WHERE len(toks) >= 3
),
exact_p AS ({exact_pairs}),
lsh_p AS (SELECT id_a, id_b FROM ({minhash_oracle_sql()})),
n_e AS (SELECT COUNT(*) AS n_exact FROM exact_p),
n_l AS (SELECT COUNT(*) AS n_lsh FROM lsh_p),
n_h AS (SELECT COUNT(*) AS n_hits
        FROM exact_p JOIN lsh_p USING (id_a, id_b))
SELECT n_exact, n_lsh, n_hits,
       {exact_round_div_sql('n_hits', 'NULLIF(n_exact, 0)', '//')} AS recall_r
FROM n_e, n_l, n_h
"""


# --------------------------------------------------------------------------
# Cross-source duplicate leakage matrix: near-dup PAIRS bucketed by the
# (source_a, source_b) combination — the diagnostic that catches
# train/eval splits leaking through near-duplicates that live in
# different sources. Canonicalized source ordering so (A,B) == (B,A).
# --------------------------------------------------------------------------


def dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair counts per unordered source pair, plus how many are
    cross-source (the leakage risk).

    Scale: two broadcast joins of the (already bounded) pair relation
    against the doc->source projection; the matrix is |sources|^2 rows."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, n=3).select("id_a", "id_b")
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb"))
    j = pairs.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
    lo = F.least("sa", "sb")
    hi = F.greatest("sa", "sb")
    return (
        j.groupBy(lo.alias("source_lo"), hi.alias("source_hi"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count(F.when(F.col("sa") != F.col("sb"), 1)).alias(
                "n_cross_source"
            ),
        )
    )


DEDUP_SOURCE_MATRIX_SQL = """
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
  SELECT q.id_a, q.id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
    FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ) q
  JOIN c c1 ON q.id_a = c1.doc_id
  JOIN c c2 ON q.id_b = c2.doc_id
  WHERE q.inter * 1.0 / (c1.n + c2.n - q.inter) >= 0.8
)
SELECT LEAST(da.source, db.source) AS source_lo,
       GREATEST(da.source, db.source) AS source_hi,
       COUNT(*) AS n_pairs,
       COUNT(*) FILTER (WHERE da.source <> db.source) AS n_cross_source
FROM p
JOIN documents da ON p.id_a = da.doc_id
JOIN documents db ON p.id_b = db.doc_id
GROUP BY 1, 2
"""


REGISTRY: dict[str, dict] = {
    "dedup_exact_docs": {"fn": dedup_exact_docs, "sql": DEDUP_EXACT_SQL},
    "dedup_source_matrix": {
        "fn": dedup_source_matrix,
        "sql": DEDUP_SOURCE_MATRIX_SQL,
    },
    "dedup_minhash_recall": {
        "fn": dedup_minhash_recall,
        "sql": _minhash_recall_sql(),
    },
    "dedup_components": {"fn": dedup_components, "sql": DEDUP_COMPONENTS_SQL},
    "dedup_ngram_jaccard": {"fn": dedup_ngram_jaccard, "sql": DEDUP_NGRAM_SQL},
    "dedup_minhash_lsh": {"fn": dedup_minhash_lsh, "sql": minhash_oracle_sql()},
    "dedup_simhash": {"fn": dedup_simhash, "sql": simhash_oracle_sql()},
    "dedup_embedding_cosine": {
        "fn": dedup_embedding_cosine,
        "sql": DEDUP_EMBEDDING_SQL,
    },
    "dedup_embedding_blocked": {
        "fn": dedup_embedding_blocked,
        "sql": DEDUP_EMBEDDING_BLOCKED_SQL,
    },
}


# --------------------------------------------------------------------------
# Blocked fuzzy match (entity resolution): near-identical part names by
# edit distance. The naive formulation is an all-pairs levenshtein cross
# join — quadratic in distinct names. The scale shape is multi-pass
# BLOCKING: a candidate pair must share its first OR last token and sit in
# a +/-3 length band (two equi-join passes on cheap keys, unioned and
# de-duplicated), then the exact levenshtein <= 3 verify runs on the
# surviving candidates only. The blocking predicate is part of the
# operator contract (standard ER practice — recall is governed by the
# blocking design), so the DuckDB oracle applies the same predicate; both
# engines' levenshtein is the unit-cost insert/delete/substitute distance.
# Support counts (parts per name) ride along from the distinct-name
# aggregate.
# --------------------------------------------------------------------------

def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    toks = F.split(F.col("p_name"), " ")
    keyed = names.select(
        "p_name",
        "n_parts",
        F.length("p_name").alias("len"),
        toks.getItem(0).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
    )
    blocks = (
        keyed.select("p_name", F.col("first_tok").alias("blk"))
        .unionByName(keyed.select("p_name", F.col("last_tok").alias("blk")))
        .distinct()
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"), F.col("b.p_name").alias("name_b")
        )
        .distinct()
    )
    ka = keyed.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("n_a"),
        F.col("len").alias("len_a"),
    )
    kb = keyed.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("n_b"),
        F.col("len").alias("len_b"),
    )
    return (
        cand.join(F.broadcast(ka), "name_a")
        .join(F.broadcast(kb), "name_b")
        .filter(F.abs(F.col("len_a") - F.col("len_b")) <= 3)
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 3)
        .select("name_a", "name_b", "dist", "n_a", "n_b")
    )


FUZZY_SQL = """
WITH names AS (
  SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY 1
),
keyed AS (
  SELECT p_name, n_parts, length(p_name) AS len,
         string_split(p_name, ' ')[1] AS first_tok,
         string_split(p_name, ' ')[-1] AS last_tok
  FROM names
),
blocks AS (
  SELECT DISTINCT p_name, blk FROM (
    SELECT p_name, first_tok AS blk FROM keyed
    UNION ALL
    SELECT p_name, last_tok FROM keyed
  )
),
cand AS (
  SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
  FROM blocks a JOIN blocks b
    ON a.blk = b.blk AND a.p_name < b.p_name
)
SELECT name_a, name_b,
       levenshtein(name_a, name_b) AS dist,
       ka.n_parts AS n_a, kb.n_parts AS n_b
FROM cand
JOIN keyed ka ON cand.name_a = ka.p_name
JOIN keyed kb ON cand.name_b = kb.p_name
WHERE abs(ka.len - kb.len) <= 3
  AND levenshtein(name_a, name_b) <= 3
"""


REGISTRY["fuzzy_name_pairs"] = {"fn": fuzzy_name_pairs, "sql": FUZZY_SQL}


def dedup_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup graph degree per document (0 for singletons) — the
    cluster diagnostic that separates 'a few giant templates' from
    'many small near-pairs' before choosing canonicalization strategy.
    Scale: the pair set is the banded/verified near-dup graph (never
    all-pairs); the degree count is one groupBy over its edges."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, n=3).select("id_a", "id_b")
    edges = pairs.unionAll(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    deg = edges.groupBy("id_a").agg(F.count(F.lit(1)).alias("degree"))
    return docs.select("doc_id").join(
        deg.withColumnRenamed("id_a", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("degree", F.lit(0)).cast("bigint").alias("degree")
    )


DEDUP_DEGREES_SQL = COMPONENTS_CTES + """
SELECT d.doc_id, CAST(COUNT(e2.b) AS BIGINT) AS degree
FROM documents d LEFT JOIN edges e2 ON d.doc_id = e2.a
GROUP BY d.doc_id
"""

REGISTRY["dedup_graph_degrees"] = {
    "fn": dedup_graph_degrees,
    "sql": DEDUP_DEGREES_SQL,
}


# --------------------------------------------------------------------------
# PPJoin-style prefix-filtered set-similarity self-join (Xiao et al.,
# WWW 2008): EXACT Jaccard >= 0.7 pairs over distinct-token sets WITHOUT
# minhash probabilism and WITHOUT the all-pairs join. Tokens order by
# ascending document frequency (rare first, ties by token text); a doc
# of n tokens need only expose its first n - ceil(t*n) + 1 tokens — two
# sets with Jaccard >= t MUST share a prefix token — so the candidate
# join is an equi-join on prefix tokens whose fan-out is governed by
# RARE tokens. The length filter t*|a| <= |b| <= |a|/t prunes inside the
# join; the verify stage computes the exact intersection only for
# surviving candidate pairs (integer cross-multiplied threshold — no
# float compare). All ranks are per-doc windows on the (df, token)
# order: NO global rank, so nothing single-partitions at 100 TB.
# Complements MinHash-LSH (probabilistic recall) with the exact-recall
# prefix algorithm the dedup literature pairs it with.
# --------------------------------------------------------------------------

PPJOIN_T_NUM, PPJOIN_T_DEN = 7, 10  # Jaccard threshold 0.7
# The synthetic corpus is CLONE-HEAVY (~40% of all pairs exceed 0.7
# Jaccard at sf0.1), so the qualifying-pair set itself is quadratic in
# the doc count — a data property no candidate algorithm can bound. The
# catalog entry therefore verifies on the first PPJOIN_DOC_CAP docs
# (covering every doc at sf<=0.01); on a real 100 TB corpus near-dup
# density is low and the prefix filter is what bounds the join, after
# exact dedup removes the clone mass first (the documented ordering).
PPJOIN_DOC_CAP = 600


def ppjoin_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.cache import release_after

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < PPJOIN_DOC_CAP
    )
    # three consumers (dfreq, ranked, the verify arrays) read the token
    # relation; persist it once as the shared index — the same
    # shared-scan pattern as the MinHash shingle relation
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).distinct().persist()
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # r17 (guide §2.4 — remove exchanges): ONE groupBy(doc_id) builds
    # each doc's (df, tok)-sorted token array; the df-rank order, the
    # token count n, the prefix slice AND the verify-stage token sets
    # all derive from it. Replaces the old row_number + count window
    # pair (exchange + per-doc sort over the token relation) plus a
    # THIRD scan of toks for the verify arrays — identical prefix set
    # (array_sort on struct(df, tok) is the same (df, tok) lexicographic
    # order the window used; tokens are distinct per doc so list = set).
    ranked_arr = (
        toks.join(dfreq, "tok")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "tok"))).alias(
                "arr"
            )
        )
        .persist()
    )
    # prefix length n - ceil(t*n) + 1; ceil(7n/10) = (7n + 9) DIV 10
    prefix = ranked_arr.select(
        "doc_id",
        F.size("arr").alias("n"),
        F.explode(
            F.expr(
                f"slice(arr, 1, size(arr) - (({PPJOIN_T_NUM} * size(arr)"
                f" + {PPJOIN_T_DEN - 1}) DIV {PPJOIN_T_DEN}) + 1)"
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.tok").alias("tok"), "n")
    a = prefix.select(
        F.col("doc_id").alias("doc_a"),
        F.col("tok").alias("tok"),
        F.col("n").alias("na"),
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"),
        F.col("tok").alias("tok"),
        F.col("n").alias("nb"),
    )
    cand = (
        a.join(b, "tok")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (
                F.col("nb") * PPJOIN_T_DEN
                >= F.col("na") * PPJOIN_T_NUM
            )
            & (
                F.col("na") * PPJOIN_T_DEN
                >= F.col("nb") * PPJOIN_T_NUM
            )
        )
        .select("doc_a", "doc_b", "na", "nb")
        .distinct()
    )
    # verify: per-doc token SETS as array columns, one hash join per
    # side, JVM array_intersect — no second token explode (the exploded
    # verify joined |cand| x |tokens| rows; this joins |cand| rows).
    # Sets project from the shared ranked_arr index (array_intersect is
    # order-insensitive), not a third scan of toks.
    arrs = ranked_arr.select(
        "doc_id", F.expr("transform(arr, x -> x.tok)").alias("arr")
    )
    inter = (
        cand.join(
            arrs.select(F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a")),
            "doc_a",
        )
        .join(
            arrs.select(F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "na",
            "nb",
            F.size(F.array_intersect("arr_a", "arr_b")).cast("bigint").alias("n_inter"),
        )
    )
    out = inter.filter(
        F.col("n_inter") * PPJOIN_T_DEN
        >= (F.col("na") + F.col("nb") - F.col("n_inter")) * PPJOIN_T_NUM
    ).select(
        "doc_a",
        "doc_b",
        "n_inter",
        (F.col("na") + F.col("nb") - F.col("n_inter")).alias("n_union"),
        F.expr(
            exact_round_div_sql(
                "n_inter", "na + nb - n_inter", "DIV"
            )
        ).alias("jaccard_r"),
    )
    return release_after(out, toks, ranked_arr)


PPJOIN_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE doc_id < {PPJOIN_DOC_CAP}
),
dfreq AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY 1),
ranked AS (
  SELECT t.doc_id, t.tok,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id
                            ORDER BY d.df, t.tok) AS rn,
         COUNT(*) OVER (PARTITION BY t.doc_id) AS n
  FROM toks t JOIN dfreq d USING (tok)
),
prefix AS (
  SELECT * FROM ranked
  WHERE rn <= n - (({PPJOIN_T_NUM} * n + {PPJOIN_T_DEN - 1})
                   // {PPJOIN_T_DEN}) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.n AS na, b.n AS nb
  FROM prefix a JOIN prefix b
    ON a.tok = b.tok AND a.doc_id < b.doc_id
  WHERE b.n * {PPJOIN_T_DEN} >= a.n * {PPJOIN_T_NUM}
    AND a.n * {PPJOIN_T_DEN} >= b.n * {PPJOIN_T_NUM}
),
arrs AS (
  SELECT doc_id, list(tok) AS arr FROM toks GROUP BY 1
),
inter AS (
  SELECT c.doc_a, c.doc_b, c.na, c.nb,
         CAST(len(list_intersect(aa.arr, ab.arr)) AS BIGINT) AS n_inter
  FROM cand c
  JOIN arrs aa ON aa.doc_id = c.doc_a
  JOIN arrs ab ON ab.doc_id = c.doc_b
)
SELECT doc_a, doc_b, n_inter,
       na + nb - n_inter AS n_union,
       {exact_round_div_sql("n_inter", "na + nb - n_inter", "//")}
         AS jaccard_r
FROM inter
WHERE n_inter * {PPJOIN_T_DEN}
      >= (na + nb - n_inter) * {PPJOIN_T_NUM}
"""

REGISTRY["ppjoin_docs"] = {"fn": ppjoin_docs, "sql": PPJOIN_SQL}


# --------------------------------------------------------------------------
# Fuzzy-name duplicate audit over `part` via native edit distance:
# within each p_brand block, all name pairs scored by levenshtein()
# (both engines ship the classic unit-cost DP — integer, portable).
# Per brand: exact-duplicate names (lev = 0), near-duplicates
# (1 ≤ lev ≤ 4), the minimum positive distance, and the total pair
# mass. Scale: the block key bounds the quadratic — brand is the demo
# block (|block| = |part|/25); a 100 TB deployment blocks on
# (brand, container) or a name-length bucket exactly like the other
# blocked-dedup entries (operators/dedup.py), and the per-block
# self-join shuffles once on the block key. The reference's dedup
# surface is hash-exact only; edit-distance blocking extends it the
# same way minhash/simhash do.
# --------------------------------------------------------------------------

FUZZY_FINAL = [
    "p_brand",
    "n_parts",
    "n_pairs",
    "dup_name_pairs",
    "near_pairs",
    "min_pos_lev",
    "sum_lev",
]


def fuzzy_name_pairs_parts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_name"
    )
    o = part.selectExpr(
        "p_partkey AS pk2", "p_brand", "p_name AS name2"
    )
    pairs = (
        part.join(o, "p_brand")
        .filter(F.col("p_partkey") < F.col("pk2"))
        .selectExpr(
            "p_brand", "levenshtein(p_name, name2) AS lev"
        )
    )
    sizes = part.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )
    agg = pairs.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.expr("CAST(lev = 0 AS BIGINT)"))
        .cast("bigint")
        .alias("dup_name_pairs"),
        F.sum(F.expr("CAST(lev BETWEEN 1 AND 4 AS BIGINT)"))
        .cast("bigint")
        .alias("near_pairs"),
        F.min(F.expr("CASE WHEN lev > 0 THEN lev END"))
        .cast("int")
        .alias("min_pos_lev"),
        F.sum("lev").cast("bigint").alias("sum_lev"),
    )
    return (
        sizes.join(agg, "p_brand")
        .select(*FUZZY_FINAL)
        .orderBy("p_brand")
    )


FUZZY_SQL = f"""
WITH pairs AS (
  SELECT a.p_brand, levenshtein(a.p_name, b.p_name) AS lev
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
),
sizes AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM part GROUP BY 1
),
agg AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN lev = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_name_pairs,
         CAST(SUM(CASE WHEN lev BETWEEN 1 AND 4 THEN 1 ELSE 0 END)
              AS BIGINT) AS near_pairs,
         CAST(MIN(CASE WHEN lev > 0 THEN lev END) AS INT)
           AS min_pos_lev,
         CAST(SUM(lev) AS BIGINT) AS sum_lev
  FROM pairs GROUP BY 1
)
SELECT {", ".join(FUZZY_FINAL)}
FROM sizes JOIN agg USING (p_brand)
ORDER BY p_brand
"""

REGISTRY["fuzzy_name_pairs_parts"] = {
    "fn": fuzzy_name_pairs_parts,
    "sql": FUZZY_SQL,
}
