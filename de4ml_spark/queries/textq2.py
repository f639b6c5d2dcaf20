"""Second text tier: TF-IDF top terms and the composite ``clean_corpus``
pipeline (quality filter + near-dup removal) — the canonical LLM-data
curation flow as one declarative query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.operators.dedup import ngram_jaccard_pairs
from de4ml_spark.operators.text import quality_score, tokens
from de4ml_spark.session import load_table


# --------------------------------------------------------------------------
# TF-IDF top terms per document. Shape: explode -> (doc, term) counts ->
# broadcast doc-frequency join -> per-doc top-3 window. Two shuffles
# (term counts, window), both on uniform keys.
#
# The idf is the PORTABLE ln (operators/portable_hash.py): ln(N/df)
# computed from correctly-rounded IEEE ops only, bit-identical between
# Spark and DuckDB — no catalog dependence on libm ln agreement (JVM
# Math.log vs glibc log can differ in the last ulp, flipping a 6dp ROUND
# at a half boundary). The final rounding is the exact floor form for the
# same reason.
# --------------------------------------------------------------------------

def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        round6_floor_sql,
        with_portable_ln,
    )

    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).alias("_n_docs"))
    terms = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    joined = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(n))
    scored = with_portable_ln(joined, "_n_docs", "doc_freq", "__idf").withColumn(
        "tfidf",
        F.expr(round6_floor_sql("CAST(tf AS DOUBLE) * __idf")),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "doc_freq", "tfidf", "rank")
    )


def _tfidf_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
        round6_floor_sql,
    )

    return f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
j AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.doc_freq, n.n_docs
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
{portable_ln_duck_ctes(
    "j", "doc_id, term, tf, doc_freq", "n_docs", "doc_freq", "idf", "pl")},
scored AS (
  SELECT doc_id, term, tf, doc_freq,
         {round6_floor_sql("CAST(tf AS DOUBLE) * idf")} AS tfidf
  FROM pl_out
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tf, doc_freq, tfidf, rank FROM ranked WHERE rank <= 3
"""


TFIDF_SQL = _tfidf_sql()


# --------------------------------------------------------------------------
# clean_corpus: keep documents with quality >= threshold, then drop the
# higher-id member of every near-duplicate pair (Jaccard >= 0.8) — the
# standard curation pipeline (quality gate -> dedup) as one query.
# --------------------------------------------------------------------------

def clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = quality_score(docs)
    dupes = (
        ngram_jaccard_pairs(docs, threshold=0.8, n=3)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return (
        scored.filter(F.col("quality") >= 0.55)
        .join(F.broadcast(dupes), "doc_id", "left_anti")
        .select("doc_id", "lang", "source", F.round("quality", 6).alias("quality_r"))
    )


CLEAN_CORPUS_SQL = r"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
q AS (
  SELECT d.doc_id, d.lang, d.source,
         0.4 * LEAST(len(t.toks) / 100.0, 1.0)
       + 0.3 * (1.0 - len(list_filter(t.toks,
                    x -> list_contains(['the','a','of','and'], x))) * 1.0 / len(t.toks))
       + 0.3 * LEAST((length(regexp_replace(d.text, '\s', '', 'g')) * 1.0
                      / len(t.toks)) / 8.0, 1.0) AS quality
  FROM documents d JOIN t ON d.doc_id = t.doc_id
),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(toks) - 2),
                       i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t WHERE len(toks) >= 3
),
e AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
c AS (SELECT doc_id, len(sh) AS n FROM s),
dupes AS (
  SELECT DISTINCT p.id_b AS doc_id FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
    FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ) p
  JOIN c c1 ON p.id_a = c1.doc_id
  JOIN c c2 ON p.id_b = c2.doc_id
  WHERE p.inter * 1.0 / (c1.n + c2.n - p.inter) >= 0.8
)
SELECT q.doc_id, q.lang, q.source, ROUND(q.quality, 6) AS quality_r
FROM q
WHERE q.quality >= 0.55
  AND q.doc_id NOT IN (SELECT doc_id FROM dupes)
"""


# --------------------------------------------------------------------------
# Winnowing (rolling-hash) fingerprints, MOSS-style: hash every word
# k-gram, slide a w-window over the hash sequence, keep each window's min,
# emit the distinct selected hashes per doc. Guarantees any shared run of
# >= k+w-1 tokens between two docs shares >= 1 fingerprint. The hash is a
# 16-hex-char md5 prefix — reproducible in DuckDB, so this is oracled
# (xxhash64 would not be). One shuffle (per-doc window sort).
# --------------------------------------------------------------------------

def winnow_fingerprint_docs(
    spark: SparkSession, sf_dir: str, k: int = 3, w: int = 4
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    from de4ml_spark.operators.text import zip_grams

    grams = zip_grams(toks, k)
    ex = docs.select("doc_id", F.posexplode(grams).alias("pos", "g")).withColumn(
        "h", F.substring(F.md5("g"), 1, 16)
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    part = Window.partitionBy("doc_id")
    return (
        ex.withColumn("mh", F.min("h").over(win))
        .withColumn("maxp", F.max("pos").over(part))
        .filter(F.col("pos") <= F.col("maxp") - (w - 1))
        .select("doc_id", F.col("mh").alias("fp"))
        .distinct()
    )


WINNOW_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g0 AS (
  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS pos
  FROM t WHERE len(toks) >= 3
),
g AS (
  SELECT doc_id, pos,
         substr(md5(array_to_string(toks[pos:pos+2], ' ')), 1, 16) AS h
  FROM g0
),
w AS (
  SELECT doc_id, pos,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
         MAX(pos) OVER (PARTITION BY doc_id) AS maxp
  FROM g
)
SELECT DISTINCT doc_id, mh AS fp FROM w WHERE pos <= maxp - 3
"""


# --------------------------------------------------------------------------
# Training-sequence packing (GPT-style concat-and-chunk): concatenate docs
# in doc_id order, chunk the token stream into fixed-budget sequences, and
# report each doc's starting sequence and token offset. A running-total
# window over token counts — one sort-shuffle.
#
# Scale note: a single global cumsum serializes into one partition. At
# 100 TB packing is done per shard (partitionBy(shard) in the window — each
# shard packs independently, offsets are shard-local), which is exactly how
# training data is sharded anyway. pack_sharded below IS that default
# layout, and the packing observability entry (pipelineq.
# pack_sequence_report) reports on it; this global variant is kept only as
# the oracle-parity twin of the serial formulation.
# --------------------------------------------------------------------------

SEQ_BUDGET = 512


def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    toks = F.size(tokens("text"))
    return (
        docs.select("doc_id", toks.alias("n_tokens"))
        .withColumn("offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            "doc_id",
            "n_tokens",
            "offset",
            (F.col("offset") / SEQ_BUDGET).cast("bigint").alias("seq_start"),
            ((F.col("offset") + F.col("n_tokens") - 1) / SEQ_BUDGET)
            .cast("bigint")
            .alias("seq_end"),
        )
    )


PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
o AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS "offset"
  FROM t
)
SELECT doc_id, n_tokens, CAST("offset" AS BIGINT) AS "offset",
       CAST(FLOOR("offset" / {SEQ_BUDGET}) AS BIGINT) AS seq_start,
       CAST(FLOOR(("offset" + n_tokens - 1) / {SEQ_BUDGET}) AS BIGINT) AS seq_end
FROM o
"""


# --------------------------------------------------------------------------
# End-to-end corpus-pipeline accounting: the flagship composition — raw ->
# quality gate -> near-dup drop -> benchmark-decontamination drop, with
# per-stage surviving doc and token counts. Each stage reuses the exact
# semantics of its standalone catalog entry (clean_corpus, dedup_ngram,
# decontaminate), so the report is the pipeline's audit trail.
# --------------------------------------------------------------------------


def corpus_pipeline_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage (docs_kept, tokens_kept) for the standard cleaning chain.

    Scale: one corpus scan feeds all stage predicates; the dedup and
    contamination drop-lists are DISTINCT doc-id relations (broadcast-
    able — they are bounded by pair/bench cardinality, not the corpus);
    the four stage aggregates union into one job."""
    from de4ml_spark.operators.text import quality_score
    from de4ml_spark.queries.textq3 import DECON_N, N_BENCH

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens("text")).cast("bigint")
    scored = quality_score(docs).select(
        "doc_id", n_tok.alias("n_tok"), "quality"
    )
    dupes = (
        ngram_jaccard_pairs(docs, threshold=0.8, n=3)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    from de4ml_spark.operators.dedup import shingles

    bench_sh = docs.filter(F.col("doc_id") < N_BENCH).select(
        F.explode(shingles("text", DECON_N)).alias("sh")
    ).distinct()
    contaminated = (
        docs.filter(F.col("doc_id") >= N_BENCH)
        .select("doc_id", F.explode(shingles("text", DECON_N)).alias("sh"))
        .join(F.broadcast(bench_sh), "sh", "left_semi")
        .select("doc_id")
        .distinct()
    )
    s1 = scored.filter(F.col("quality") >= 0.55)
    s2 = s1.join(F.broadcast(dupes), "doc_id", "left_anti")
    s3 = s2.join(F.broadcast(contaminated), "doc_id", "left_anti")

    def stage(df, idx: int, name: str):
        return df.agg(
            F.lit(idx).alias("stage_id"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("docs_kept"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).alias("tokens_kept"),
        )

    out = stage(scored, 0, "raw")
    for i, (df, name) in enumerate(
        [(s1, "quality"), (s2, "dedup"), (s3, "decontaminated")], start=1
    ):
        out = out.unionByName(stage(df, i, name))
    return out


def _pipeline_report_sql() -> str:
    from de4ml_spark.queries.textq3 import N_BENCH

    return rf"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
q AS (
  SELECT d.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tok,
         0.4 * LEAST(len(t.toks) / 100.0, 1.0)
       + 0.3 * (1.0 - len(list_filter(t.toks,
                    x -> list_contains(['the','a','of','and'], x))) * 1.0 / len(t.toks))
       + 0.3 * LEAST((length(regexp_replace(d.text, '\s', '', 'g')) * 1.0
                      / len(t.toks)) / 8.0, 1.0) AS quality
  FROM documents d JOIN t ON d.doc_id = t.doc_id
),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(toks) - 2),
                       i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t WHERE len(toks) >= 3
),
e AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
c AS (SELECT doc_id, len(sh) AS n FROM s),
dupes AS (
  SELECT DISTINCT p.id_b AS doc_id FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
    FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ) p
  JOIN c c1 ON p.id_a = c1.doc_id
  JOIN c c2 ON p.id_b = c2.doc_id
  WHERE p.inter * 1.0 / (c1.n + c2.n - p.inter) >= 0.8
),
bench_sh AS (
  SELECT DISTINCT shingle FROM e WHERE doc_id < {N_BENCH}
),
contaminated AS (
  SELECT DISTINCT e.doc_id FROM e
  JOIN bench_sh b ON e.shingle = b.shingle
  WHERE e.doc_id >= {N_BENCH}
),
s1 AS (SELECT * FROM q WHERE quality >= 0.55),
s2 AS (SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM dupes)),
s3 AS (SELECT * FROM s2
       WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))
SELECT 0 AS stage_id, 'raw' AS stage, COUNT(*) AS docs_kept,
       CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) AS tokens_kept FROM q
UNION ALL
SELECT 1, 'quality', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s1
UNION ALL
SELECT 2, 'dedup', COUNT(*), CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s2
UNION ALL
SELECT 3, 'decontaminated', COUNT(*),
       CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s3
"""


N_SHARDS = 8


def pack_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB packing path made executable: docs hash into
    ``N_SHARDS`` shards, each shard packs INDEPENDENTLY (shard-local
    cumsum window + shard-local sequence ids). The global variant above
    keeps one serial cumsum for oracle simplicity; this one is how
    training data is actually laid out — shards pack in parallel, and
    the only cross-shard artifact is the shard id in the sequence key."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = F.size(tokens("text"))
    return (
        docs.select(
            "doc_id",
            (F.col("doc_id") % N_SHARDS).alias("shard"),
            toks.cast("bigint").alias("n_tokens"),
        )
        .withColumn("offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            "offset",
            (F.col("offset") / SEQ_BUDGET).cast("bigint").alias("seq_start"),
            ((F.col("offset") + F.col("n_tokens") - 1) / SEQ_BUDGET)
            .cast("bigint")
            .alias("seq_end"),
        )
    )


PACK_SHARDED_SQL = f"""
WITH t AS (
  SELECT doc_id, doc_id % {N_SHARDS} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, shard, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS "offset"
  FROM t
)
SELECT doc_id, shard, n_tokens, "offset",
       CAST(FLOOR("offset" / {SEQ_BUDGET}) AS BIGINT) AS seq_start,
       CAST(FLOOR(("offset" + n_tokens - 1) / {SEQ_BUDGET}) AS BIGINT)
         AS seq_end
FROM o
"""


REGISTRY: dict[str, dict] = {
    "tfidf_top_terms": {"fn": tfidf_top_terms, "sql": TFIDF_SQL},
    "pack_sharded": {"fn": pack_sharded, "sql": PACK_SHARDED_SQL},
    "corpus_pipeline_report": {
        "fn": corpus_pipeline_report,
        "sql": _pipeline_report_sql(),
    },
    "clean_corpus": {"fn": clean_corpus, "sql": CLEAN_CORPUS_SQL},
    "winnow_fingerprint_docs": {"fn": winnow_fingerprint_docs, "sql": WINNOW_SQL},
    "pack_training_sequences": {
        "fn": pack_training_sequences,
        "sql": PACK_SQL,
    },
}
