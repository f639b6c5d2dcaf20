"""Third text tier: benchmark decontamination and PII scrubbing — two named
curation steps every production LLM data pipeline runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de4ml_spark.session import load_table

# --------------------------------------------------------------------------
# Decontamination: fraction of each "benchmark" document's n-gram shingles
# that appear anywhere else in the corpus. Docs with high containment are
# benchmark leaks and must be dropped from training data. Shape: shingle
# rows for benchmark docs LEFT SEMI join corpus shingle rows (id differs)
# -> per-doc containment ratio. The corpus side is the big relation; the
# join key is an 8-byte hash — the same scalable shingle equi-join as the
# dedup family (no cross join).
#
# Here the "benchmark" is doc_id < 20 (a stand-in eval set); in production
# it's the actual eval suites.
# --------------------------------------------------------------------------

N_BENCH = 20
DECON_N = 3


def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # hashed shingles are engine-local (xxhash64) — for ORACLE parity this
    # query uses the string-shingle path on the small benchmark side and
    # corpus side alike (strings only as join keys; still an equi-join)
    from de4ml_spark.operators.dedup import shingles

    bench = docs.filter(F.col("doc_id") < N_BENCH).select(
        "doc_id", F.explode(shingles("text", DECON_N)).alias("sh")
    )
    corpus = docs.select(
        F.col("doc_id").alias("c_id"), F.explode(shingles("text", DECON_N)).alias("sh")
    )
    hits = (
        bench.join(
            corpus, (bench["sh"] == corpus["sh"]) & (bench["doc_id"] != corpus["c_id"])
        )
        .select("doc_id", bench["sh"])
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    totals = bench.distinct().groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.round(
                F.coalesce("n_contaminated", F.lit(0)) / F.col("n_shingles"), 6
            ).alias("containment"),
        )
    )


DECON_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(toks) - 2),
                       i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t WHERE len(toks) >= 3
),
bench AS (
  SELECT doc_id, unnest(sh) AS sh FROM s WHERE doc_id < {N_BENCH}
),
corpus AS (SELECT doc_id AS c_id, unnest(sh) AS sh FROM s),
hits AS (
  SELECT DISTINCT b.doc_id, b.sh
  FROM bench b JOIN corpus c ON b.sh = c.sh AND b.doc_id <> c.c_id
),
hit_counts AS (
  SELECT doc_id, COUNT(*) AS n_contaminated FROM hits GROUP BY 1
),
totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM bench GROUP BY 1)
SELECT t2.doc_id, t2.n_shingles,
       COALESCE(h.n_contaminated, 0) AS n_contaminated,
       ROUND(COALESCE(h.n_contaminated, 0) * 1.0 / t2.n_shingles, 6)
         AS containment
FROM totals t2 LEFT JOIN hit_counts h ON t2.doc_id = h.doc_id
"""


# --------------------------------------------------------------------------
# Fraction-thresholded decontamination: per CORPUS doc, what fraction of
# its shingles appear in ANY benchmark doc, with the drop decision at
# >= 20% overlap — the doc-level screen real pipelines act on (the
# any-overlap variant above reports from the benchmark's perspective).
# Scale: the benchmark shingle set is bounded by benchmark size (always
# broadcastable); the corpus side is one explode + broadcast-hash join +
# map-side-combined groupBy — no shuffle of corpus text.
# --------------------------------------------------------------------------

DECON_FRAC_NUM, DECON_FRAC_DEN = 1, 5  # drop at overlap >= 1/5


def decontaminate_fraction_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.dedup import shingles
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    docs = load_table(spark, sf_dir, "documents")
    bench_sh = (
        docs.filter(F.col("doc_id") < N_BENCH)
        .select(F.explode(shingles("text", DECON_N)).alias("sh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    corpus = docs.filter(F.col("doc_id") >= N_BENCH).select(
        "doc_id", F.explode(shingles("text", DECON_N)).alias("sh")
    )
    per = (
        corpus.join(F.broadcast(bench_sh), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_overlap"),
        )
    )
    # the drop decision compares the RATIONAL (integer cross-multiply) so
    # the threshold is exact in both engines, never a rounded double
    return per.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        F.expr(exact_round_div_sql("n_overlap", "n_shingles", "DIV")).alias(
            "overlap_r"
        ),
        (
            F.col("n_overlap") * DECON_FRAC_DEN
            >= F.col("n_shingles") * DECON_FRAC_NUM
        ).alias("drop"),
    )


def _decon_frac_sql() -> str:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(toks) - 2),
                       i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t WHERE len(toks) >= 3
),
bench AS (
  SELECT DISTINCT unnest(sh) AS sh FROM s WHERE doc_id < {N_BENCH}
),
corpus AS (
  SELECT doc_id, unnest(sh) AS sh FROM s WHERE doc_id >= {N_BENCH}
),
per AS (
  SELECT c.doc_id, COUNT(*) AS n_shingles,
         COUNT(b.sh) AS n_overlap
  FROM corpus c LEFT JOIN bench b ON c.sh = b.sh
  GROUP BY c.doc_id
)
SELECT doc_id, n_shingles, n_overlap,
       {exact_round_div_sql('n_overlap', 'n_shingles', '//')} AS overlap_r,
       n_overlap * {DECON_FRAC_DEN} >= n_shingles * {DECON_FRAC_NUM} AS drop
FROM per
"""


# --------------------------------------------------------------------------
# PII scrubbing: redact email-like and long-digit-run tokens; report
# per-doc redaction counts. Pure regexp (JVM-side codegen) — dialect-simple
# patterns shared verbatim with the oracle.
# --------------------------------------------------------------------------

EMAIL_RE = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+"
DIGITS_RE = "[0-9]{7,}"


def pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
        DIGITS_RE,
        "<NUM>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(DIGITS_RE)).alias("n_digit_runs"),
        F.md5(scrubbed).alias("scrubbed_md5"),
        F.length(scrubbed).alias("scrubbed_len"),
    )


PII_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{DIGITS_RE}')) AS n_digit_runs,
       md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{DIGITS_RE}', '<NUM>', 'g')) AS scrubbed_md5,
       length(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                             '{DIGITS_RE}', '<NUM>', 'g')) AS scrubbed_len
FROM documents
"""


# --------------------------------------------------------------------------
# Unigram LM quality score (KenLM-lite): train corpus unigram
# log-probabilities, score each document by its mean token log-prob
# (~negative perplexity). Low scorers are gibberish/outliers. Two passes:
# term counts (one shuffle on term), then a broadcast join of the (small)
# vocabulary back onto exploded tokens. Decimal-exact mean for the oracle.
# --------------------------------------------------------------------------

def unigram_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logp = -portable_ln(total/tf) rounded by the exact floor form:
    ln(tf/total) with tf <= total is the negated ln of an integer ratio,
    so the whole model is libm-free and bit-identical across engines
    (portable_hash.with_portable_ln). The ln runs once per VOCAB entry
    (small frame), not per token — the token-level join only looks up
    the finished logp."""
    from de4ml_spark.operators.portable_hash import (
        round6_floor_sql,
        with_portable_ln,
    )
    from de4ml_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    vocab = terms.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    # corpus token total as a single-row broadcast scalar (the standard
    # scalar-join shape, one lazy DAG) — not a driver collect()
    total = vocab.agg(F.sum("tf").alias("_total"))
    model = with_portable_ln(
        vocab.crossJoin(F.broadcast(total)), "_total", "tf", "__pln"
    ).select(
        "term",
        F.expr(f"CAST(-{round6_floor_sql('__pln')} AS DECIMAL(12,6))").alias(
            "logp"
        ),
    )
    scored = terms.join(F.broadcast(model), "term")
    from de4ml_spark.operators.portable_hash import exact_round_neg_mean_sql

    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.expr(
            exact_round_neg_mean_sql("SUM(logp)", "COUNT(*)", "DIV")
        ).alias("mean_logp"),
    )


from de4ml_spark.operators.portable_hash import exact_round_neg_mean_sql as _ernm


def _unigram_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
        round6_floor_sql,
    )

    return f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
vocab AS (SELECT term, COUNT(*) AS tf FROM terms GROUP BY 1),
total AS (SELECT CAST(SUM(tf) AS BIGINT) AS n FROM vocab),
vt AS (SELECT v.term, v.tf, t.n FROM vocab v CROSS JOIN total t),
{portable_ln_duck_ctes("vt", "term", "n", "tf", "pln", "pl")},
model AS (
  SELECT term, CAST(-{round6_floor_sql('pln')} AS DECIMAL(12,6)) AS logp
  FROM pl_out
)
SELECT t.doc_id, COUNT(*) AS n_tokens,
       {_ernm('SUM(m.logp)', 'COUNT(*)', '//')} AS mean_logp
FROM terms t JOIN model m USING (term) GROUP BY t.doc_id
"""


UNIGRAM_SQL = _unigram_sql()


# --------------------------------------------------------------------------
# Language-ID confusion matrix: the n-gram heuristic's predictions against
# the labeled lang column — operator EVALUATION as a query (precision per
# language is the number a curation pipeline actually monitors).
# --------------------------------------------------------------------------

def lang_confusion_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.text import predict_lang

    docs = load_table(spark, sf_dir, "documents")
    return (
        predict_lang(docs)
        .groupBy(F.col("lang").alias("true_lang"), "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _confusion_sql() -> str:
    from de4ml_spark.queries.textq import LANG_ID_SQL

    return f"""
WITH preds AS ({LANG_ID_SQL})
SELECT d.lang AS true_lang, p.pred_lang, COUNT(*) AS n
FROM documents d JOIN preds p ON d.doc_id = p.doc_id
GROUP BY 1, 2
"""


REGISTRY: dict[str, dict] = {
    "decontaminate_docs": {"fn": decontaminate_docs, "sql": DECON_SQL},
    "decontaminate_fraction_docs": {
        "fn": decontaminate_fraction_docs,
        "sql": _decon_frac_sql(),
    },
    "pii_scrub_docs": {"fn": pii_scrub_docs, "sql": PII_SQL},
    "unigram_logprob_docs": {"fn": unigram_logprob_docs, "sql": UNIGRAM_SQL},
    "lang_confusion_docs": {"fn": lang_confusion_docs, "sql": _confusion_sql()},
}


# --------------------------------------------------------------------------
# Cluster-size distribution over the near-dup component graph, and session
# duration stats — second-order analytics on operator outputs.
# --------------------------------------------------------------------------

def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.dedup import connected_components, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, n=3).select("id_a", "id_b")
    comp = connected_components(pairs, docs, id_col="doc_id")
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    return sizes.groupBy("size").agg(F.count(F.lit(1)).alias("n_clusters"))


def _cluster_sizes_sql() -> str:
    from de4ml_spark.queries.dedupq import DEDUP_COMPONENTS_SQL

    return f"""
WITH comp AS ({DEDUP_COMPONENTS_SQL}),
sizes AS (SELECT component, COUNT(*) AS size FROM comp GROUP BY component)
SELECT size, COUNT(*) AS n_clusters FROM sizes GROUP BY size
"""


def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Means use the engine-exact integer rounding (portable_hash
    docstrings): event counts and micro-grid durations are integers, so
    ROUND(AVG(...)) on the double quotient sits exactly on half
    boundaries for a large fraction of inputs — the seconds mean rounds
    in integer MICROS then scales (round(avg_us)/1e6 == round(avg_s, 6))."""
    from de4ml_spark.operators.portable_hash import exact_round_div_sql
    from de4ml_spark.operators.sessions import sessionize

    ev = load_table(spark, sf_dir, "events")
    sessions = sessionize(ev, key="user_id", ts_col="ts", gap="30 minutes")
    dur_us = F.unix_micros(
        F.col("session_end").cast("timestamp")
    ) - F.unix_micros(F.col("session_start").cast("timestamp"))
    return sessions.select("n_events", dur_us.alias("dur_us")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.expr(
            exact_round_div_sql("SUM(n_events)", "COUNT(*)", "DIV")
        ).alias("avg_events"),
        F.expr(
            "CAST((SUM(dur_us) * 2 + COUNT(*)) DIV (2 * COUNT(*))"
            " AS DOUBLE) / 1000000.0"
        ).alias("avg_duration_s"),
        (F.max("dur_us") / F.lit(1_000_000.0)).alias("max_duration_s"),
    )


def _session_stats_sql() -> str:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql
    from de4ml_spark.queries.textq import SESSIONIZE_SQL

    avg_events = exact_round_div_sql("SUM(n_events)", "COUNT(*)", "//")
    return f"""
WITH sessions AS ({SESSIONIZE_SQL}),
d AS (
  SELECT n_events,
         epoch_us(session_end) - epoch_us(session_start) AS dur_us
  FROM sessions
)
SELECT COUNT(*) AS n_sessions,
       {avg_events} AS avg_events,
       ((SUM(dur_us) * 2 + COUNT(*)) // (2 * COUNT(*))) / 1000000.0
         AS avg_duration_s,
       MAX(dur_us) / 1000000.0 AS max_duration_s
FROM d
"""


REGISTRY["dedup_cluster_sizes"] = {
    "fn": dedup_cluster_sizes,
    "sql": _cluster_sizes_sql(),
}
REGISTRY["session_stats"] = {"fn": session_stats, "sql": _session_stats_sql()}


# --------------------------------------------------------------------------
# Bigram LM scoring with add-1 smoothing: p(w2|w1) = (c(w1 w2) + 1) /
# (c(w1) + V). Mean bigram log-prob per doc approximates perplexity — the
# KenLM-style fluency filter one step up from the unigram score. Shape:
# bigrams form MAP-ONLY (arrays_zip of the token array against its own
# 1-shifted slice — adjacency is row-local, so no posexplode + per-doc
# LEAD window and no token-row shuffle); counts via two groupBys; scoring
# via a broadcast join of the bigram table (vocab ≪ corpus at any scale —
# n-gram count tables grow sublinearly). Decimal-exact mean for the oracle.
# --------------------------------------------------------------------------

def bigram_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, n1).alias("w1"),
                F.slice(toks, 2, n1).alias("w2"),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    uni = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    bi = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    vocab_size = docs.select(F.explode(tokens("text")).alias("t")).agg(
        F.count_distinct("t").alias("_vocab")
    )
    # add-one smoothing: ln((c12+1)/(c1+V)) with c12+1 <= c1+V is the
    # negated portable ln of an integer ratio — libm-free, bit-identical
    # across engines; runs once per distinct bigram, not per instance
    from de4ml_spark.operators.portable_hash import (
        round6_floor_sql,
        with_portable_ln,
    )

    model = with_portable_ln(
        bi.join(F.broadcast(uni), "w1").crossJoin(F.broadcast(vocab_size)),
        "c1 + _vocab",
        "c12 + 1",
        "__pln",
    ).select(
        "w1",
        "w2",
        F.expr(f"CAST(-{round6_floor_sql('__pln')} AS DECIMAL(12,6))").alias(
            "logp"
        ),
    )
    return (
        bigrams.join(F.broadcast(model), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr(
                _ernm("SUM(logp)", "COUNT(*)", "DIV")
            ).alias("mean_logp"),
        )
    )


def _bigram_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
        round6_floor_sql,
    )

    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
pos AS (
  SELECT doc_id, unnest(ts) AS w1,
         generate_subscripts(ts, 1) AS pos, len(ts) AS n
  FROM toks
),
bigrams AS (
  SELECT p.doc_id, p.w1,
         LEAD(p.w1) OVER (PARTITION BY p.doc_id ORDER BY p.pos) AS w2
  FROM pos p
  QUALIFY w2 IS NOT NULL
),
uni AS (SELECT w1, COUNT(*) AS c1 FROM bigrams GROUP BY 1),
bi AS (SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY 1, 2),
v AS (
  SELECT COUNT(DISTINCT t) AS vocab
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
),
m0 AS (
  SELECT bi.w1, bi.w2, bi.c12, uni.c1, v.vocab
  FROM bi JOIN uni USING (w1) CROSS JOIN v
),
{portable_ln_duck_ctes("m0", "w1, w2", "c1 + vocab", "c12 + 1", "pln", "pl")},
model AS (
  SELECT w1, w2, CAST(-{round6_floor_sql('pln')} AS DECIMAL(12,6)) AS logp
  FROM pl_out
)
SELECT b.doc_id, COUNT(*) AS n_bigrams,
       {_ernm('SUM(m.logp)', 'COUNT(*)', '//')} AS mean_logp
FROM bigrams b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
GROUP BY b.doc_id
"""


BIGRAM_SQL = _bigram_sql()


REGISTRY["bigram_logprob_docs"] = {
    "fn": bigram_logprob_docs,
    "sql": BIGRAM_SQL,
}


# --------------------------------------------------------------------------
# BM25 lexical search: score all documents for a fixed term query, top 20.
# Standard Okapi BM25 (k1=1.2, b=0.75): idf(t) * tf*(k1+1)/(tf + k1*(1-b+
# b*dl/avgdl)). Shape: explode -> (doc, term) tf -> filter to query terms
# (broadcastable tiny set) -> join df/avgdl scalars -> per-doc sum.
# The sparse-retrieval half of the hybrid stack (knn_rrf_fusion is the
# fusion; knn_* the dense half).
# --------------------------------------------------------------------------

BM25_TERMS = ["data", "model", "learning"]
BM25_K1, BM25_B = 1.2, 0.75


def _bm25_score_sql(idf: str, n: str, td: str) -> str:
    """Per-(doc, term) Okapi BM25 score as engine-portable SQL text: the
    idf is the portable ln of (2N+2)/(2df+1) — algebraically equal to the
    standard ln((N-df+0.5)/(df+0.5) + 1) — and dl/avgdl is the exact
    rational dl*N/total_dl as one correctly-rounded division, so given
    the same column values both engines produce bit-identical doubles.
    Constant literals come from repr() so both parsers see the same text."""
    k1p1, k1, one_b, b = (
        repr(BM25_K1 + 1.0),
        repr(BM25_K1),
        repr(1.0 - BM25_B),
        repr(BM25_B),
    )
    return (
        f"(({idf} * CAST(tf AS DOUBLE) * CAST({k1p1} AS DOUBLE))"
        f" / (CAST(tf AS DOUBLE) + CAST({k1} AS DOUBLE)"
        f" * (CAST({one_b} AS DOUBLE) + CAST({b} AS DOUBLE)"
        f" * (CAST(dl * {n} AS DOUBLE) / CAST({td} AS DOUBLE)))))"
    )


def bm25_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term scores quantize to integer micro-units before the per-doc
    sum, so the aggregate is exact integer arithmetic (a double SUM's
    addition order is engine- and partitioning-dependent); the idf is the
    portable ln — no libm in the ranking path."""
    from de4ml_spark.operators.portable_hash import with_portable_ln
    from de4ml_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    lengths = docs.select("doc_id", F.size(tokens("text")).alias("dl"))
    # corpus-level totals as one single-row broadcast scalar frame —
    # keeps the entry one lazy DAG, not a driver collect()
    stats = lengths.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.sum("dl").cast("bigint").alias("_total_dl"),
    )
    terms = docs.select("doc_id", F.explode(tokens("text")).alias("term")).filter(
        F.col("term").isin(BM25_TERMS)
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    joined = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lengths, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    scored = with_portable_ln(
        joined, "2 * _n_docs + 2", "2 * df + 1", "__idf"
    ).withColumn(
        "__sm",
        F.expr(
            "CAST(floor("
            + _bm25_score_sql("__idf", "_n_docs", "_total_dl")
            + " * 1000000.0 + 0.5) AS BIGINT)"
        ),
    )
    from pyspark.sql import Window

    ranked = (
        scored.groupBy("doc_id")
        .agg(
            F.expr(
                "CAST(CAST(SUM(__sm) AS BIGINT) AS DOUBLE) / 1000000.0"
            ).alias("bm25")
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
            ),
        )
        .filter(F.col("rank") <= 20)
    )
    return ranked


def _bm25_sql() -> str:
    from de4ml_spark.operators.portable_hash import portable_ln_duck_ctes

    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH lengths AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST((SELECT SUM(dl) FROM lengths) AS BIGINT) AS total_dl
  FROM documents
),
t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM t
  WHERE term IN ({terms}) GROUP BY 1, 2
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
j AS (
  SELECT tf.doc_id, tf.tf, d.df, l.dl, s.n_docs, s.total_dl
  FROM tf
  JOIN dfreq d USING (term)
  JOIN lengths l USING (doc_id)
  CROSS JOIN stats s
),
{portable_ln_duck_ctes(
    "j", "doc_id, tf, dl, n_docs, total_dl",
    "2 * n_docs + 2", "2 * df + 1", "idf", "pl")},
scored AS (
  SELECT doc_id,
         CAST(floor({_bm25_score_sql("idf", "n_docs", "total_dl")}
              * 1000000.0 + 0.5) AS BIGINT) AS sm
  FROM pl_out
)
SELECT doc_id, CAST(CAST(SUM(sm) AS BIGINT) AS DOUBLE) / 1000000.0 AS bm25,
       ROW_NUMBER() OVER (
           ORDER BY CAST(CAST(SUM(sm) AS BIGINT) AS DOUBLE) / 1000000.0 DESC,
                    doc_id ASC) AS rank
FROM scored
GROUP BY doc_id
QUALIFY rank <= 20
"""


REGISTRY["bm25_search_docs"] = {"fn": bm25_search_docs, "sql": _bm25_sql()}


# --------------------------------------------------------------------------
# Sparse TF-IDF document similarity: top-3 nearest docs per query doc by
# tf-idf inner product — the text-side counterpart of the embedding knn.
# Shape: (doc, term, w) weights -> equi-join on term restricted to query
# docs on the left (the scalable sparse dot product: cost is sum over
# shared terms, never |D|^2) -> per-pair sum -> top-k window.
# --------------------------------------------------------------------------

N_TFIDF_QUERIES = 10
TFIDF_TOPK = 3


def tfidf_doc_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weights are the portable-ln idf quantized to integer MICRO units
    before the dot product, so the similarity sum is exact DECIMAL
    integer arithmetic — a double SUM's addition order differs between
    engines (and between Spark partitionings), which made the old form
    hash-stable only by luck; the micro-unit sum is order-independent."""
    from pyspark.sql import Window

    from de4ml_spark.operators.portable_hash import with_portable_ln
    from de4ml_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).alias("_n_docs"))
    terms = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    joined = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(n))
    wts = with_portable_ln(joined, "_n_docs", "df", "__idf").select(
        "doc_id",
        "term",
        F.expr(
            "CAST(floor(CAST(tf AS DOUBLE) * __idf * 1000000.0 + 0.5)"
            " AS BIGINT)"
        ).alias("wm"),
    )
    q = wts.filter(F.col("doc_id") < N_TFIDF_QUERIES).select(
        F.col("doc_id").alias("query_id"), "term", F.col("wm").alias("qwm")
    )
    from de4ml_spark.operators.portable_hash import exact_round_div_sql_wide

    sims = (
        q.join(wts, "term")
        .filter(F.col("query_id") != F.col("doc_id"))
        .groupBy("query_id", F.col("doc_id").alias("neighbor_id"))
        .agg(
            F.sum(
                F.col("qwm").cast("decimal(19,0)")
                * F.col("wm").cast("decimal(19,0)")
            ).alias("__s")
        )
        .withColumn(
            "sim",
            F.expr(exact_round_div_sql_wide("__s", "1000000000000", "DIV")),
        )
        .drop("__s")
    )
    wnd = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= TFIDF_TOPK)
    )


def _tfidf_sim_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql_wide,
        portable_ln_duck_ctes,
    )

    return f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
j AS (
  SELECT tf.doc_id, tf.term, tf.tf, d.df, n.n_docs
  FROM tf JOIN dfreq d USING (term) CROSS JOIN n
),
{portable_ln_duck_ctes("j", "doc_id, term, tf", "n_docs", "df", "idf", "pl")},
wts AS (
  SELECT doc_id, term,
         CAST(floor(CAST(tf AS DOUBLE) * idf * 1000000.0 + 0.5) AS BIGINT)
           AS wm
  FROM pl_out
),
sims AS (
  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
         SUM(CAST(q.wm AS DECIMAL(19,0)) * CAST(c.wm AS DECIMAL(19,0))) AS s
  FROM wts q JOIN wts c ON q.term = c.term AND q.doc_id <> c.doc_id
  WHERE q.doc_id < {N_TFIDF_QUERIES}
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id,
       {exact_round_div_sql_wide("s", "1000000000000", "//")} AS sim,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY {exact_round_div_sql_wide(
                              "s", "1000000000000", "//")} DESC,
                          neighbor_id ASC) AS rank
FROM sims
QUALIFY rank <= {TFIDF_TOPK}
"""


TFIDF_SIM_SQL = _tfidf_sim_sql()


REGISTRY["tfidf_doc_similarity"] = {
    "fn": tfidf_doc_similarity,
    "sql": TFIDF_SIM_SQL,
}


# --------------------------------------------------------------------------
# Blocked-Bloom decontamination: the benchmark shingle set compiled into
# a 256-block x 62-bit Bloom filter (two portable-hash bit positions per
# shingle, block masks built with the BIT_OR aggregate), then every
# corpus doc probed against the broadcast filter. This is the
# constant-size alternative to shipping the full benchmark shingle set
# (textq3.decontaminate_*): at 100 TB the filter is 2 KB regardless of
# benchmark size, the probe is a broadcast join on the block id followed
# by two AND-mask tests, and filters from different benchmark shards
# merge by OR — the sketch algebra. False positives overcount
# contamination (safe direction for a drop-screen); the exact semi-join
# variants remain for the final pass. All hashes are the portable md5
# family, so the filter bits — and therefore every count — are
# bit-identical across engines.
# --------------------------------------------------------------------------

BLOOM_BLOCKS = 256
BLOOM_BITS = 62  # keep bit 63 clear: masks stay positive BIGINT


def bloom_decontaminate_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.dedup import shingles
    from de4ml_spark.operators.portable_hash import phash_spark_sql

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(shingles("text", DECON_N)).alias("sh")
    ).distinct()
    h_blk = phash_spark_sql("concat(sh, '_blk')", 20)
    h_b1 = phash_spark_sql("concat(sh, '_b1')", 20)
    h_b2 = phash_spark_sql("concat(sh, '_b2')", 20)
    keyed = sh.selectExpr(
        "doc_id",
        f"{h_blk} % {BLOOM_BLOCKS} AS blk",
        f"shiftleft(CAST(1 AS BIGINT), CAST({h_b1} % {BLOOM_BITS} AS INT))"
        f" | shiftleft(CAST(1 AS BIGINT), CAST({h_b2} % {BLOOM_BITS} AS INT))"
        " AS bits",
    )
    bloom = (
        keyed.filter(F.col("doc_id") < N_BENCH)
        .groupBy("blk")
        .agg(F.expr("bit_or(bits)").alias("mask"))
    )
    probed = keyed.join(F.broadcast(bloom), "blk", "left").select(
        "doc_id",
        (
            F.coalesce(F.col("mask"), F.lit(0)).bitwiseAND(F.col("bits"))
            == F.col("bits")
        ).cast("int").alias("hit"),
    )
    return probed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.expr("CAST(SUM(hit) AS BIGINT)").alias("n_hits"),
        F.expr(
            f"SUM(hit) * {DECON_FRAC_DEN} >="
            f" COUNT(1) * {DECON_FRAC_NUM}"
        ).alias("flagged"),
    )


def _bloom_decon_sql() -> str:
    from de4ml_spark.operators.portable_hash import phash_duck_sql

    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id,
         unnest(list_distinct(
           list_transform(generate_series(1, len(toks) - {DECON_N - 1}),
                          i -> array_to_string(toks[i:i+{DECON_N - 1}], ' '))))
           AS sh
  FROM t WHERE len(toks) >= {DECON_N}
),
keyed AS (
  SELECT doc_id,
         {phash_duck_sql("sh || '_blk'", 20)} % {BLOOM_BLOCKS} AS blk,
         (CAST(1 AS BIGINT)
            << CAST({phash_duck_sql("sh || '_b1'", 20)}
                    % {BLOOM_BITS} AS INT))
         | (CAST(1 AS BIGINT)
            << CAST({phash_duck_sql("sh || '_b2'", 20)}
                    % {BLOOM_BITS} AS INT)) AS bits
  FROM s
),
bloom AS (
  SELECT blk, bit_or(bits) AS mask
  FROM keyed WHERE doc_id < {N_BENCH}
  GROUP BY 1
),
probed AS (
  SELECT k.doc_id,
         CAST((COALESCE(b.mask, 0) & k.bits) = k.bits AS INT) AS hit
  FROM keyed k LEFT JOIN bloom b USING (blk)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(hit) AS BIGINT) AS n_hits,
       SUM(hit) * {DECON_FRAC_DEN} >= COUNT(*) * {DECON_FRAC_NUM}
         AS flagged
FROM probed
GROUP BY 1
"""


REGISTRY["bloom_decontaminate_docs"] = {
    "fn": bloom_decontaminate_docs,
    "sql": _bloom_decon_sql(),
}


# --------------------------------------------------------------------------
# Zipf slope per document source: OLS of ln(freq) on ln(rank) over the
# top ZIPF_TOPN terms — the power-law exponent that tells a corpus
# curator whether a source's vocabulary behaves like natural language
# (slope ≈ −1) or like templated/generated text (flatter/steeper).
# Exactness: ranks are deterministic (freq DESC, term), both logs come
# from the portable-ln primitive (ln(rank) = ln(rank/1), ln(freq)),
# each regression term is half-up micro-quantized BEFORE the sums, and
# the OLS slope is assembled from exact integer moments with one
# engine-identical divide. Scale: one token groupBy per source; the
# regression runs over ZIPF_TOPN rows per source.
# --------------------------------------------------------------------------

ZIPF_TOPN = 100


def zipf_slope_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from de4ml_spark.operators.portable_hash import with_portable_ln
    from de4ml_spark.operators.text import tokens
    from de4ml_spark.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    freqs = (
        docs.select(
            "source", F.explode(tokens("text")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    wr = Window.partitionBy("source").orderBy(
        F.desc("freq"), F.col("tok")
    )
    top = freqs.withColumn("rank", F.row_number().over(wr)).filter(
        F.col("rank") <= ZIPF_TOPN
    )
    with_lr = with_portable_ln(top, "rank", "1", "__lnr")
    with_lf = with_portable_ln(
        with_lr.selectExpr("source", "freq", "rank", "__lnr"),
        "freq",
        "1",
        "__lnf",
    )
    quant = with_lf.selectExpr(
        "source",
        "CAST(floor(__lnr * 1000000.0 + 0.5) AS BIGINT) AS x_u",
        "CAST(floor(__lnf * 1000000.0 + 0.5) AS BIGINT) AS y_u",
    )
    m = quant.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x_u").cast("bigint").alias("sx"),
        F.sum("y_u").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(x_u AS DECIMAL(38,0)) * x_u")).alias("sxx"),
        F.sum(F.expr("CAST(x_u AS DECIMAL(38,0)) * y_u")).alias("sxy"),
    )
    from de4ml_spark.operators.portable_hash import (
        wide_to_double_sql as _w2d,
    )

    return m.selectExpr(
        "source",
        "n",
        "CAST(n AS DECIMAL(38,0)) * sxy"
        " - CAST(sx AS DECIMAL(38,0)) * sy AS _num_w",
        "CAST(n AS DECIMAL(38,0)) * sxx"
        " - CAST(sx AS DECIMAL(38,0)) * sx AS _den_w",
    ).selectExpr(
        "source",
        "n",
        _w2d("_num_w", "DIV") + " AS _num",
        _w2d("_den_w", "DIV") + " AS _den",
    ).selectExpr(
        "source",
        "n",
        "CASE WHEN _den = 0.0D THEN NULL ELSE _num / _den END"
        " AS zipf_slope_r",
    )


def _zipf_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        portable_ln_duck_ctes,
        wide_to_double_sql as _w2d,
    )

    return f"""
WITH freqs AS (
  SELECT source, tok, COUNT(*) AS freq
  FROM (
    SELECT source, unnest(string_split(text, ' ')) AS tok
    FROM documents
  ) WHERE tok <> ''
  GROUP BY 1, 2
),
top AS (
  SELECT source, freq, rank FROM (
    SELECT source, freq,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY freq DESC, tok) AS rank
    FROM freqs
  ) WHERE rank <= {ZIPF_TOPN}
),
{portable_ln_duck_ctes("top", "source, freq, rank", "rank", "1",
                       "lnr", "plr")},
{portable_ln_duck_ctes("plr_out", "source, freq, rank, lnr", "freq",
                       "1", "lnf", "plf")},
quant AS (
  SELECT source,
         CAST(floor(lnr * 1000000.0 + 0.5) AS BIGINT) AS x_u,
         CAST(floor(lnf * 1000000.0 + 0.5) AS BIGINT) AS y_u
  FROM plf_out
),
m AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x_u) AS BIGINT) AS sx,
         CAST(SUM(y_u) AS BIGINT) AS sy,
         SUM(CAST(x_u AS HUGEINT) * x_u) AS sxx,
         SUM(CAST(x_u AS HUGEINT) * y_u) AS sxy
  FROM quant GROUP BY 1
),
projected AS (
  SELECT source, n,
         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num_w,
         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den_w
  FROM m
),
conv AS (
  SELECT source, n, {_w2d("num_w", "//")} AS numd,
         {_w2d("den_w", "//")} AS dend
  FROM projected
)
SELECT source, n,
       CASE WHEN dend = 0.0 THEN NULL ELSE numd / dend END
         AS zipf_slope_r
FROM conv
"""


REGISTRY["zipf_slope_docs"] = {
    "fn": zipf_slope_docs,
    "sql": _zipf_sql(),
}


# --------------------------------------------------------------------------
# RAKE keyword extraction over the corpus: candidate phrases are
# maximal stopword-free token runs (segmented by a per-doc cumulative
# stopword count — the gaps-and-islands trick, windows per-doc only);
# word score = degree/frequency where degree sums the lengths of
# every phrase containing the word; phrase score sums its members'
# scores. Word scores are HALF-UP micro-quantized 128-bit quotients
# so the phrase-score sums are exact integers (identical ranking both
# engines); output is the top 25 phrases under the deterministic
# (score DESC, phrase) order. Reference parity: the reference has no
# keyword extractor; this extends its text-quality tier
# (dataops/app/profile.py) with the standard corpus-keyword readout.
# Scale: two corpus groupBys (phrase members, word stats) + a
# broadcast-joinable word-score table.
# --------------------------------------------------------------------------


def rake_keywords_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from de4ml_spark.operators.portable_hash import (
        wide_halfup_div_sql as _whd,
        wide_to_double_sql as _w2d,
    )
    from de4ml_spark.operators.text import STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    toks = docs.selectExpr(
        "doc_id", "posexplode(split(text, ' ')) AS (pos, word)"
    ).selectExpr(
        "doc_id",
        "pos",
        "word",
        f"CAST(word IN ({stop_list}) OR word = '' AS BIGINT) AS is_stop",
    )
    wseg = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    members = (
        toks.withColumn("seg", F.sum("is_stop").over(wseg))
        .filter("is_stop = 0")
        .select("doc_id", "seg", "pos", "word")
    )
    phrases = members.groupBy("doc_id", "seg").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(pos, word))), x -> x.word), ' ')"
        ).alias("phrase"),
        F.count(F.lit(1)).cast("bigint").alias("plen"),
    )
    wstats = (
        members.join(phrases, ["doc_id", "seg"])
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("plen").cast("bigint").alias("deg"),
        )
        .selectExpr(
            "word",
            f"{_whd('CAST(deg AS DECIMAL(38,0)) * 1000000', 'freq', 'DIV')}"
            " AS score_u_w",
        )
    )
    pscore = (
        members.join(phrases, ["doc_id", "seg"])
        .join(wstats, "word")
        .groupBy("doc_id", "seg", "phrase")
        .agg(F.sum("score_u_w").alias("score_u"))
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occ"),
            F.max("score_u").alias("score_u"),
        )
    )
    return (
        pscore.selectExpr(
            "phrase",
            "n_occ",
            f"{_w2d('score_u', 'DIV')} / 1000000.0 AS rake_score",
        )
        .orderBy(F.col("rake_score").desc(), "phrase")
        .limit(25)
    )


def _rake_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        wide_halfup_div_sql as _whd,
        wide_to_double_sql as _w2d,
    )
    from de4ml_spark.operators.text import STOPWORDS

    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH toks AS (
  SELECT doc_id, pos, word,
         CASE WHEN word IN ({stop_list}) OR word = ''
              THEN 1 ELSE 0 END AS is_stop
  FROM (
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents
  )
),
members AS (
  SELECT doc_id, pos, word,
         SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
  FROM toks
  QUALIFY is_stop = 0
),
phrases AS (
  SELECT doc_id, seg,
         string_agg(word, ' ' ORDER BY pos) AS phrase,
         CAST(COUNT(*) AS BIGINT) AS plen
  FROM members GROUP BY 1, 2
),
wstats AS (
  SELECT word,
         {_whd("CAST(SUM(plen) AS HUGEINT) * 1000000",
               "COUNT(*)", "//")} AS score_u_w
  FROM members m JOIN phrases p USING (doc_id, seg)
  GROUP BY 1
),
pscore AS (
  SELECT phrase,
         CAST(COUNT(*) AS BIGINT) AS n_occ,
         MAX(score_u) AS score_u
  FROM (
    SELECT m.doc_id, m.seg, p.phrase, SUM(w.score_u_w) AS score_u
    FROM members m
    JOIN phrases p USING (doc_id, seg)
    JOIN wstats w USING (word)
    GROUP BY 1, 2, 3
  )
  GROUP BY 1
)
SELECT phrase, n_occ,
       {_w2d("score_u", "//")} / 1000000.0 AS rake_score
FROM pscore
ORDER BY rake_score DESC, phrase
LIMIT 25
"""


REGISTRY["rake_keywords_docs"] = {
    "fn": rake_keywords_docs,
    "sql": _rake_sql(),
}


# --------------------------------------------------------------------------
# Simpson diversity of each source's token distribution: the
# repeat-rate λ = Σ tf·(tf−1) / (T·(T−1)) and its complement D = 1−λ
# — the ln-free companion to entropy_by_source (a collapsed D flags
# templated/boilerplate sources even when the vocabulary is large).
# Both numerator and denominator are exact 128-bit integers; one
# wide_to_double ratio. Scale: one vocab groupBy per source.
# --------------------------------------------------------------------------


def simpson_diversity_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        wide_to_double_sql as _w2d,
    )
    from de4ml_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            "source", F.explode(tokens("text")).alias("term")
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    agg = vocab.groupBy("source").agg(
        F.sum("tf").cast("bigint").alias("t_tokens"),
        F.sum(
            F.expr("CAST(tf AS DECIMAL(38,0)) * (tf - 1)")
        ).alias("rep"),
    )
    # NULLIF: a one-token source zeroes T-1 — ANSI DIVIDE_BY_ZERO on
    # Spark; lambda undefined there, NULL on both engines (round-14
    # empty-text parity probe)
    lam = (
        f"{_w2d('rep', 'DIV')} / NULLIF(CAST(t_tokens AS DOUBLE)"
        " * CAST(t_tokens - 1 AS DOUBLE), 0.0)"
    )
    return agg.selectExpr(
        "source",
        "t_tokens",
        f"{lam} AS simpson_lambda",
        f"1.0 - {lam} AS simpson_diversity",
    ).orderBy("source")


def _simpson_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        wide_to_double_sql as _w2d,
    )

    lam = (
        f"{_w2d('rep', '//')} / NULLIF(CAST(t_tokens AS DOUBLE)"
        " * CAST(t_tokens - 1 AS DOUBLE), 0.0)"
    )
    return f"""
WITH terms AS (
  SELECT source, unnest(string_split(text, ' ')) AS term
  FROM documents
),
vocab AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM terms GROUP BY 1, 2
),
agg AS (
  SELECT source,
         CAST(SUM(tf) AS BIGINT) AS t_tokens,
         SUM(CAST(tf AS HUGEINT) * (tf - 1)) AS rep
  FROM vocab GROUP BY 1
)
SELECT source, t_tokens,
       {lam} AS simpson_lambda,
       1.0 - {lam} AS simpson_diversity
FROM agg
ORDER BY source
"""


REGISTRY["simpson_diversity_sources"] = {
    "fn": simpson_diversity_sources,
    "sql": _simpson_sql(),
}


# --------------------------------------------------------------------------
# Term burstiness (Church-Gale dispersion): for the top-50 corpus
# terms, the index of dispersion D = var/mean of the per-DOCUMENT
# term frequency (zeros included) — D ≈ 1 is Poisson scatter, D ≫ 1
# marks topical/bursty terms, the classic content-vs-function-word
# separator. With N docs, s = Σtf and ss = Σtf² over occupied docs
# only, the zero-inflated population moments collapse to
# D = (N·ss − s²) / (N·s) — exact 128-bit integers, one
# wide_to_double ratio. Top-50 by (s DESC, term). Scale: one
# (term × doc) groupBy; moments per term.
# --------------------------------------------------------------------------

BURST_TOPK = 50


def term_burstiness_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        wide_to_double_sql as _w2d,
    )
    from de4ml_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    per = (
        docs.select(
            "doc_id", F.explode(tokens("text")).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    mom = per.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ_docs"),
        F.sum("tf").cast("bigint").alias("s"),
        F.sum(F.expr("CAST(tf AS DECIMAL(38,0)) * tf")).alias("ss"),
    )
    top = (
        mom.orderBy(F.desc("s"), F.col("term"))
        .limit(BURST_TOPK)
        .crossJoin(F.broadcast(n_docs))
    )
    return top.selectExpr(
        "term",
        "n_occ_docs",
        "s AS total_tf",
        f"""{_w2d("CAST(n_docs AS DECIMAL(38,0)) * ss"
                  " - CAST(s AS DECIMAL(38,0)) * s", "DIV")}
           / (CAST(n_docs AS DOUBLE) * CAST(s AS DOUBLE))
           AS dispersion""",
    ).orderBy(F.desc("total_tf"), "term")


def _burstiness_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        wide_to_double_sql as _w2d,
    )

    return f"""
WITH nd AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
),
per AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term
    FROM documents
  )
  GROUP BY 1, 2
),
mom AS (
  SELECT term,
         CAST(COUNT(*) AS BIGINT) AS n_occ_docs,
         CAST(SUM(tf) AS BIGINT) AS s,
         SUM(CAST(tf AS HUGEINT) * tf) AS ss
  FROM per GROUP BY 1
),
top AS (
  SELECT * FROM mom CROSS JOIN nd
  ORDER BY s DESC, term
  LIMIT {BURST_TOPK}
)
SELECT term, n_occ_docs, s AS total_tf,
       {_w2d("CAST(n_docs AS HUGEINT) * ss"
             " - CAST(s AS HUGEINT) * s", "//")}
         / (CAST(n_docs AS DOUBLE) * CAST(s AS DOUBLE))
         AS dispersion
FROM top
ORDER BY total_tf DESC, term
"""


REGISTRY["term_burstiness_docs"] = {
    "fn": term_burstiness_docs,
    "sql": _burstiness_sql(),
}


# --------------------------------------------------------------------------
# Contamination SPAN length per corpus doc: the longest run of
# CONSECUTIVE shingle positions matched by the benchmark set — the
# span-level report serious decontamination uses (a doc with 15%
# scattered shingle hits is noise; one with a 50-gram contiguous match
# embeds a benchmark verbatim). Positional (non-distinct) shingles
# feed an islands grouping — pos − row_number over matched positions
# per doc — so each contiguous run becomes one group; max run + the
# n−1 gram overhang reports the span in TOKENS. Benchmark shingles
# stay a broadcast set (bounded by benchmark size); the corpus side is
# one explode + broadcast-hash join + doc-partitioned window — no
# corpus-text shuffle, same posture as the fraction screen above.
# --------------------------------------------------------------------------


def contamination_span_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from de4ml_spark.operators.text import tokens, zip_grams

    docs = load_table(spark, sf_dir, "documents")
    bench_sh = (
        docs.filter(F.col("doc_id") < N_BENCH)
        .select(
            F.explode(
                F.array_distinct(zip_grams(tokens("text"), DECON_N))
            ).alias("sh")
        )
        .distinct()
    )
    corpus = docs.filter(F.col("doc_id") >= N_BENCH).select(
        "doc_id",
        F.posexplode(zip_grams(tokens("text"), DECON_N)).alias(
            "pos", "sh"
        ),
    )
    totals = corpus.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    hits = corpus.join(F.broadcast(bench_sh), "sh").select(
        "doc_id", "pos"
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        hits.withColumn("grp", F.col("pos") - F.row_number().over(wd))
        .groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("run_len"))
        .groupBy("doc_id")
        .agg(
            F.max("run_len").cast("bigint").alias("max_run"),
            F.sum("run_len").cast("bigint").alias("n_hits"),
        )
    )
    return (
        totals.join(runs, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "n_shingles",
            "COALESCE(n_hits, CAST(0 AS BIGINT)) AS n_hits",
            "COALESCE(max_run, CAST(0 AS BIGINT)) AS max_run",
            f"CASE WHEN max_run IS NULL THEN CAST(0 AS BIGINT)"
            f" ELSE max_run + {DECON_N - 1} END AS max_span_tokens",
        )
    )


def _contamination_span_sql() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
s AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(toks) - {DECON_N - 1}),
                        i -> array_to_string(toks[i:i+{DECON_N - 1}], ' '))
           AS grams
  FROM t WHERE len(toks) >= {DECON_N}
),
bench AS (
  SELECT DISTINCT unnest(grams) AS sh FROM s WHERE doc_id < {N_BENCH}
),
corpus AS (
  SELECT doc_id, i - 1 AS pos, grams[i] AS sh
  FROM (SELECT doc_id, grams FROM s WHERE doc_id >= {N_BENCH}),
       LATERAL (SELECT unnest(generate_series(1, len(grams))) AS i) gs
),
totals AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
  FROM corpus GROUP BY 1
),
hits AS (
  SELECT c.doc_id, c.pos
  FROM corpus c JOIN bench b ON c.sh = b.sh
),
runs AS (
  SELECT doc_id,
         CAST(MAX(run_len) AS BIGINT) AS max_run,
         CAST(SUM(run_len) AS BIGINT) AS n_hits
  FROM (
    SELECT doc_id, grp, COUNT(*) AS run_len
    FROM (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY pos) AS grp
      FROM hits
    )
    GROUP BY 1, 2
  )
  GROUP BY 1
)
SELECT t2.doc_id,
       t2.n_shingles,
       COALESCE(r.n_hits, CAST(0 AS BIGINT)) AS n_hits,
       COALESCE(r.max_run, CAST(0 AS BIGINT)) AS max_run,
       CASE WHEN r.max_run IS NULL THEN CAST(0 AS BIGINT)
       ELSE r.max_run + {DECON_N - 1} END AS max_span_tokens
FROM totals t2 LEFT JOIN runs r USING (doc_id)
"""


REGISTRY["contamination_span_docs"] = {
    "fn": contamination_span_docs,
    "sql": _contamination_span_sql(),
}
