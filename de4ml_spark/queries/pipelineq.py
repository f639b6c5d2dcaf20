"""Training-data pipeline operators, round 4: corpus vocabulary
construction, per-group deterministic reservoir sampling, sequence-pattern
matching over event streams (MATCH_RECOGNIZE-lite), dedup-cluster
canonicalization (survivor selection), and content-defined chunking.

Every entry is fully oracle-gated against DuckDB on identical semantics
(exact integer rounding, engine-portable md5 hashing, deterministic
tiebreaks). Reference parity: these extend the reference's ETL surface
(logging-service/app/etl.py's flatten/persist loop) with the corpus-prep
steps a pretraining pipeline runs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.operators.portable_hash import exact_round_div_sql, phash_col
from de4ml_spark.operators.text import tokens
from de4ml_spark.session import load_table

# --------------------------------------------------------------------------
# Corpus vocabulary with cumulative coverage — the tokenizer-prep step
# (vocab truncation point = where cum_share crosses the target coverage).
# --------------------------------------------------------------------------

VOCAB_K = 100


def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K corpus vocabulary: token, occurrence count, rank, corpus share
    and cumulative share (exact integer rounding).

    Scale: wordcount shape — explode + map-side-combined groupBy; the
    global total is a 1-row broadcast; the rank/cumsum window runs over
    ONLY the top-K rows (TakeOrderedAndProject picks K per partition then
    merges K, never a global sort), so the single-partition window is K
    rows regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("__total"))
    topk = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(VOCAB_K)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    # the cumulative sum is spliced as SQL text because exact_round_div_sql
    # composes SQL fragments (BIGINT cast: DuckDB window SUM is HUGEINT)
    cum = (
        "CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
    )
    return topk.crossJoin(F.broadcast(total)).select(
        "token",
        "cnt",
        F.row_number().over(w).alias("rank"),
        F.expr(exact_round_div_sql("cnt", "__total", "DIV")).alias("share_r"),
        F.expr(exact_round_div_sql(cum, "__total", "DIV")).alias("cum_share_r"),
    )


VOCAB_SQL = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
counts AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY 1),
total AS (SELECT SUM(cnt) AS t FROM counts),
topk AS (SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT {VOCAB_K})
SELECT token, cnt,
       ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank,
       {exact_round_div_sql('cnt', 't', '//')} AS share_r,
       {exact_round_div_sql(
           'CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token '
           'ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)',
           't', '//')} AS cum_share_r
FROM topk, total
"""


# --------------------------------------------------------------------------
# Per-group deterministic reservoir sample: k docs per source, chosen by
# md5 order — reproducible across engines, runs, and partitionings.
# --------------------------------------------------------------------------

RESERVOIR_K = 10


def reservoir_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-per-source sample via rank over the md5 of the doc id — the
    deterministic equivalent of per-stratum reservoir sampling (every
    engine/run picks the same docs).

    Scale: rank-filter windows compile to WindowGroupLimit — each shuffle
    partition keeps only its top-k per group before the final per-group
    merge, so the exchange carries O(k * n_groups), not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w = Window.partitionBy("source").orderBy(h.asc())
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= RESERVOIR_K)
    )


RESERVOIR_SQL = f"""
SELECT source, doc_id, rk FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
  FROM documents
) WHERE rk <= {RESERVOIR_K}
"""


# --------------------------------------------------------------------------
# Sequence-pattern matching (MATCH_RECOGNIZE-lite): per user, order events
# into a symbol string and count regex-defined behavioral patterns.
# --------------------------------------------------------------------------

# view -> (anything but view/purchase)* -> purchase: a view that converts
# before the next view. Left-to-right non-overlapping scan — identical
# semantics in Java regex (Spark) and RE2 (DuckDB) for this pattern shape.
FUNNEL_PATTERN = "v[^vp]*p"


def pattern_match_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-sequence pattern counts. Events collapse to one
    symbol each (first letter of event_type — unique across the five
    types); the per-user string (ordered by ts, event_id) is scanned for
    ``FUNNEL_PATTERN`` occurrences; the md5 of the symbol string pins the
    full ordering in the oracle compare.

    Scale: one groupBy(user) with a row-local ordered fold —
    collect_list(struct) + array_sort is the deterministic ordered-agg
    pattern (collect_list alone has no order guarantee). Per-user event
    strings are bounded (sessions, not the corpus), the standard
    MATCH_RECOGNIZE workload shape."""
    ev = load_table(spark, sf_dir, "events")
    sym = F.substring("event_type", 1, 1)
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("ts"), F.col("event_id"), sym.alias("s")))
            ),
            lambda r: r["s"],
        ),
        "",
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.regexp_count(seq, F.lit(FUNNEL_PATTERN)).alias("n_conversions"),
        F.md5(seq.cast("binary")).alias("seq_md5"),
    )


PATTERN_SQL = f"""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(len(regexp_extract_all(
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id),
         '{FUNNEL_PATTERN}')) AS INT) AS n_conversions,
       md5(string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id))
         AS seq_md5
FROM events
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Dedup-cluster canonicalization: survivor selection over the near-dup
# component assignment (keep the longest doc per cluster, drop the rest).
# --------------------------------------------------------------------------


def dedup_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship step of the dedup pipeline: every doc labeled with its
    near-dup component (min-label propagation over the exact Jaccard>=0.8
    n-gram graph), cluster size, and whether it is the cluster's canonical
    representative (max n_chars, ties to the smallest doc_id).

    Scale: component labels come from iterative min-label propagation
    (operators/dedup.py — O(diameter) joins); the survivor choice is one
    rank-filter window per component partition."""
    from de4ml_spark.operators.dedup import connected_components, ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, n=3).select("id_a", "id_b")
    comp = connected_components(pairs, docs, id_col="doc_id")
    j = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component")
    wr = w.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return j.select(
        "doc_id",
        "component",
        F.count(F.lit(1)).over(w).alias("n_members"),
        (F.row_number().over(wr) == 1).alias("is_canonical"),
    )


def _canonicalize_sql() -> str:
    from de4ml_spark.queries.dedupq import COMPONENTS_CTES, COMPONENTS_SELECT

    return f"""{COMPONENTS_CTES},
comp AS ({COMPONENTS_SELECT}
),
q AS (
  SELECT c.doc_id, c.component, d.n_chars
  FROM comp c JOIN documents d USING (doc_id)
)
SELECT doc_id, component,
       COUNT(*) OVER (PARTITION BY component) AS n_members,
       (ROW_NUMBER() OVER (PARTITION BY component
                           ORDER BY n_chars DESC, doc_id) = 1) AS is_canonical
FROM q
"""


# --------------------------------------------------------------------------
# Content-defined chunking: boundaries follow the CONTENT (token hash), not
# fixed offsets, so inserting a sentence shifts only the chunk it lands in —
# the shift-robust unit for chunk-level dedup (FastCDC/rsync lineage, at
# token granularity).
# --------------------------------------------------------------------------

CDC_MASK_BITS = 3  # boundary after tokens whose hash % 8 == 0 (~8-token chunks)


def cdc_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level content-defined chunking, summarized per doc: chunk
    count, total tokens, max chunk length, and an md5 over the chunk texts
    in order (pins every boundary for the oracle compare).

    Scale: entirely row-local higher-order expressions — a map-only plan
    with no shuffle (chunking at 100 TB is embarrassingly parallel). The
    boundary hash is the engine-portable md5 byte (one md5 per token)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks)
    # boundary AFTER token i (1-indexed) when its hash has the low bits zero
    bnds = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: phash_col(F.element_at(toks, i), CDC_MASK_BITS) == 0,
    )
    base = docs.select("doc_id", toks.alias("toks"), n.alias("n"), bnds.alias("bnds"))
    starts = F.concat(
        F.array(F.lit(1)),
        F.transform(
            F.filter(F.col("bnds"), lambda b: b < F.col("n")), lambda b: b + 1
        ),
    )
    stage2 = base.select("doc_id", "toks", "n", "bnds", starts.alias("starts"))
    ends = F.transform(
        F.col("starts"),
        lambda s: F.coalesce(
            F.array_min(F.filter(F.col("bnds"), lambda b: b >= s)), F.col("n")
        ),
    )
    stage3 = stage2.select("doc_id", "toks", "n", "starts", ends.alias("ends"))
    chunk_texts = F.zip_with(
        F.col("starts"),
        F.col("ends"),
        lambda s, e: F.concat_ws(" ", F.slice(F.col("toks"), s, e - s + 1)),
    )
    return stage3.select(
        "doc_id",
        F.size("starts").alias("n_chunks"),
        F.col("n").cast("bigint").alias("total_tokens"),
        F.array_max(
            F.zip_with(F.col("starts"), F.col("ends"), lambda s, e: e - s + 1)
        ).alias("max_chunk_tokens"),
        F.md5(F.array_join(chunk_texts, "|").cast("binary")).alias("chunks_md5"),
    )


CDC_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
b AS (
  SELECT doc_id, toks, len(toks) AS n,
         list_filter(generate_series(1, len(toks)),
                     i -> (md5_number_lower(toks[i]) & {(1 << CDC_MASK_BITS) - 1}) = 0)
           AS bnds
  FROM t
),
s AS (
  SELECT doc_id, toks, n, bnds,
         list_concat([1], list_transform(list_filter(bnds, x -> x < n),
                                         x -> x + 1)) AS starts
  FROM b
),
e AS (
  SELECT doc_id, toks, n, starts,
         list_transform(starts,
                        st -> coalesce(list_min(list_filter(bnds, x -> x >= st)),
                                       n)) AS ends
  FROM s
)
SELECT doc_id,
       CAST(len(starts) AS INT) AS n_chunks,
       n AS total_tokens,
       CAST(list_max(list_transform(generate_series(1, len(starts)),
                                    i -> ends[i] - starts[i] + 1)) AS INT)
         AS max_chunk_tokens,
       md5(array_to_string(
         list_transform(generate_series(1, len(starts)),
                        i -> array_to_string(toks[starts[i]:ends[i]], ' ')),
         '|')) AS chunks_md5
FROM e
"""


REGISTRY: dict[str, dict] = {
    "vocab_top_terms": {"fn": vocab_top_terms, "sql": VOCAB_SQL},
    "reservoir_docs": {"fn": reservoir_docs, "sql": RESERVOIR_SQL},
    "pattern_match_events": {"fn": pattern_match_events, "sql": PATTERN_SQL},
    "dedup_canonicalize": {"fn": dedup_canonicalize, "sql": _canonicalize_sql()},
    "cdc_chunk_docs": {"fn": cdc_chunk_docs, "sql": CDC_SQL},
}
