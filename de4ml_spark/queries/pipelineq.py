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

from de4ml_spark.operators.portable_hash import exact_round_div_sql
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


# COALESCE(string_agg, ''): a user whose every event_type is NULL has
# no symbols — Spark's array_join yields '' (md5 of empty) while
# DuckDB's string_agg returns NULL (round-14 nullkeys parity sweep);
# both skip NULL symbols inside a mixed sequence identically.
PATTERN_SQL = f"""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(len(regexp_extract_all(
         COALESCE(string_agg(substr(event_type, 1, 1),
                             '' ORDER BY ts, event_id), ''),
         '{FUNNEL_PATTERN}')) AS INT) AS n_conversions,
       md5(COALESCE(string_agg(substr(event_type, 1, 1),
                               '' ORDER BY ts, event_id), ''))
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


def _cdc_stage(spark: SparkSession, sf_dir: str):
    """Shared CDC pipeline: (doc_id, toks, n, starts, ends) stage plus the
    chunk-texts Column. Consumed by the per-doc summary (cdc_chunk_docs)
    and the chunk-level dedup (cdc_dedup_chunks).

    Scale/plan: the boundary hash runs in WHOLE-STAGE CODEGEN over exploded
    (doc, pos, token) rows — Spark evaluates higher-order-function lambdas
    interpreted, and an md5 per token through that path measured 1.46 s vs
    0.08 s for the codegen explode at sf0.1 (18x). Only boundary POSITIONS
    (1/2^bits of tokens) survive the groupBy back to one row per doc; chunk
    assembly from (toks, bnds) is then row-local array logic with no
    hashing. Two narrow shuffles (boundary rows, doc join), both tiny
    relative to the corpus scan at any scale."""
    from de4ml_spark.operators.portable_hash import md5_hex_sql, phash_from_hex_sql
    from de4ml_spark.session import spread

    # a NULL-text doc has no chunks — filter on both engines (round-14
    # nulldocs parity sweep)
    docs = spread(
        load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
        ),
        "doc_id",
    )
    toks = tokens("text")
    n = F.size(toks)
    ex = docs.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
    hx = ex.select("doc_id", "pos", F.expr(md5_hex_sql("tok")).alias("hx"))
    # boundary AFTER token i (1-indexed) when its hash has the low bits zero
    bpos = (
        hx.filter(F.expr(phash_from_hex_sql("hx", CDC_MASK_BITS)) == 0)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.col("pos") + 1)).alias("bnds"))
    )
    base = (
        docs.select("doc_id", toks.alias("toks"), n.alias("n"))
        .join(bpos, "doc_id", "left")
        .withColumn("bnds", F.coalesce("bnds", F.array().cast("array<int>")))
    )
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
    return stage3, chunk_texts


def cdc_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    stage3, chunk_texts = _cdc_stage(spark, sf_dir)
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
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE text IS NOT NULL),
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


def cdc_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup over the CDC chunks — the payoff of content-
    defined boundaries: shifted/duplicated passages hash to the SAME
    chunks across documents. One-row corpus report: total chunk
    instances, distinct chunks, duplicate instances, exact dup ratio, and
    the most-copied chunk's multiplicity.

    Scale: chunks explode map-side off the shared CDC stage; the dedup is
    a groupBy on the 32-char chunk digest (map-side combine) and a single-
    row rollup — the exact-dedup shape at chunk grain."""
    stage3, chunk_texts = _cdc_stage(spark, sf_dir)
    chunks = stage3.select(
        F.explode(chunk_texts).alias("chunk_text")
    ).select(F.md5(F.col("chunk_text").cast("binary")).alias("h"))
    per = chunks.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    return per.agg(
        F.sum("c").alias("total_chunks"),
        F.count(F.lit(1)).alias("distinct_chunks"),
        (F.sum("c") - F.count(F.lit(1))).alias("dup_instances"),
        F.expr(
            exact_round_div_sql(
                "CAST(SUM(c) AS BIGINT) - COUNT(*)", "CAST(SUM(c) AS BIGINT)", "DIV"
            )
        ).alias("dup_ratio_r"),
        F.max("c").alias("max_copies"),
    )


def _cdc_dedup_sql() -> str:
    # reuse the CDC chunking CTEs up to the chunk-text list, then unnest
    head = CDC_SQL.rsplit("\nSELECT doc_id,", 1)[0].rstrip() + ","
    return f"""{head}
chunks AS (
  SELECT md5(array_to_string(toks[starts[i]:ends[i]], ' ')) AS h
  FROM e, LATERAL unnest(generate_series(1, len(starts))) AS u(i)
),
per AS (SELECT h, COUNT(*) AS c FROM chunks GROUP BY h)
SELECT CAST(SUM(c) AS BIGINT) AS total_chunks,
       COUNT(*) AS distinct_chunks,
       CAST(SUM(c) - COUNT(*) AS BIGINT) AS dup_instances,
       {exact_round_div_sql(
           'CAST(SUM(c) AS BIGINT) - COUNT(*)',
           'CAST(SUM(c) AS BIGINT)', '//')} AS dup_ratio_r,
       MAX(c) AS max_copies
FROM per
"""


# --------------------------------------------------------------------------
# Incremental (continuous-ingest) dedup: screen a NEW batch of documents
# against the existing corpus — exact fingerprint hit => drop; n-gram
# Jaccard >= 0.8 against an existing doc => drop as near-dup; else keep.
# The batch/corpus split is doc_id % 10 (>= 8 => batch) so it is scale-
# factor-independent and engine-reproducible.
# --------------------------------------------------------------------------

_BATCH_MOD = 10
_BATCH_MIN = 8  # doc_id % 10 in {8, 9} -> the incoming batch (~20%)


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch-vs-corpus dedup decision per incoming doc.

    Scale: the exact screen is a broadcast-able semi-join on 32-char
    fingerprints (the batch side is small by definition); the near-dup
    screen reuses the hashed-shingle inverted index with the batch as the
    probe side — the standard continuous-ingest shape where the corpus
    index is precomputed and only the batch explodes per arrival."""
    from de4ml_spark.operators.dedup import ngram_jaccard_pairs
    from de4ml_spark.operators.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    is_batch = (F.col("doc_id") % _BATCH_MOD) >= _BATCH_MIN
    fp = fingerprint(docs, "text").select("doc_id", "fingerprint")
    batch_fp = fp.filter(is_batch)
    exist_fp = fp.filter(~is_batch)
    exact = (
        batch_fp.join(
            exist_fp.select("fingerprint").distinct(), "fingerprint", "left_semi"
        )
        .select("doc_id")
        .withColumn("__exact", F.lit(True))
    )
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, n=3).select("id_a", "id_b")
    a_batch = (F.col("id_a") % _BATCH_MOD) >= _BATCH_MIN
    b_batch = (F.col("id_b") % _BATCH_MOD) >= _BATCH_MIN
    cross = pairs.filter(a_batch != b_batch).select(
        F.when(a_batch, F.col("id_a")).otherwise(F.col("id_b")).alias("doc_id"),
        F.when(a_batch, F.col("id_b")).otherwise(F.col("id_a")).alias("exist_id"),
    )
    near = cross.groupBy("doc_id").agg(F.min("exist_id").alias("near_dup_of"))
    out = (
        docs.filter(is_batch)
        .select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
    )
    is_exact = F.coalesce(F.col("__exact"), F.lit(False))
    return out.select(
        "doc_id",
        is_exact.alias("is_exact_dup"),
        "near_dup_of",
        F.when(is_exact, F.lit("drop_exact"))
        .when(F.col("near_dup_of").isNotNull(), F.lit("drop_near"))
        .otherwise(F.lit("keep"))
        .alias("action"),
    )


DEDUP_INCREMENTAL_SQL = rf"""
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
),
fp AS (SELECT doc_id,
              md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
       FROM documents),
exact AS (
  SELECT DISTINCT b.doc_id FROM fp b
  JOIN fp a ON b.f = a.f
  WHERE b.doc_id % {_BATCH_MOD} >= {_BATCH_MIN}
    AND a.doc_id % {_BATCH_MOD} < {_BATCH_MIN}
),
cross_pairs AS (
  SELECT CASE WHEN id_a % {_BATCH_MOD} >= {_BATCH_MIN} THEN id_a ELSE id_b END
           AS doc_id,
         CASE WHEN id_a % {_BATCH_MOD} >= {_BATCH_MIN} THEN id_b ELSE id_a END
           AS exist_id
  FROM p
  WHERE (id_a % {_BATCH_MOD} >= {_BATCH_MIN})
        <> (id_b % {_BATCH_MOD} >= {_BATCH_MIN})
),
near AS (SELECT doc_id, MIN(exist_id) AS near_dup_of
         FROM cross_pairs GROUP BY doc_id)
SELECT d.doc_id,
       (x.doc_id IS NOT NULL) AS is_exact_dup,
       near.near_dup_of,
       CASE WHEN x.doc_id IS NOT NULL THEN 'drop_exact'
            WHEN near.near_dup_of IS NOT NULL THEN 'drop_near'
            ELSE 'keep' END AS action
FROM documents d
LEFT JOIN exact x ON d.doc_id = x.doc_id
LEFT JOIN near ON d.doc_id = near.doc_id
WHERE d.doc_id % {_BATCH_MOD} >= {_BATCH_MIN}
"""


# --------------------------------------------------------------------------
# Packing-efficiency report: per fixed-budget training sequence, how many
# docs overlap it / start in it and how full it is — the observability twin
# of the SHARD-LOCAL packing layout (textq2.pack_sharded): docs hash into
# N_SHARDS shards and each shard packs independently, so sequence ids are
# (shard, seq_id) pairs. This is the layout training data actually uses at
# 100 TB; the global-cumsum variant (textq2.pack_training_sequences) is
# kept only as the oracle-parity twin of the serial formulation.
# --------------------------------------------------------------------------

_PACK_BUDGET = 512


def pack_sequence_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(shard, sequence) stats of the shard-local concat-and-chunk
    packing: docs overlapping, docs starting, and tokens filled (== budget
    everywhere but each shard's tail).

    Scale: the cumsum window is PARTITIONED BY shard — shards pack in
    parallel and no row-grain single-partition window appears anywhere in
    the plan; the interval explode is bounded by docs-per-sequence, then a
    map-side-combined groupBy on (shard, seq_id)."""
    from de4ml_spark.queries.textq2 import N_SHARDS

    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = F.size(tokens("text"))
    packed = (
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
            (F.col("offset") / _PACK_BUDGET).cast("bigint").alias("seq_start"),
            ((F.col("offset") + F.col("n_tokens") - 1) / _PACK_BUDGET)
            .cast("bigint")
            .alias("seq_end"),
        )
    )
    # 0-token docs (null text) occupy no sequence: F.sequence emits a
    # DESCENDING range when seq_end < seq_start while DuckDB's
    # generate_series returns empty — filter them out before the explode.
    # They still pass through the cumsum (contributing nothing), so
    # offsets are unaffected.
    ex = packed.filter(F.col("n_tokens") >= 1).select(
        "*", F.explode(F.sequence("seq_start", "seq_end")).alias("seq_id")
    )
    b = F.lit(_PACK_BUDGET)
    overlap = F.least(
        (F.col("seq_id") + 1) * b, F.col("offset") + F.col("n_tokens")
    ) - F.greatest(F.col("seq_id") * b, F.col("offset"))
    return ex.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("seq_start") == F.col("seq_id"), 1)).alias(
            "n_docs_start"
        ),
        F.sum(overlap).alias("tokens_filled"),
    )


def _pack_report_sql() -> str:
    from de4ml_spark.queries.textq2 import N_SHARDS

    return f"""
WITH t AS (
  SELECT doc_id, doc_id % {N_SHARDS} AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS "offset"
  FROM t
),
packed AS (
  SELECT doc_id, shard, n_tokens, "offset",
         CAST(FLOOR("offset" / {_PACK_BUDGET}) AS BIGINT) AS seq_start,
         CAST(FLOOR(("offset" + n_tokens - 1) / {_PACK_BUDGET}) AS BIGINT)
           AS seq_end
  FROM o
),
ex AS (
  SELECT *, unnest(generate_series(seq_start, seq_end)) AS seq_id
  FROM packed WHERE n_tokens >= 1
)
SELECT shard, seq_id,
       COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE seq_start = seq_id) AS n_docs_start,
       CAST(SUM(LEAST((seq_id + 1) * {_PACK_BUDGET}, "offset" + n_tokens)
                - GREATEST(seq_id * {_PACK_BUDGET}, "offset")) AS BIGINT)
         AS tokens_filled
FROM ex
GROUP BY shard, seq_id
"""


PACK_REPORT_SQL = _pack_report_sql()


# --------------------------------------------------------------------------
# Stratified train/val/test split: deterministic per-doc hash bucket
# (80/10/10) with per-source accounting — leakage-free, engine-identical.
# --------------------------------------------------------------------------


def stratified_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, split) doc counts and within-source shares for the
    md5-bucket 80/10/10 assignment.

    Scale: one map-only hash projection + a two-key groupBy; shares come
    from a window over the 3 split rows per source."""
    from de4ml_spark.operators.portable_hash import phash_spark_sql

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(phash_spark_sql("CAST(doc_id AS STRING)", bits=16)) % 100
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    counts = (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    cum = (
        "CAST(SUM(n_docs) OVER (PARTITION BY source) AS BIGINT)"
    )
    return counts.select(
        "source",
        "split",
        "n_docs",
        F.expr(exact_round_div_sql("n_docs", cum, "DIV")).alias("share_r"),
    )


def _stratified_sql() -> str:
    from de4ml_spark.operators.portable_hash import phash_duck_sql

    bucket = f"({phash_duck_sql('CAST(doc_id AS VARCHAR)', bits=16)} % 100)"
    return f"""
WITH assigned AS (
  SELECT source,
         CASE WHEN {bucket} < 80 THEN 'train'
              WHEN {bucket} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
counts AS (
  SELECT source, split, COUNT(*) AS n_docs FROM assigned GROUP BY 1, 2
)
SELECT source, split, n_docs,
       {exact_round_div_sql(
           'n_docs',
           'CAST(SUM(n_docs) OVER (PARTITION BY source) AS BIGINT)',
           '//')} AS share_r
FROM counts
"""


# --------------------------------------------------------------------------
# ANN recall evaluation: recall@K of the LSH index against brute-force
# ground truth, per query — the acceptance gate of an approximate index.
# --------------------------------------------------------------------------


def knn_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@K per query: |LSH top-K ∩ exact top-K| / K.

    Scale: both sides are the already-catalogued top-K operators; the
    intersection is a join on (query, neighbor) — K rows per query."""
    from de4ml_spark.queries.simq import knn_bruteforce, knn_lsh

    bf = knn_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    ls = knn_lsh(spark, sf_dir).select("query_id", "neighbor_id")
    # both sides are K rows per curated query — broadcast the index side
    # (size estimation can't see through the top-K windows, so without the
    # hint this planned a sort-merge join of two tiny sets)
    hits = (
        bf.join(F.broadcast(ls), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    from de4ml_spark.queries.simq import K as _K

    return (
        bf.select("query_id")
        .distinct()
        .join(F.broadcast(hits), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.expr(
                exact_round_div_sql("COALESCE(n_hits, 0)", str(_K), "DIV")
            ).alias("recall_r"),
        )
    )


def _lsh_recall_sql() -> str:
    from de4ml_spark.queries.simq import K, KNN_BRUTEFORCE_SQL, knn_lsh_oracle_sql

    return f"""
SELECT bf.query_id,
       COALESCE(h.n_hits, 0) AS n_hits,
       {exact_round_div_sql('COALESCE(h.n_hits, 0)', str(K), '//')} AS recall_r
FROM (SELECT DISTINCT query_id FROM ({KNN_BRUTEFORCE_SQL})) bf
LEFT JOIN (
  SELECT b.query_id, COUNT(*) AS n_hits
  FROM ({KNN_BRUTEFORCE_SQL}) b
  JOIN ({knn_lsh_oracle_sql()}) l
    ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
  GROUP BY b.query_id
) h ON bf.query_id = h.query_id
"""


# --------------------------------------------------------------------------
# IQR outlier fences per group: the classic data-quality screen (Tukey
# fences), built on the grouped histogram-quantile operator — no raw-row
# buffering at any group size.
# --------------------------------------------------------------------------


def iqr_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: exact q1/q3, Tukey fences (1.5 IQR), and the count
    of values outside them.

    Scale: quantiles come from grouped_exact_quantiles (histogram +
    per-group cumulative window); the outlier count is one more aggregate
    over the same scan joined to the 5-row fence table (broadcast)."""
    from de4ml_spark.profile.battery import grouped_exact_quantiles

    # NULL event_type is out-of-domain for a typed distribution (the
    # sibling two-sample entries filter it too); without the filter the
    # Spark left join kept a NULL-type group the oracle's equi-join
    # dropped (round-14 nullkeys parity sweep)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    q = grouped_exact_quantiles(ev, ["event_type"], "value", [0.25, 0.75])
    fences = q.select(
        "event_type",
        F.round("q25", 6).alias("q1_r"),
        F.round("q75", 6).alias("q3_r"),
        (F.col("q25") - 1.5 * (F.col("q75") - F.col("q25"))).alias("__lo"),
        (F.col("q75") + 1.5 * (F.col("q75") - F.col("q25"))).alias("__hi"),
    )
    # LEFT join: an event_type whose values are all NULL has no quantile
    # row, but must still appear with NULL fences and n_outliers = 0
    # (exactly what the oracle's GROUP BY-then-JOIN yields, since
    # quantile_cont over all-NULL is NULL, not a dropped group)
    joined = ev.join(F.broadcast(fences), "event_type", "left")
    return joined.groupBy("event_type").agg(
        F.first("q1_r").alias("q1_r"),
        F.first("q3_r").alias("q3_r"),
        F.count(
            F.when(
                (F.col("value") < F.col("__lo")) | (F.col("value") > F.col("__hi")),
                1,
            )
        ).alias("n_outliers"),
        F.count("value").alias("n"),
    )


IQR_SQL = """
WITH f AS (
  SELECT event_type,
         ROUND(quantile_cont(value, 0.25), 6) AS q1_r,
         ROUND(quantile_cont(value, 0.75), 6) AS q3_r,
         quantile_cont(value, 0.25)
           - 1.5 * (quantile_cont(value, 0.75) - quantile_cont(value, 0.25))
           AS lo,
         quantile_cont(value, 0.75)
           + 1.5 * (quantile_cont(value, 0.75) - quantile_cont(value, 0.25))
           AS hi
  FROM events WHERE event_type IS NOT NULL GROUP BY event_type
)
SELECT e.event_type, f.q1_r, f.q3_r,
       COUNT(*) FILTER (WHERE e.value < f.lo OR e.value > f.hi) AS n_outliers,
       COUNT(e.value) AS n
FROM events e JOIN f ON e.event_type = f.event_type
GROUP BY e.event_type, f.q1_r, f.q3_r
"""


# --------------------------------------------------------------------------
# Length-bucketed batching: group docs into token-length buckets (pad-to-
# bucket inference batching) and report the padding waste per bucket — the
# standard efficiency screen before serving/eval runs.
# --------------------------------------------------------------------------

_LEN_BUCKET = 32  # bucket width in tokens (pad each doc up to the next edge)


def length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per length bucket: doc count, real tokens, padded tokens (every doc
    pads to the bucket's upper edge), and the exact waste fraction.

    Scale: map-only token count + integer bucketing, then a groupBy on
    the (few-hundred) bucket keys with map-side combine."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens("text")).cast("bigint")
    bucket_hi = (
        (F.floor((n_tok - 1) / _LEN_BUCKET) + 1) * _LEN_BUCKET
    ).alias("bucket_hi")
    g = (
        docs.select(n_tok.alias("n_tok"), bucket_hi)
        .groupBy("bucket_hi")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("real_tokens"),
        )
    )
    padded = F.col("bucket_hi") * F.col("n_docs")
    return g.select(
        "bucket_hi",
        "n_docs",
        "real_tokens",
        padded.alias("padded_tokens"),
        F.expr(
            exact_round_div_sql(
                "bucket_hi * n_docs - real_tokens", "bucket_hi * n_docs", "DIV"
            )
        ).alias("waste_r"),
    )


LENGTH_BUCKET_SQL = f"""
WITH t AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents
),
g AS (
  SELECT (FLOOR((n_tok - 1) / {_LEN_BUCKET}) + 1) * {_LEN_BUCKET} AS bucket_hi,
         COUNT(*) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS real_tokens
  FROM t GROUP BY 1
)
SELECT CAST(bucket_hi AS BIGINT) AS bucket_hi, n_docs, real_tokens,
       CAST(bucket_hi * n_docs AS BIGINT) AS padded_tokens,
       {exact_round_div_sql(
           'CAST(bucket_hi * n_docs - real_tokens AS BIGINT)',
           'CAST(bucket_hi * n_docs AS BIGINT)', '//')} AS waste_r
FROM g
"""


REGISTRY: dict[str, dict] = {
    "vocab_top_terms": {"fn": vocab_top_terms, "sql": VOCAB_SQL},
    "reservoir_docs": {"fn": reservoir_docs, "sql": RESERVOIR_SQL},
    "pattern_match_events": {"fn": pattern_match_events, "sql": PATTERN_SQL},
    "dedup_canonicalize": {"fn": dedup_canonicalize, "sql": _canonicalize_sql()},
    "cdc_chunk_docs": {"fn": cdc_chunk_docs, "sql": CDC_SQL},
    "cdc_dedup_chunks": {"fn": cdc_dedup_chunks, "sql": _cdc_dedup_sql()},
    "dedup_incremental": {"fn": dedup_incremental, "sql": DEDUP_INCREMENTAL_SQL},
    "pack_sequence_report": {"fn": pack_sequence_report, "sql": PACK_REPORT_SQL},
    "stratified_split_docs": {"fn": stratified_split_docs, "sql": _stratified_sql()},
    "knn_lsh_recall": {"fn": knn_lsh_recall, "sql": _lsh_recall_sql()},
    "iqr_outliers_events": {"fn": iqr_outliers_events, "sql": IQR_SQL},
    "length_bucket_batches": {
        "fn": length_bucket_batches,
        "sql": LENGTH_BUCKET_SQL,
    },
}


# --------------------------------------------------------------------------
# ANN recall evaluation for the IVF index: same acceptance-gate shape as
# knn_lsh_recall, against the same brute-force ground truth — together
# the two recalls compare the index families' accuracy under one metric.
# --------------------------------------------------------------------------


def knn_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@K per query of the IVF index: |IVF top-K ∩ exact top-K| / K.

    Scale: both sides are the already-catalogued top-K operators (K rows
    per curated query — broadcast); the recall join is O(K · queries)."""
    from de4ml_spark.queries.simq import K as _K
    from de4ml_spark.queries.simq import knn_bruteforce, knn_ivf

    bf = knn_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    iv = knn_ivf(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        bf.join(F.broadcast(iv), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        bf.select("query_id")
        .distinct()
        .join(F.broadcast(hits), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.expr(
                exact_round_div_sql("COALESCE(n_hits, 0)", str(_K), "DIV")
            ).alias("recall_r"),
        )
    )


def _ivf_recall_sql() -> str:
    from de4ml_spark.queries.simq import K, KNN_BRUTEFORCE_SQL, knn_ivf_oracle_sql

    return f"""
SELECT bf.query_id,
       COALESCE(h.n_hits, 0) AS n_hits,
       {exact_round_div_sql('COALESCE(h.n_hits, 0)', str(K), '//')} AS recall_r
FROM (SELECT DISTINCT query_id FROM ({KNN_BRUTEFORCE_SQL})) bf
LEFT JOIN (
  SELECT b.query_id, COUNT(*) AS n_hits
  FROM ({KNN_BRUTEFORCE_SQL}) b
  JOIN ({knn_ivf_oracle_sql()}) i
    ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
  GROUP BY b.query_id
) h ON bf.query_id = h.query_id
"""


REGISTRY["knn_ivf_recall"] = {"fn": knn_ivf_recall, "sql": _ivf_recall_sql()}
