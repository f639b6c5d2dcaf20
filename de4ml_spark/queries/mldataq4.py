"""Training-data feature engineering tier 4: leakage-safe target
encoding, the feature-hashing trick, and deterministic negative
sampling — the supervised-learning data-prep steps that sit right
after the dedup/quality/split stages (mldataq*.py) in a real pipeline.

Exactness discipline as everywhere (operators/portable_hash.py):
deterministic md5-based hashing for fold/bucket/candidate assignment,
integer cents for the target, exact half-up rational rounding for any
reported ratio, and whitelist-only result types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.session import load_events_finite, load_table

REGISTRY: dict = {}


# --------------------------------------------------------------------------
# Out-of-fold target encoding of event_type against the value target:
# the standard leakage-safe categorical encoder — each fold's encoding
# for a category is the target mean over the OTHER folds, so a row
# never contributes to its own feature. Folds come from a seeded
# md5 hash of user_id (grouping by user, not row, so one user's events
# never straddle the train/apply boundary of their own encoding).
# Exact: per-(category, fold) sums in integer cents, the leave-one-
# fold-out mean as exact half-up integer rounding; NULL when a fold
# holds the category's entire mass (NULLIF guard, no 0-division).
# Scale: one groupBy on (category, fold); the leave-one-out subtraction
# joins the 25-row frame against the 5-row category totals — broadcast.
# --------------------------------------------------------------------------

OOF_FOLDS = 5


def oof_target_encode_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql,
        phash_spark_sql,
    )

    ev = load_events_finite(spark, sf_dir).filter(
        F.col("user_id").isNotNull()
    )
    fold_hash = phash_spark_sql("CONCAT('oof:', CAST(user_id AS STRING))")
    per_fold = (
        ev.selectExpr(
            "event_type",
            f"{fold_hash} % {OOF_FOLDS} AS fold",
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c",
        )
        .groupBy("event_type", "fold")
        .agg(
            F.count(F.lit(1)).alias("n_in_fold"),
            F.sum("v_c").alias("sum_in_fold"),
        )
    )
    totals = per_fold.groupBy("event_type").agg(
        F.sum("n_in_fold").alias("n_tot"),
        F.sum("sum_in_fold").alias("sum_tot"),
    )
    return per_fold.join(F.broadcast(totals), "event_type").selectExpr(
        "event_type",
        "CAST(fold AS BIGINT) AS fold",
        "CAST(n_in_fold AS BIGINT) AS n_in_fold",
        "CAST(n_tot - n_in_fold AS BIGINT) AS n_oof",
        "CAST(sum_tot - sum_in_fold AS BIGINT) AS sum_oof_c",
        # mean cents over the other folds; NULL if this fold is all of
        # the category (cannot encode without leaking)
        f"""CASE WHEN n_tot = n_in_fold THEN NULL
            ELSE {exact_round_div_sql(
                '(sum_tot - sum_in_fold)', '(n_tot - n_in_fold)', 'DIV', 2
            )} END AS enc_oof_r""",
    )


def _oof_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql,
        phash_duck_sql,
    )

    return f"""
WITH per_fold AS (
  SELECT event_type,
         {phash_duck_sql("CONCAT('oof:', CAST(user_id AS VARCHAR))")}
           % {OOF_FOLDS} AS fold,
         CAST(COUNT(*) AS BIGINT) AS n_in_fold,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS sum_in_fold
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
totals AS (
  SELECT event_type,
         CAST(SUM(n_in_fold) AS BIGINT) AS n_tot,
         CAST(SUM(sum_in_fold) AS BIGINT) AS sum_tot
  FROM per_fold GROUP BY 1
)
SELECT p.event_type,
       CAST(p.fold AS BIGINT) AS fold,
       p.n_in_fold,
       CAST(t.n_tot - p.n_in_fold AS BIGINT) AS n_oof,
       CAST(t.sum_tot - p.sum_in_fold AS BIGINT) AS sum_oof_c,
       CASE WHEN t.n_tot = p.n_in_fold THEN NULL
            ELSE {exact_round_div_sql(
                '(t.sum_tot - p.sum_in_fold)',
                '(t.n_tot - p.n_in_fold)', '//', 2
            )} END AS enc_oof_r
FROM per_fold p JOIN totals t USING (event_type)
"""


REGISTRY["oof_target_encode_events"] = {
    "fn": oof_target_encode_events,
    "sql": _oof_sql(),
}


# --------------------------------------------------------------------------
# Feature-hashing (hashing-trick) collision audit over the document
# corpus: every token maps to bucket md5(token) % FH_BUCKETS — the
# fixed-width sparse featurization used when the vocabulary is too
# large to enumerate — and the report shows per-bucket load:
# occurrences, distinct tokens (collision degree), and document reach.
# This is the audit a pipeline runs to size the hash space (collision
# degree ≫ 1 on hot buckets ⇒ widen). Map-only until the final
# groupBy on the bucket id; the distinct-token count aggregates the
# (bucket, token) pairs, bounded by vocabulary, not corpus.
# --------------------------------------------------------------------------

FH_BUCKETS = 64


def feature_hash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import phash_spark_sql
    from de4ml_spark.operators.text import tokens
    from de4ml_spark.session import spread

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    ).filter(F.col("tok") != "")
    hashed = toks.selectExpr(
        "doc_id",
        "tok",
        f"{phash_spark_sql('tok')} % {FH_BUCKETS} AS bucket",
    )
    return (
        hashed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("tok").cast("bigint").alias("n_tokens"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .selectExpr(
            "CAST(bucket AS BIGINT) AS bucket",
            "n_occurrences",
            "n_tokens",
            "n_docs",
        )
    )


def _feature_hash_sql() -> str:
    from de4ml_spark.operators.portable_hash import phash_duck_sql

    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
hashed AS (
  SELECT doc_id, tok,
         {phash_duck_sql('tok')} % {FH_BUCKETS} AS bucket
  FROM toks WHERE tok <> ''
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM hashed
GROUP BY 1
"""


REGISTRY["feature_hash_docs"] = {
    "fn": feature_hash_docs,
    "sql": _feature_hash_sql(),
}


# --------------------------------------------------------------------------
# Deterministic negative sampling for recommender training: for the
# NEG_USERS most active customers, draw NEG_K parts the customer has
# NOT purchased. Candidates come from a seeded hash walk
# (md5(custkey, i) % |parts| for i = 1..NEG_TRIES), positives are
# removed with an anti-join against the customer's purchase set, and
# the first NEG_K surviving candidates (by draw index, duplicates
# dropped on first occurrence) are kept — fully deterministic, no RNG
# state, reproducible on any cluster layout. Scale: candidate
# generation is a map-side explode (users × NEG_TRIES rows); the
# anti-join shuffles on (custkey, partkey) against the purchase set —
# both sides key-partitioned, nothing quadratic. NEG_TRIES is sized so
# the chance of fewer than NEG_K survivors is negligible (purchase
# sets ≪ part space), and the emitted n_drawn lets the consumer see
# any shortfall.
# --------------------------------------------------------------------------

NEG_USERS = 20
NEG_K = 5
NEG_TRIES = 24


def negative_samples_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import phash_spark_sql

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    parts = load_table(spark, sf_dir, "part")
    np_ = parts.agg(F.count(F.lit(1)).alias("n_parts"))
    # o_custkey IS NOT NULL: a NULL custkey is not a user — it would
    # become a phantom sampling row whose seeded hash diverges between
    # engines (Spark CONCAT(NULL) is NULL, DuckDB CONCAT skips NULLs;
    # round-14 nulltpch parity sweep)
    top = (
        orders.filter(F.col("o_custkey").isNotNull())
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.col("o_custkey"))
        .limit(NEG_USERS)
    )
    positives = (
        orders.join(top.select("o_custkey"), "o_custkey")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .distinct()
    )
    cand = (
        top.select(F.col("o_custkey").alias("custkey"))
        .crossJoin(F.broadcast(np_))
        .selectExpr(
            "custkey",
            "n_parts",
            f"explode(sequence(1, {NEG_TRIES})) AS i",
        )
        .selectExpr(
            "custkey",
            "i",
            f"""{phash_spark_sql(
                "CONCAT('neg:', CAST(custkey AS STRING), ':',"
                " CAST(i AS STRING))"
            )} % n_parts + 1 AS partkey""",
        )
    )
    # drop duplicate candidate parts for a user (keep first draw),
    # then remove positives and keep the first NEG_K survivors
    wdup = Window.partitionBy("custkey", "partkey").orderBy("i")
    dedup = cand.withColumn("rn", F.row_number().over(wdup)).filter(
        F.col("rn") == 1
    )
    neg = dedup.join(positives, ["custkey", "partkey"], "left_anti")
    wk = Window.partitionBy("custkey").orderBy("i")
    return (
        neg.withColumn("draw_rank", F.row_number().over(wk))
        .filter(F.col("draw_rank") <= NEG_K)
        .selectExpr(
            "custkey",
            "CAST(draw_rank AS BIGINT) AS draw_rank",
            "CAST(i AS BIGINT) AS i",
            "CAST(partkey AS BIGINT) AS partkey",
        )
    )


def _neg_sql() -> str:
    from de4ml_spark.operators.portable_hash import phash_duck_sql

    return f"""
WITH np AS (SELECT COUNT(*) AS n_parts FROM part),
top AS (
  SELECT o_custkey AS custkey
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
  ORDER BY COUNT(*) DESC, o_custkey
  LIMIT {NEG_USERS}
),
positives AS (
  SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
  FROM orders o
  JOIN top t ON o.o_custkey = t.custkey
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
cand AS (
  SELECT t.custkey, i,
         {phash_duck_sql(
             "CONCAT('neg:', CAST(t.custkey AS VARCHAR), ':',"
             " CAST(i AS VARCHAR))"
         )} % np.n_parts + 1 AS partkey
  FROM top t
  CROSS JOIN np
  CROSS JOIN (SELECT unnest(generate_series(1, {NEG_TRIES})) AS i)
),
dedup AS (
  SELECT custkey, i, partkey
  FROM (
    SELECT custkey, i, partkey,
           ROW_NUMBER() OVER (PARTITION BY custkey, partkey ORDER BY i)
             AS rn
    FROM cand
  ) WHERE rn = 1
),
neg AS (
  SELECT d.custkey, d.i, d.partkey
  FROM dedup d
  WHERE NOT EXISTS (
    SELECT 1 FROM positives p
    WHERE p.custkey = d.custkey AND p.partkey = d.partkey
  )
)
SELECT custkey,
       CAST(draw_rank AS BIGINT) AS draw_rank,
       CAST(i AS BIGINT) AS i,
       CAST(partkey AS BIGINT) AS partkey
FROM (
  SELECT custkey, i, partkey,
         ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY i) AS draw_rank
  FROM neg
)
WHERE draw_rank <= {NEG_K}
"""


REGISTRY["negative_samples_orders"] = {
    "fn": negative_samples_orders,
    "sql": _neg_sql(),
}


# --------------------------------------------------------------------------
# Leave-one-source-out (LOSO) corpus influence: for every document
# source, how the corpus-level mean document length moves when that
# source is removed — the cheapest member of the data-valuation family
# (the sign/magnitude screen run before committing to expensive
# influence functions). delta = (T−T_s)/(N−N_s) − T/N is assembled as
# ONE exact 128-bit rational ((T−T_s)·N − T·(N−N_s)) / (N·(N−N_s)) and
# half-up rounded — no floating subtraction of two nearby means (which
# would cancel catastrophically AND round differently per engine).
# Scale: one groupBy per source + a broadcast single-row total; output
# is |sources| rows.
# --------------------------------------------------------------------------


def loso_source_influence_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql,
        exact_round_div_sql_wide,
    )

    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum("n_chars").alias("t_s"),
    )
    tot = per_src.agg(
        F.sum("n_s").alias("n"), F.sum("t_s").alias("t")
    )
    j = per_src.crossJoin(F.broadcast(tot)).filter("n > n_s")
    return j.selectExpr(
        "source",
        "CAST(n_s AS BIGINT) AS n_docs",
        "CAST(t_s AS BIGINT) AS sum_chars",
        f"{exact_round_div_sql('t_s', 'n_s', 'DIV', 2)} AS mean_chars_r",
        # signed exact rational: the numerator's sign decides direction
        f"""CASE WHEN (t - t_s) * CAST(n AS DECIMAL(38,0))
                  >= CAST(t AS DECIMAL(38,0)) * (n - n_s)
            THEN {exact_round_div_sql_wide(
                '((t - t_s) * CAST(n AS DECIMAL(38,0))'
                ' - CAST(t AS DECIMAL(38,0)) * (n - n_s))',
                '(CAST(n AS DECIMAL(38,0)) * (n - n_s))', 'DIV')}
            ELSE -{exact_round_div_sql_wide(
                '(CAST(t AS DECIMAL(38,0)) * (n - n_s)'
                ' - (t - t_s) * CAST(n AS DECIMAL(38,0)))',
                '(CAST(n AS DECIMAL(38,0)) * (n - n_s))', 'DIV')}
            END AS delta_mean_r""",
    )


def _loso_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql,
        exact_round_div_sql_wide,
    )

    return f"""
WITH per_src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s,
         CAST(SUM(n_chars) AS BIGINT) AS t_s
  FROM documents GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_s) AS BIGINT) AS n, CAST(SUM(t_s) AS BIGINT) AS t
  FROM per_src
)
SELECT source,
       n_s AS n_docs,
       t_s AS sum_chars,
       {exact_round_div_sql('t_s', 'n_s', '//', 2)} AS mean_chars_r,
       CASE WHEN (t - t_s) * CAST(n AS HUGEINT)
                 >= CAST(t AS HUGEINT) * (n - n_s)
       THEN {exact_round_div_sql_wide(
           '((t - t_s) * CAST(n AS HUGEINT)'
           ' - CAST(t AS HUGEINT) * (n - n_s))',
           '(CAST(n AS HUGEINT) * (n - n_s))', '//')}
       ELSE -{exact_round_div_sql_wide(
           '(CAST(t AS HUGEINT) * (n - n_s)'
           ' - (t - t_s) * CAST(n AS HUGEINT))',
           '(CAST(n AS HUGEINT) * (n - n_s))', '//')}
       END AS delta_mean_r
FROM per_src CROSS JOIN tot
WHERE n > n_s
"""


REGISTRY["loso_source_influence_docs"] = {
    "fn": loso_source_influence_docs,
    "sql": _loso_sql(),
}


# --------------------------------------------------------------------------
# Quantile normalization of document lengths across sources — the
# batch-effect correction that forces every source's length
# distribution onto the POOLED distribution (as in cross-assay
# normalization): a doc at relative rank r within its source maps to
# the pooled value at the same relative rank. Exact: ranks are
# deterministic row_numbers under (n_chars, doc_id) total order, the
# target index is the half-up integer round of (r−1)(N−1)/(n_s−1)
# (integer arithmetic only), and the mapped value is an equi-join on
# that index — no interpolation floats anywhere. Scale: BOTH rank
# passes are distributed (operators/rank.py): the pooled index is a
# range-partitioned rank with broadcast partition offsets (no
# unpartitioned WindowExec — the naive Window.orderBy pulls the whole
# corpus to one partition), and the per-source rank is the grouped
# variant of the same recipe (a handful of sources would otherwise
# each be one executor's sort). Per-source sizes come from a tiny
# broadcast aggregate; the final mapping is an equi-join on the
# pooled index.
# --------------------------------------------------------------------------


def quantile_normalize_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.rank import (
        with_global_rank,
        with_grouped_rank,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    # null-safe size join: a NULL source forms its own rank group, and
    # an inner equi-join on "source" would silently drop it
    src_sizes = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("ns")
    ).withColumnRenamed("source", "__src")
    ranked = (
        with_grouped_rank(
            docs, ["source"], ["n_chars", "doc_id"], out_col="r"
        )
        .join(
            F.broadcast(src_sizes),
            F.col("source").eqNullSafe(F.col("__src")),
        )
        .drop("__src")
    )
    pooled = with_global_rank(
        docs, ["n_chars", "doc_id"], out_col="idx"
    ).select("idx", F.col("n_chars").alias("pooled_chars"))
    tot = docs.agg(F.count(F.lit(1)).alias("nn"))
    target = ranked.crossJoin(F.broadcast(tot)).selectExpr(
        "doc_id",
        "source",
        "n_chars",
        "r",
        "ns",
        # half-up integer round of (r-1)(N-1)/(ns-1), 1-based index;
        # a single-doc source maps to the pooled median index
        """CASE WHEN ns = 1
           THEN CAST((nn + 1) DIV 2 AS BIGINT)
           ELSE CAST((2 * (r - 1) * (nn - 1) + (ns - 1))
                DIV (2 * (ns - 1)) AS BIGINT) + 1 END AS idx""",
    )
    # plain equi-join on the unique pooled rank — `pooled` is corpus-
    # sized, never a broadcast candidate
    return target.join(pooled, "idx").selectExpr(
        "doc_id",
        "source",
        "CAST(n_chars AS BIGINT) AS n_chars",
        "CAST(r AS BIGINT) AS src_rank",
        "CAST(pooled_chars AS BIGINT) AS qnorm_chars",
    )


QNORM_SQL = """
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY source) AS ns
  FROM documents
),
pooled AS (
  SELECT ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS idx,
         n_chars AS pooled_chars
  FROM documents
),
tot AS (SELECT COUNT(*) AS nn FROM documents),
target AS (
  SELECT doc_id, source, n_chars, r, ns,
         CASE WHEN ns = 1
              THEN CAST((nn + 1) // 2 AS BIGINT)
              ELSE CAST((2 * (r - 1) * (nn - 1) + (ns - 1))
                   // (2 * (ns - 1)) AS BIGINT) + 1 END AS idx
  FROM ranked CROSS JOIN tot
)
SELECT t.doc_id, t.source,
       CAST(t.n_chars AS BIGINT) AS n_chars,
       CAST(t.r AS BIGINT) AS src_rank,
       CAST(p.pooled_chars AS BIGINT) AS qnorm_chars
FROM target t JOIN pooled p USING (idx)
"""

REGISTRY["quantile_normalize_docs"] = {
    "fn": quantile_normalize_docs,
    "sql": QNORM_SQL,
}


# --------------------------------------------------------------------------
# Popularity-baseline recommender evaluation: train on the first ~75%
# of order dates (global top-K most-purchased parts, deterministic
# (count DESC, partkey) order), recommend that same top-K to every
# customer, and score hit-rate@K against each customer's HELD-OUT
# purchases — the baseline every recommender must beat, and the
# evaluation-harness shape (temporal split, per-user hit counting)
# reused by any real model. Exact integers end-to-end; the split date
# is the 75th-percentile order date by deterministic rank. Scale: the
# recommend step is a broadcast of K part ids; scoring is one semi-join
# per held-out purchase set, keyed by customer.
# --------------------------------------------------------------------------

POP_K = 20
POP_SPLIT_NUM = 3  # train on the first 3/4 of the order-date range
POP_SPLIT_DEN = 4


def popularity_hitrate_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("od")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    split = orders.agg(
        F.expr(
            f"CAST(date_add(MIN(od), CAST(datediff(MAX(od), MIN(od))"
            f" * {POP_SPLIT_NUM} DIV {POP_SPLIT_DEN} AS INT)) AS DATE)"
        ).alias("split_day")
    )
    o = orders.crossJoin(F.broadcast(split))
    train_orders = o.filter("od <= split_day")
    test_orders = o.filter("od > split_day")
    topk = (
        train_orders.join(li, train_orders.o_orderkey == li.l_orderkey)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col("l_partkey"))
        .limit(POP_K)
        .select("l_partkey")
    )
    holdout = (
        test_orders.join(li, test_orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    hits = holdout.join(F.broadcast(topk), "l_partkey", "left_semi")
    per_cust = holdout.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_holdout")
    )
    per_hit = hits.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        per_cust.join(per_hit, "o_custkey", "left")
        .na.fill({"n_hits": 0})
        .selectExpr(
            "o_custkey AS custkey",
            "CAST(n_holdout AS BIGINT) AS n_holdout",
            "CAST(n_hits AS BIGINT) AS n_hits",
            f"{exact_round_div_sql('n_hits', 'n_holdout', 'DIV')}"
            " AS hitrate_r",
        )
    )


def _pop_sql() -> str:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    return f"""
WITH o AS (
  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od
  FROM orders
),
split AS (
  SELECT MIN(od) + TO_DAYS(CAST(datediff('day', MIN(od), MAX(od))
         * {POP_SPLIT_NUM} // {POP_SPLIT_DEN} AS INT)) AS split_day
  FROM o
),
train_orders AS (
  SELECT o.* FROM o CROSS JOIN split WHERE od <= split_day
),
test_orders AS (
  SELECT o.* FROM o CROSS JOIN split WHERE od > split_day
),
topk AS (
  SELECT l.l_partkey
  FROM train_orders t JOIN lineitem l ON t.o_orderkey = l.l_orderkey
  GROUP BY 1
  ORDER BY COUNT(*) DESC, l.l_partkey
  LIMIT {POP_K}
),
holdout AS (
  SELECT DISTINCT t.o_custkey, l.l_partkey
  FROM test_orders t JOIN lineitem l ON t.o_orderkey = l.l_orderkey
),
per_cust AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_holdout
  FROM holdout GROUP BY 1
),
per_hit AS (
  SELECT h.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM holdout h JOIN topk USING (l_partkey)
  GROUP BY 1
)
SELECT c.o_custkey AS custkey,
       c.n_holdout,
       COALESCE(h.n_hits, 0) AS n_hits,
       {exact_round_div_sql(
           'COALESCE(h.n_hits, 0)', 'c.n_holdout', '//'
       )} AS hitrate_r
FROM per_cust c LEFT JOIN per_hit h USING (o_custkey)
"""


REGISTRY["popularity_hitrate_orders"] = {
    "fn": popularity_hitrate_orders,
    "sql": _pop_sql(),
}


# --------------------------------------------------------------------------
# MAP@K for the popularity recommender — the rank-aware companion of
# popularity_hitrate_orders (same temporal split, same top-K list):
# average precision walks the RANKED recommendation list and averages
# precision at each hit position, so ranking the hits early matters.
# Exactness: per-customer AP = (1/min(K,|holdout|)) Σ_hits
# (hits_so_far / position) is a sum of small rationals — each term is
# half-up micro-quantized (positions ≤ K bound the denominators), the
# AP is an exact integer in micros, and the mean AP is one exact
# half-up division. Scale: identical posture to the hit-rate entry —
# broadcast top-K, one semi-join keyed by customer; the per-customer
# position walk is a window over ≤ K rows.
# --------------------------------------------------------------------------


def map_at_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    split = orders.agg(
        F.expr(
            f"CAST(date_add(MIN(od), CAST(datediff(MAX(od), MIN(od))"
            f" * {POP_SPLIT_NUM} DIV {POP_SPLIT_DEN} AS INT)) AS DATE)"
        ).alias("split_day")
    )
    o = orders.crossJoin(F.broadcast(split))
    train_orders = o.filter("od <= split_day")
    test_orders = o.filter("od > split_day")
    topk = (
        train_orders.join(li, train_orders.o_orderkey == li.l_orderkey)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col("l_partkey"))
        .limit(POP_K)
        .selectExpr(
            "l_partkey",
            "ROW_NUMBER() OVER (ORDER BY cnt DESC, l_partkey) AS pos",
        )
    )
    holdout = (
        test_orders.join(li, test_orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    n_hold = holdout.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_holdout")
    )
    hits = holdout.join(F.broadcast(topk), "l_partkey").select(
        "o_custkey", "pos"
    )
    wpos = Window.partitionBy("o_custkey").orderBy("pos")
    ap_terms = hits.select(
        "o_custkey",
        "pos",
        F.row_number().over(wpos).alias("hit_idx"),
    ).selectExpr(
        "o_custkey",
        # precision-at-hit in half-up micros: hit_idx / pos
        "CAST((2 * hit_idx * 1000000 + pos) DIV (2 * pos) AS BIGINT)"
        " AS prec_u",
    )
    ap = (
        ap_terms.groupBy("o_custkey")
        .agg(F.sum("prec_u").alias("sum_prec_u"))
        .join(n_hold, "o_custkey", "right")
        .na.fill({"sum_prec_u": 0})
        .selectExpr(
            "o_custkey",
            "n_holdout",
            f"""CAST((2 * sum_prec_u + LEAST(n_holdout, {POP_K}))
               DIV (2 * LEAST(n_holdout, {POP_K})) AS BIGINT)
               AS ap_u""",
        )
    )
    tot = ap.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("ap_u").cast("bigint").alias("sum_ap_u"),
    )
    return tot.selectExpr(
        "n_customers",
        "sum_ap_u",
        f"""({exact_round_div_sql('sum_ap_u', 'n_customers * 1000000',
                                  'DIV')}) AS map_r""",
    )


def _map_sql() -> str:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    return f"""
WITH o AS (
  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od
  FROM orders
),
split AS (
  SELECT MIN(od) + TO_DAYS(CAST(datediff('day', MIN(od), MAX(od))
         * {POP_SPLIT_NUM} // {POP_SPLIT_DEN} AS INT)) AS split_day
  FROM o
),
train_orders AS (
  SELECT o.* FROM o CROSS JOIN split WHERE od <= split_day
),
test_orders AS (
  SELECT o.* FROM o CROSS JOIN split WHERE od > split_day
),
topk AS (
  SELECT l_partkey,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, l_partkey) AS pos
  FROM (
    SELECT l.l_partkey, COUNT(*) AS cnt
    FROM train_orders t JOIN lineitem l ON t.o_orderkey = l.l_orderkey
    GROUP BY 1
    ORDER BY cnt DESC, l.l_partkey
    LIMIT {POP_K}
  )
),
holdout AS (
  SELECT DISTINCT t.o_custkey, l.l_partkey
  FROM test_orders t JOIN lineitem l ON t.o_orderkey = l.l_orderkey
),
n_hold AS (
  SELECT o_custkey, COUNT(*) AS n_holdout FROM holdout GROUP BY 1
),
hits AS (
  SELECT h.o_custkey, k.pos
  FROM holdout h JOIN topk k USING (l_partkey)
),
ap_terms AS (
  SELECT o_custkey,
         CAST((2 * hit_idx * 1000000 + pos) // (2 * pos) AS BIGINT)
           AS prec_u
  FROM (
    SELECT o_custkey, pos,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY pos)
             AS hit_idx
    FROM hits
  )
),
ap AS (
  SELECT n.o_custkey, n.n_holdout,
         CAST((2 * COALESCE(s.sum_prec_u, 0)
               + LEAST(n.n_holdout, {POP_K}))
              // (2 * LEAST(n.n_holdout, {POP_K})) AS BIGINT) AS ap_u
  FROM n_hold n
  LEFT JOIN (
    SELECT o_custkey, SUM(prec_u) AS sum_prec_u
    FROM ap_terms GROUP BY 1
  ) s USING (o_custkey)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(ap_u) AS BIGINT) AS sum_ap_u,
       ({exact_round_div_sql('CAST(SUM(ap_u) AS BIGINT)',
                             'CAST(COUNT(*) AS BIGINT) * 1000000',
                             '//')}) AS map_r
FROM ap
"""


REGISTRY["map_at_k_orders"] = {
    "fn": map_at_k_orders,
    "sql": _map_sql(),
}
