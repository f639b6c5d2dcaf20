"""Text-analysis queries over the ``documents`` table (extension tier M5):
token counting, quality scoring, language-ID, fingerprinting, sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de4ml_spark.operators.sessions import sessionize
from de4ml_spark.operators.text import (
    LANG_MARKERS,
    fingerprint,
    predict_lang,
    token_stats,
)
from de4ml_spark.session import load_table


def text_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.session import spread

    # spread: row-local regexp work — widen a small-file scan to full
    # parallelism (no-op on naturally-split scans; still zero aggregate
    # or join shuffles)
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return token_stats(docs).select(
        "doc_id", "n_tokens", "n_pieces", "n_alpha", "n_chars_nospace"
    )


TEXT_STATS_SQL = r"""
SELECT
  doc_id,
  len(string_split(text, ' ')) AS n_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_pieces,
  len(regexp_extract_all(text, '[A-Za-z]+')) AS n_alpha,
  length(regexp_replace(text, '\s', '', 'g')) AS n_chars_nospace
FROM documents
"""


# Exact rational rounding: every reported value here is a ratio of
# integers, and ROUND(double, 6) is NOT engine-stable when the true value
# sits at a half-way boundary (observed at sf0.001: Spark 0.518688 vs
# DuckDB 0.518687 for the same score) — see
# portable_hash.exact_round_div_sql. The quality score itself is the
# rational
#   N / D,  N = 32*min(n_tok,100)*n_tok + 2400*(n_tok - n_stop)
#                + 300*min(nospace, 8*n_tok),      D = 8000*n_tok
# (common-denominator form of 0.4*min(n_tok/100,1) + 0.3*(1-stop_ratio)
# + 0.3*min(avg_len/8,1)).

from de4ml_spark.operators.portable_hash import exact_round_div_sql


def _round6_div(p: str, q: str) -> str:
    return exact_round_div_sql(p, q, "{div}")


_QN = (
    "(32 * least(n_tok, 100) * n_tok + 2400 * (n_tok - n_stop)"
    " + 300 * least(nospace, 8 * n_tok))"
)
_QD = "(8000 * n_tok)"


def quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.text import STOPWORDS, marker_hits, tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    ints = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tok"),
        marker_hits(toks, STOPWORDS).cast("bigint").alias("n_stop"),
        F.length(F.regexp_replace(F.col("text"), r"\s", ""))
        .cast("bigint")
        .alias("nospace"),
    )
    d = {"div": "DIV"}
    return ints.select(
        "doc_id",
        F.expr(_round6_div("n_stop", "n_tok").format(**d)).alias(
            "stop_ratio_r"
        ),
        F.expr(_round6_div("nospace", "n_tok").format(**d)).alias(
            "avg_word_len_r"
        ),
        F.expr(_round6_div(_QN, _QD).format(**d)).alias("quality_r"),
    )


QUALITY_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST(len(list_filter(string_split(text, ' '),
                  x -> list_contains(['the','a','of','and'], x)))
              AS BIGINT) AS n_stop,
         CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS nospace
  FROM documents
)
SELECT
  doc_id,
  {sr} AS stop_ratio_r,
  {awl} AS avg_word_len_r,
  {q} AS quality_r
FROM t
""".format(
    sr=_round6_div("n_stop", "n_tok").format(div="//"),
    awl=_round6_div("nospace", "n_tok").format(div="//"),
    q=_round6_div(_QN, _QD).format(div="//"),
)


def lang_id_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return predict_lang(docs).select(
        "doc_id",
        *[f"score_{lg}" for lg in sorted(LANG_MARKERS)],
        "pred_lang",
    )


def _lang_sql() -> str:
    langs = sorted(LANG_MARKERS)
    score_exprs = ",\n  ".join(
        "len(list_filter(string_split(text, ' '), x -> list_contains(["
        + ", ".join(f"'{w}'" for w in LANG_MARKERS[lg])
        + f"], x))) AS score_{lg}"
        for lg in langs
    )
    greatest = "GREATEST(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    case = " ".join(
        f"WHEN score_{lg} = {greatest} THEN '{lg}'" for lg in langs
    )
    return f"""
WITH s AS (
  SELECT doc_id,
  {score_exprs}
  FROM documents
)
SELECT doc_id, {', '.join('score_' + lg for lg in langs)},
       CASE {case} END AS pred_lang
FROM s
"""


LANG_ID_SQL = _lang_sql()


def fingerprint_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint(docs).select("doc_id", "fingerprint")


FINGERPRINT_SQL = r"""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
FROM documents
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.session import spread

    # spread: the session-window merge is this query's whole cost — widen
    # the key exchange to full parallelism when a small-file scan would
    # leave cores idle (no-op on naturally-split scans; batch-only, the
    # streaming path uses the sessionize operator directly)
    ev = spread(load_table(spark, sf_dir, "events"), "user_id")
    return sessionize(ev, key="user_id", ts_col="ts", gap="30 minutes")


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT *, SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, value
           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, session_id
"""


def quality_rank_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source rank normalization of the quality score (percent_rank in
    [0,1]) — the scale-free form curricula and mixture policies consume
    (absolute score distributions differ per source; ranks don't).
    percent_rank = (rank-1)/(n-1) is a single integer division, so the
    raw doubles are engine-identical with no rounding hedge; ties share a
    rank by definition.

    Scale: one shuffle on source + a per-partition sort — the plain
    ranking-window shape."""
    from pyspark.sql import Window

    from de4ml_spark.operators.text import quality_score

    # a NULL-text doc has no quality score to rank — filter on both
    # engines (round-14 nulldocs sweep: a NULL score orders FIRST on
    # Spark and LAST on DuckDB, skewing every percent_rank after it)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    w = Window.partitionBy("source").orderBy(F.col("quality").asc())
    return quality_score(docs).select(
        "doc_id",
        "source",
        F.percent_rank().over(w).alias("quality_pct_rank"),
    )


QUALITY_RANK_SQL = r"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE text IS NOT NULL),
q AS (
  SELECT d.doc_id, d.source,
         0.4 * LEAST(len(t.toks) / 100.0, 1.0)
       + 0.3 * (1.0 - len(list_filter(t.toks,
                    x -> list_contains(['the','a','of','and'], x))) * 1.0 / len(t.toks))
       + 0.3 * LEAST((length(regexp_replace(d.text, '\s', '', 'g')) * 1.0
                      / len(t.toks)) / 8.0, 1.0) AS quality
  FROM documents d JOIN t ON d.doc_id = t.doc_id
)
SELECT doc_id, source,
       PERCENT_RANK() OVER (PARTITION BY source ORDER BY quality ASC)
         AS quality_pct_rank
FROM q
"""


REGISTRY: dict[str, dict] = {
    "quality_rank_normalized": {
        "fn": quality_rank_normalized,
        "sql": QUALITY_RANK_SQL,
    },
    "text_stats_docs": {"fn": text_stats_docs, "sql": TEXT_STATS_SQL},
    "quality_docs": {"fn": quality_docs, "sql": QUALITY_SQL},
    "lang_id_docs": {"fn": lang_id_docs, "sql": LANG_ID_SQL},
    "fingerprint_docs": {"fn": fingerprint_docs, "sql": FINGERPRINT_SQL},
    "sessionize_events": {"fn": sessionize_events, "sql": SESSIONIZE_SQL},
}
