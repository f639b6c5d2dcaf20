"""Second profiling tier: equi-width histograms, exact top-k frequent
values, and a correlation battery — the profile surface beyond SUMMARIZE
(A1) that real data-quality tooling adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from de4ml_spark.session import load_table

# --------------------------------------------------------------------------
# Equi-width histogram: fixed domain bounds -> bin = floor((x-lo)/w),
# clamped to [0, bins-1]. One scan + one tiny shuffle on the bin id. At
# 100 TB this is the map-side-combine-friendly histogram (each task emits
# <= bins partial counts).
# --------------------------------------------------------------------------

QTY_LO, QTY_HI, QTY_BINS = 0.0, 50.0, 10


def histogram_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = (QTY_HI - QTY_LO) / QTY_BINS
    bin_id = F.least(
        F.greatest(
            F.floor((F.col("l_quantity") - QTY_LO) / w).cast("int"), F.lit(0)
        ),
        F.lit(QTY_BINS - 1),
    )
    return (
        li.groupBy(bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("lo", F.lit(QTY_LO) + F.col("bin") * w)
        .withColumn("hi", F.lit(QTY_LO) + (F.col("bin") + 1) * w)
    )


HISTOGRAM_SQL = f"""
SELECT LEAST(GREATEST(CAST(FLOOR((l_quantity - {QTY_LO}) / 5.0) AS INT), 0),
             {QTY_BINS - 1}) AS bin,
       COUNT(*) AS n,
       CAST({QTY_LO} + LEAST(GREATEST(CAST(FLOOR((l_quantity - {QTY_LO}) / 5.0)
             AS INT), 0), {QTY_BINS - 1}) * 5.0 AS DOUBLE) AS lo,
       CAST({QTY_LO} + (LEAST(GREATEST(CAST(FLOOR((l_quantity - {QTY_LO}) / 5.0)
             AS INT), 0), {QTY_BINS - 1}) + 1) * 5.0 AS DOUBLE) AS hi
FROM lineitem
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Exact top-k most frequent values per (string) column: unpivot -> count ->
# per-column rank. The unpivot multiplies rows by the column count, but
# map-side partial aggregation collapses to (col, value) cardinality before
# the shuffle.
# --------------------------------------------------------------------------

TOPK_COLS = ["o_orderpriority", "o_orderstatus"]
TOPK = 3


def topk_values_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    stacked = orders.select(
        F.expr(
            "stack({n}, {args}) as (col_name, value)".format(
                n=len(TOPK_COLS),
                args=", ".join(f"'{c}', {c}" for c in TOPK_COLS),
            )
        )
    )
    counts = stacked.groupBy("col_name", "value").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("col_name").orderBy(F.desc("n"), F.asc("value"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
    )


TOPK_SQL = f"""
WITH stacked AS (
  SELECT 'o_orderpriority' AS col_name, o_orderpriority AS value FROM orders
  UNION ALL
  SELECT 'o_orderstatus', o_orderstatus FROM orders
),
counts AS (
  SELECT col_name, value, COUNT(*) AS n FROM stacked GROUP BY 1, 2
)
SELECT col_name, value, n,
       ROW_NUMBER() OVER (PARTITION BY col_name
                          ORDER BY n DESC, value ASC) AS rank
FROM counts
QUALIFY rank <= {TOPK}
"""


# --------------------------------------------------------------------------
# Correlation battery: pairwise Pearson correlations in ONE aggregate pass
# (co-moment aggregates are order-sensitive in the last ulps, so values are
# rounded to 6 before compare).
# --------------------------------------------------------------------------

def corr_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlations from exact integer-cent moments (the
    exactness tier) rather than the engines' corr() aggregates:
    Spark 4's ANSI corr raises DIVIDE_BY_ZERO on a zero-variance
    column (constant shard) where DuckDB's returns NULL — and the two
    implementations only agreed to 6dp by luck of rounding. The
    moment sums are exact 128-bit integers; each correlation is one
    engine-identical IEEE chain, NULL when a column is constant."""
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "CAST(l_quantity AS BIGINT) AS x",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " AS y",
        "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS z",
        "CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS w",
    )
    big = "DECIMAL(38,0)"
    mom = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.sum(c).cast("bigint").alias(f"s{c}")
            for c in ("x", "y", "z", "w")
        ],
        *[
            F.sum(F.expr(f"CAST({a} AS {big}) * {b}")).alias(f"s{a}{b}")
            for a, b in (
                ("x", "x"), ("y", "y"), ("z", "z"), ("w", "w"),
                ("x", "y"), ("x", "z"), ("y", "w"),
            )
        ],
    )
    return mom.selectExpr(
        f"{_corr_expr('x', 'y', 'DIV')} AS qty_price",
        f"{_corr_expr('x', 'z', 'DIV')} AS qty_disc",
        f"{_corr_expr('y', 'w', 'DIV')} AS price_tax",
    )


def _corr_expr(a: str, b: str, div: str) -> str:
    big = "DECIMAL(38,0)" if div.upper() == "DIV" else "HUGEINT"
    num = f"CAST(CAST(n AS {big}) * s{a}{b} - CAST(s{a} AS {big}) * s{b} AS DOUBLE)"
    da = f"CAST(CAST(n AS {big}) * s{a}{a} - CAST(s{a} AS {big}) * s{a} AS DOUBLE)"
    db = f"CAST(CAST(n AS {big}) * s{b}{b} - CAST(s{b} AS {big}) * s{b} AS DOUBLE)"
    return f"({num} / NULLIF(sqrt({da} * {db}), 0.0))"


def _corr_sql() -> str:
    return f"""
WITH li AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS y,
         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS z,
         CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
  FROM lineitem
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(z) AS BIGINT) AS sz, CAST(SUM(w) AS BIGINT) AS sw,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy,
         SUM(CAST(z AS HUGEINT) * z) AS szz,
         SUM(CAST(w AS HUGEINT) * w) AS sww,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * z) AS sxz,
         SUM(CAST(y AS HUGEINT) * w) AS syw
  FROM li
)
SELECT {_corr_expr('x', 'y', '//')} AS qty_price,
       {_corr_expr('x', 'z', '//')} AS qty_disc,
       {_corr_expr('y', 'w', '//')} AS price_tax
FROM mom
"""


CORR_SQL = _corr_sql()


# --------------------------------------------------------------------------
# Profile drift: day-over-day comparison of the events value profile — the
# monitoring surface on top of profiling (dataops' feedback loop compares
# fresh traffic against the profiled contract; this compares two profile
# snapshots directly). One scan, conditional aggregates per day, drift
# deltas in the projection.
# --------------------------------------------------------------------------

DRIFT_D1, DRIFT_D2 = "2024-01-01", "2024-01-02"


def profile_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    d1 = day == F.lit(DRIFT_D1).cast("date")
    d2 = day == F.lit(DRIFT_D2).cast("date")

    # Means use engine-exact integer rounding: value sits on a 2-decimal
    # grid, so ROUND(AVG(value), 6) on the double quotient lands exactly on
    # half boundaries at material rates (see portable_hash.
    # exact_round_div_sql) — sum exact cents, half-up integer divide.
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    flagged = ev.select(
        "value", d1.alias("is_d1"), d2.alias("is_d2")
    )

    def stats(flag, suffix):
        return [
            F.expr(f"COUNT(CASE WHEN {flag} THEN 1 END)").alias(
                f"n_{suffix}"
            ),
            # NULLIF: a day with zero (matching) rows must yield NULL
            # stats, not DIVIDE_BY_ZERO — a partition-pruned read that
            # misses the comparison days is routine at scale
            F.expr(
                exact_round_div_sql(
                    f"CAST(SUM(CASE WHEN {flag} THEN "
                    "CAST(value AS DECIMAL(14,2)) END) * 100 AS BIGINT)",
                    f"NULLIF(COUNT(CASE WHEN {flag} AND value IS NOT NULL "
                    "THEN 1 END), 0) * 100",
                    "DIV",
                )
            ).alias(f"mean_{suffix}"),
            F.expr(
                exact_round_div_sql(
                    f"COUNT(CASE WHEN {flag} AND value IS NULL THEN 1 END)",
                    f"NULLIF(COUNT(CASE WHEN {flag} THEN 1 END), 0)",
                    "DIV",
                )
            ).alias(f"null_rate_{suffix}"),
        ]

    agged = flagged.agg(*stats("is_d1", "d1"), *stats("is_d2", "d2"))
    return agged.select(
        "*",
        F.round(F.col("mean_d2") - F.col("mean_d1"), 6).alias("mean_shift"),
        F.round(F.col("null_rate_d2") - F.col("null_rate_d1"), 6).alias(
            "null_rate_shift"
        ),
    )


def _drift_stats_duck(day: str, suffix: str) -> str:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    flag = f"CAST(ts AS DATE) = DATE '{day}'"
    mean = exact_round_div_sql(
        f"CAST(SUM(CASE WHEN {flag} THEN CAST(value AS DECIMAL(14,2)) END)"
        " * 100 AS BIGINT)",
        f"NULLIF(COUNT(CASE WHEN {flag} AND value IS NOT NULL THEN 1 END), 0)"
        " * 100",
        "//",
    )
    null_rate = exact_round_div_sql(
        f"COUNT(CASE WHEN {flag} AND value IS NULL THEN 1 END)",
        f"NULLIF(COUNT(CASE WHEN {flag} THEN 1 END), 0)",
        "//",
    )
    return (
        f"COUNT(CASE WHEN {flag} THEN 1 END) AS n_{suffix},\n"
        f"         {mean} AS mean_{suffix},\n"
        f"         {null_rate} AS null_rate_{suffix}"
    )


DRIFT_SQL = f"""
WITH a AS (
  SELECT {_drift_stats_duck(DRIFT_D1, 'd1')},
         {_drift_stats_duck(DRIFT_D2, 'd2')}
  FROM events
)
SELECT *, ROUND(mean_d2 - mean_d1, 6) AS mean_shift,
       ROUND(null_rate_d2 - null_rate_d1, 6) AS null_rate_shift
FROM a
"""


REGISTRY: dict[str, dict] = {
    "histogram_quantity": {"fn": histogram_quantity, "sql": HISTOGRAM_SQL},
    "topk_values_orders": {"fn": topk_values_orders, "sql": TOPK_SQL},
    "corr_lineitem": {"fn": corr_lineitem, "sql": CORR_SQL},
    "profile_drift_events": {"fn": profile_drift_events, "sql": DRIFT_SQL},
}


# --------------------------------------------------------------------------
# Anomaly detection: daily purchase-volume z-scores — flag days deviating
# > 2 sigma from the corpus mean. Two-level aggregate (daily totals, then
# global moments via a window over the tiny daily table) — the monitoring
# query that sits on top of the A3 alert stream.
# --------------------------------------------------------------------------

def anomalous_days_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine bit-stability: window AVG/STDDEV over doubles sum in
    engine-specific order (last-ulp drift that a 6-dp round can surface),
    so moments come from EXACT decimal sums (S1, S2) broadcast as one row,
    and mean/variance/z are the SAME IEEE expression text in both engines
    — identical operands + identical ops = identical doubles, then sqrt is
    IEEE-exact. The broadcast stats row also beats the whole-partition
    window the original formulation needed."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("td")
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("td").cast("double").alias("s1"),
        F.sum(F.col("td") * F.col("td")).cast("double").alias("s2"),
    )
    scored = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        F.col("td").cast("double").alias("total"),
        # GREATEST+NULLIF (round-14 one-class parity sweep): n = 1 days
        # zero the (n-1) factor (ANSI DIVIDE_BY_ZERO on Spark), constant
        # totals zero the variance (z division by 0.0), and ulp noise
        # can push the exact-zero variance a hair negative (DuckDB sqrt
        # RAISES on negatives) — z degrades to NULL on both engines
        F.expr(
            "round((CAST(td AS DOUBLE) - s1 / n)"
            " / NULLIF(sqrt(GREATEST((n * s2 - s1 * s1)"
            " / NULLIF(CAST(n * (n - 1) AS DOUBLE), 0.0), 0.0)),"
            " 0.0), 6)"
        ).alias("z"),
    )
    return scored.withColumn("is_anomaly", F.abs(F.col("z")) > 2)


ANOMALY_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS td
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
stats AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(td) AS DOUBLE) AS s1,
         CAST(SUM(td * td) AS DOUBLE) AS s2
  FROM daily
),
scored AS (
  SELECT day, CAST(td AS DOUBLE) AS total,
         ROUND((CAST(td AS DOUBLE) - s1 / n)
               / NULLIF(sqrt(GREATEST((n * s2 - s1 * s1)
                 / NULLIF(CAST(n * (n - 1) AS DOUBLE), 0.0), 0.0)),
                 0.0), 6) AS z
  FROM daily CROSS JOIN stats
)
SELECT *, ABS(z) > 2 AS is_anomaly FROM scored
"""


REGISTRY["anomalous_days_events"] = {
    "fn": anomalous_days_events,
    "sql": ANOMALY_SQL,
}


# --------------------------------------------------------------------------
# Per-group exact quantiles: value quartiles per event type, histogram-
# based (profile/battery.py: grouped_exact_quantiles) — the cumulative-
# count interpolation matches DuckDB's quantile_cont exactly and never
# buffers raw rows (the F.percentile formulation it replaced does).
# --------------------------------------------------------------------------

def value_quartiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.profile.battery import grouped_exact_quantiles

    ev = load_table(spark, sf_dir, "events")
    q = grouped_exact_quantiles(
        ev, ["event_type"], "value", [0.25, 0.5, 0.75]
    )
    return q.select(
        "event_type",
        F.round("q25", 6).alias("q25"),
        F.round("q50", 6).alias("q50"),
        F.round("q75", 6).alias("q75"),
        "n",
    )


QUARTILES_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.25), 6) AS q25,
       ROUND(quantile_cont(value, 0.50), 6) AS q50,
       ROUND(quantile_cont(value, 0.75), 6) AS q75,
       COUNT(value) AS n
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
"""
# WHERE: all-NULL-shard parity — the Spark histogram-quantile path
# builds groups from non-NULL values only, so a type whose values are
# entirely NULL yields no row; quantile_cont/COUNT(value) already
# ignore NULLs, so this is value-identical on any real shard.


REGISTRY["value_quartiles_by_type"] = {
    "fn": value_quartiles_by_type,
    "sql": QUARTILES_SQL,
}


# --------------------------------------------------------------------------
# Equi-DEPTH histogram (quantile bins) on l_extendedprice — the adaptive
# counterpart of the fixed-width histogram above: bin edges are the exact
# deciles (histogram-based, no raw-row buffering), bin populations are
# ~equal by construction. The edge table is 1 row broadcast; assignment is
# a map-only comparison sum.
# --------------------------------------------------------------------------

_ED_BINS = 10


def equidepth_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.profile.battery import grouped_exact_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    ps = [i / _ED_BINS for i in range(1, _ED_BINS)]
    edges = grouped_exact_quantiles(
        li.withColumn("__g", F.lit(1)), ["__g"], "l_extendedprice", ps
    ).select(*[F.col(f"q{int(p * 100)}").alias(f"e{k}") for k, p in enumerate(ps)])
    binexpr = F.lit(1)
    for k in range(len(ps)):
        binexpr = binexpr + F.when(
            F.col("l_extendedprice") > F.col(f"e{k}"), 1
        ).otherwise(0)
    return (
        li.select("l_extendedprice")
        .crossJoin(F.broadcast(edges))
        .groupBy(binexpr.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
    )


def _equidepth_sql() -> str:
    ps = [i / _ED_BINS for i in range(1, _ED_BINS)]
    edges = ",\n         ".join(
        f"quantile_cont(l_extendedprice, {p}) AS e{k}"
        for k, p in enumerate(ps)
    )
    bins = " + ".join(
        f"(CASE WHEN l_extendedprice > e{k} THEN 1 ELSE 0 END)"
        for k in range(len(ps))
    )
    return f"""
WITH edges AS (
  SELECT {edges}
  FROM lineitem
)
SELECT 1 + {bins} AS bin,
       COUNT(*) AS n,
       ROUND(MIN(l_extendedprice), 2) AS lo,
       ROUND(MAX(l_extendedprice), 2) AS hi
FROM lineitem CROSS JOIN edges
GROUP BY 1
"""


REGISTRY["equidepth_price_histogram"] = {
    "fn": equidepth_price_histogram,
    "sql": _equidepth_sql(),
}


# --------------------------------------------------------------------------
# Interval-overlap join, binned: which user sessions overlap alert windows
# (the "incident attribution" query). Spark has no native range join — the
# naive predicate join executes as BroadcastNestedLoopJoin, O(|S| x |W|)
# with no codegen. The scale decomposition: explode each interval into the
# fixed-width time bins it spans (a session of length L yields ~L/width
# rows), equi-join on the bin key (shuffle hash join — linear, skew-free
# when bins are time-uniform), de-duplicate pairs, then verify the EXACT
# overlap predicate (here the verify is provably a no-op — windows are
# exactly one bin — but the filter stays: it is the load-bearing step
# whenever bin width < interval length on both sides). The DuckDB oracle
# is the textbook range join (IEJoin) over the same intervals.
# --------------------------------------------------------------------------

def session_alert_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.sessions import sessionize

    ev = load_table(spark, sf_dir, "events")
    sessions = sessionize(ev, key="user_id", ts_col="ts", gap="30 minutes")
    alerts = (
        ev.filter(F.col("value") > 100.0)
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("win_start"))
    )
    minute = lambda c: (  # noqa: E731 — epoch-minute bin
        F.unix_micros(F.col(c).cast("timestamp")) / F.lit(60_000_000)
    ).cast("bigint")
    s_bins = sessions.select(
        "user_id",
        "session_start",
        "session_end",
        F.explode(
            F.sequence(minute("session_start"), minute("session_end"))
        ).alias("bin"),
    )
    a_bins = alerts.select("win_start", minute("win_start").alias("bin"))
    pairs = (
        s_bins.join(a_bins, "bin")
        .filter(  # exact-overlap verify (general pattern; no-op here)
            (
                F.col("session_start")
                < F.col("win_start") + F.expr("INTERVAL 1 MINUTE")
            )
            & (F.col("session_end") >= F.col("win_start"))
        )
        .select("user_id", "session_start", "win_start")
        .distinct()
    )
    return pairs.groupBy("user_id", "session_start").agg(
        F.count(F.lit(1)).alias("n_alert_windows")
    )


def _session_alert_sql() -> str:
    from de4ml_spark.queries.textq import SESSIONIZE_SQL

    return f"""
WITH sessions AS ({SESSIONIZE_SQL}),
alerts AS (
  SELECT date_trunc('minute', ts) AS win_start
  FROM events WHERE value > 100.0
  GROUP BY 1
)
SELECT s.user_id, s.session_start, COUNT(*) AS n_alert_windows
FROM sessions s
JOIN alerts a
  ON s.session_start < a.win_start + INTERVAL 1 MINUTE
 AND s.session_end >= a.win_start
GROUP BY 1, 2
"""


REGISTRY["session_alert_overlap"] = {
    "fn": session_alert_overlap,
    "sql": _session_alert_sql(),
}


# --------------------------------------------------------------------------
# Join-key skew diagnostic: the frequency profile of a join key — the
# planning input that decides between plain shuffle join, AQE skew split,
# and salting (operators/skew.py). One groupBy on the key (map-side
# combine), then a 1-row aggregate over the frequency distribution.
# top1_share uses the engine-exact integer rounding; the p99 is an exact
# interpolated percentile over integer frequencies (same IEEE ops both
# engines).
# --------------------------------------------------------------------------

def key_skew_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql
    from de4ml_spark.profile.battery import grouped_exact_quantiles

    orders = load_table(spark, sf_dir, "orders")
    freqs = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("freq"))
    base = freqs.agg(
        F.sum("freq").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("freq").alias("max_freq"),
        F.expr(
            exact_round_div_sql("MAX(freq)", "SUM(freq)", "DIV")
        ).alias("top1_share"),
    )
    # r17 (guide §5): percentile_cont buffered one freq per KEY in a
    # single aggregation buffer (key-count state — unbounded at corpus
    # scale); the histogram path aggregates on the freq VALUE domain
    # (small integers) with identical interpolation arithmetic. Left
    # join keeps the empty-input row shape (NULL p99, like the old
    # aggregate).
    q = grouped_exact_quantiles(
        freqs.withColumn("__g", F.lit(1)), ["__g"], "freq", [0.99]
    ).select(F.round(F.col("q99"), 6).alias("p99_freq"))
    return base.join(F.broadcast(q), F.lit(True), "left").select(
        "n_rows", "n_keys", "max_freq", "top1_share", "p99_freq"
    )


KEY_SKEW_SQL = f"""
WITH freqs AS (
  SELECT o_custkey, COUNT(*) AS freq FROM orders GROUP BY 1
)
SELECT CAST(SUM(freq) AS BIGINT) AS n_rows,
       COUNT(*) AS n_keys,
       MAX(freq) AS max_freq,
       {{top1}} AS top1_share,
       ROUND(percentile_cont(0.99) WITHIN GROUP (ORDER BY freq), 6)
         AS p99_freq
FROM freqs
""".format(
    top1=__import__(
        "de4ml_spark.operators.portable_hash", fromlist=["exact_round_div_sql"]
    ).exact_round_div_sql("MAX(freq)", "SUM(freq)", "//")
)


REGISTRY["key_skew_orders"] = {"fn": key_skew_orders, "sql": KEY_SKEW_SQL}


# --------------------------------------------------------------------------
# Trailing-window rate-limit screen: per user, the trailing-60 s event
# count at every event (row-grain event-time RANGE frame), rolled up to
# per-user peak rate and violation count — the abuse/ingest-burst monitor
# (the bucketed alert_windows entry counts per fixed minute; this one is
# the sliding-window rate a real limiter enforces).
# Scale: one shuffle on user_id; the RANGE frame is evaluated within each
# user's sorted run (Spark's sliding-frame window keeps only the frame in
# memory); the rollup reuses the same partitioning (no second exchange).
# --------------------------------------------------------------------------

RATE_WINDOW_US = 60_000_000  # 60 s in microseconds
RATE_LIMIT = 10  # violations are instants with > 10 events in the window


def rate_limit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-RATE_WINDOW_US, 0)
    )
    rated = ev.select(
        "user_id", F.count(F.lit(1)).over(w).alias("rate")
    )
    return rated.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("rate").alias("max_rate_60s"),
        F.count(F.when(F.col("rate") > RATE_LIMIT, 1)).alias("n_violations"),
    )


RATE_LIMIT_SQL = f"""
WITH r AS (
  SELECT user_id,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                        RANGE BETWEEN {RATE_WINDOW_US} PRECEDING
                              AND CURRENT ROW) AS rate
  FROM events
)
SELECT user_id, COUNT(*) AS n_events,
       MAX(rate) AS max_rate_60s,
       COUNT(*) FILTER (WHERE rate > {RATE_LIMIT}) AS n_violations
FROM r GROUP BY user_id
"""


REGISTRY["rate_limit_events"] = {"fn": rate_limit_events, "sql": RATE_LIMIT_SQL}


# --------------------------------------------------------------------------
# Referential-integrity audit: the FK health check every warehouse runs
# before trusting a join — orphan child rows (fact keys missing from the
# dimension), childless parents, and exact coverage ratios, as ONE row.
# Scale: two left-anti joins on the key (the dimension side of each is
# whichever is smaller — Catalyst/AQE picks broadcast when it fits) + a
# key-grain distinct; counts union into a single-row report.
# --------------------------------------------------------------------------


def fk_integrity_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    orphan_rows = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti"
    )
    childless = orders.join(
        li, orders["o_orderkey"] == li["l_orderkey"], "left_anti"
    )
    tot = li.agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.count_distinct("l_orderkey").alias("n_fact_keys"),
    )
    return (
        tot.crossJoin(
            F.broadcast(orders.agg(F.count(F.lit(1)).alias("n_orders")))
        )
        .crossJoin(
            F.broadcast(
                orphan_rows.agg(F.count(F.lit(1)).alias("n_orphan_rows"))
            )
        )
        .crossJoin(
            F.broadcast(
                childless.agg(F.count(F.lit(1)).alias("n_childless_orders"))
            )
        )
        .select(
            "n_lineitems",
            "n_fact_keys",
            "n_orders",
            "n_orphan_rows",
            "n_childless_orders",
            # NULLIF: empty fact/parent tables report NULL coverage
            # rather than DIVIDE_BY_ZERO (fresh landing zone case)
            F.expr(
                exact_round_div_sql(
                    "n_lineitems - n_orphan_rows",
                    "NULLIF(n_lineitems, 0)",
                    "DIV",
                )
            ).alias("row_coverage_r"),
            F.expr(
                exact_round_div_sql(
                    "n_orders - n_childless_orders",
                    "NULLIF(n_orders, 0)",
                    "DIV",
                )
            ).alias("parent_use_r"),
        )
    )


def _fk_integrity_sql() -> str:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    return f"""
WITH t AS (
  SELECT COUNT(*) AS n_lineitems,
         COUNT(DISTINCT l_orderkey) AS n_fact_keys
  FROM lineitem
),
o AS (SELECT COUNT(*) AS n_orders FROM orders),
orphan AS (
  SELECT COUNT(*) AS n_orphan_rows FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders x WHERE x.o_orderkey = l.l_orderkey)
),
childless AS (
  SELECT COUNT(*) AS n_childless_orders FROM orders x
  WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = x.o_orderkey)
)
SELECT n_lineitems, n_fact_keys, n_orders, n_orphan_rows, n_childless_orders,
       {exact_round_div_sql('n_lineitems - n_orphan_rows',
                            'NULLIF(n_lineitems, 0)', '//')}
         AS row_coverage_r,
       {exact_round_div_sql('n_orders - n_childless_orders',
                            'NULLIF(n_orders, 0)', '//')}
         AS parent_use_r
FROM t CROSS JOIN o CROSS JOIN orphan CROSS JOIN childless
"""


REGISTRY["fk_integrity_orders_lineitem"] = {
    "fn": fk_integrity_orders_lineitem,
    "sql": _fk_integrity_sql(),
}


# --------------------------------------------------------------------------
# Weighted median: the quantity-weighted median extended price per return
# flag — the weighted-quantile shape (neither engine has a builtin; both
# replay the histogram + cumulative-weight formulation). Lower weighted
# median: smallest value whose cumulative weight reaches half the total.
# Weights move to exact integer centiquantities so the halving compare is
# integer in both engines.
# Scale: histogram groupBy on (flag, value) shrinks the data to distinct
# values before the per-flag cumulative window — the same no-raw-row-
# buffering discipline as the exact profile battery.
# --------------------------------------------------------------------------


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wgt = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint")
    hist = (
        li.select("l_returnflag", F.col("l_extendedprice").alias("v"), wgt.alias("w"))
        .groupBy("l_returnflag", "v")
        .agg(F.sum("w").alias("w"))
    )
    win = (
        Window.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "v",
        F.sum("w").over(win).alias("cum"),
        F.sum("w").over(tot).alias("total"),
    )
    return (
        cum.filter(F.col("cum") * 2 >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(
            F.min("v").alias("wmedian"),
            F.first("total").alias("total_centiqty"),
        )
    )


WEIGHTED_MEDIAN_SQL = """
WITH hist AS (
  SELECT l_returnflag, l_extendedprice AS v,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * 100) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, v,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY l_returnflag) AS total
  FROM hist
)
SELECT l_returnflag, MIN(v) AS wmedian,
       CAST(MIN(total) AS BIGINT) AS total_centiqty
FROM cum WHERE cum * 2 >= total
GROUP BY l_returnflag
"""


REGISTRY["weighted_median_price"] = {
    "fn": weighted_median_price,
    "sql": WEIGHTED_MEDIAN_SQL,
}


# --------------------------------------------------------------------------
# Chi-square independence statistic for A/B readouts: variant =
# user_id % 2 (the deterministic hash-bucket assignment every
# experimentation system uses), outcome = event_type. The statistic
# sum (O - E)^2 / E is computed per cell as the exact rational
# (O*N - r*c)^2 / (N*r*c), half-up-rounded to integer micro-units in
# 128-bit arithmetic (DECIMAL(38,0) / HUGEINT — (O*N - r*c)^2 reaches
# ~1e24 at sf0.1 and the micro-scaling adds 1e6), SUMMED as integers
# (order-independent), and converted to a double by one final division —
# so both engines emit the identical chi2_r. At extreme corpus sizes
# (N >~ 1e9 per table) the cross-products approach the 128-bit ceiling;
# the standard practice there is computing the statistic on per-shard
# subsamples — documented, not silently wrong (the cast would error).
# Scale: one groupBy for cells (map-side combined to
# |variants| x |types| rows); totals via windows over that tiny frame.
# --------------------------------------------------------------------------


def chi2_ab_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # event_type IS NOT NULL: a NULL outcome level never matches the
    # grid's equi-join, zeroing its column total and the (O*N-rc)^2/Nrc
    # denominator (round-14 nullkeys parity sweep) — out-of-domain for
    # the contingency table, like the user_id filter beside it
    observed = (
        ev.filter(F.col("user_id").isNotNull())
        .filter(F.col("event_type").isNotNull())
        .groupBy(
            (F.col("user_id") % 2).alias("variant"),
            F.col("event_type").alias("outcome"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    # FULL grid: an observed-zero cell still contributes (0-E)^2/E = rc/N
    # to the statistic; dropping it (groupBy only materializes non-empty
    # cells) understates chi2
    grid = (
        observed.select("variant")
        .distinct()
        .crossJoin(observed.select("outcome").distinct())
    )
    cells = grid.join(observed, ["variant", "outcome"], "left").select(
        "variant", "outcome", F.coalesce("o", F.lit(0)).alias("o")
    )
    wr = Window.partitionBy("variant")
    wc = Window.partitionBy("outcome")
    wn = Window.partitionBy()
    with_tot = cells.select(
        "variant",
        "outcome",
        "o",
        F.sum("o").over(wr).alias("r"),
        F.sum("o").over(wc).alias("c"),
        F.sum("o").over(wn).alias("n"),
    )
    # per-cell term in micro-units: round(1e6 * (ON - rc)^2 / (N r c))
    term = (
        "CAST((num * 2000000 + den) DIV (2 * den) AS BIGINT)"
    )
    terms = with_tot.selectExpr(
        "variant",
        "outcome",
        "CAST(CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c"
        " AS DECIMAL(38,0)) AS dev",
        "CAST(CAST(n AS DECIMAL(38,0)) * r * c AS DECIMAL(38,0)) AS den",
    ).selectExpr(
        "variant", "outcome",
        "CAST(dev * dev AS DECIMAL(38,0)) AS num", "den",
    ).selectExpr("variant", "outcome", f"{term} AS t_micro")
    return (
        terms.groupBy()
        .agg(
            F.expr("CAST(SUM(t_micro) AS BIGINT)").alias("chi2_micro"),
            F.count(F.lit(1)).alias("n_cells"),
            F.count_distinct("variant").alias("_nv"),
            F.count_distinct("outcome").alias("_no"),
        )
        .selectExpr(
            "n_cells",
            # independence-test dof: (|variants|-1) * (|outcomes|-1)
            "CAST((_nv - 1) * (_no - 1) AS BIGINT) AS dof",
            "chi2_micro",
            "CAST(chi2_micro AS DOUBLE) / 1000000.0 AS chi2_r",
        )
    )


CHI2_SQL = """
WITH observed AS (
  SELECT user_id % 2 AS variant, event_type AS outcome,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
cells AS (
  SELECT g.variant, g.outcome, COALESCE(ob.o, 0) AS o
  FROM (SELECT DISTINCT v.variant, oc.outcome
        FROM (SELECT DISTINCT variant FROM observed) v
        CROSS JOIN (SELECT DISTINCT outcome FROM observed) oc) g
  LEFT JOIN observed ob
    ON g.variant = ob.variant AND g.outcome = ob.outcome
),
tot AS (
  SELECT variant, outcome, o,
         CAST(SUM(o) OVER (PARTITION BY variant) AS BIGINT) AS r,
         CAST(SUM(o) OVER (PARTITION BY outcome) AS BIGINT) AS c,
         CAST(SUM(o) OVER () AS BIGINT) AS n
  FROM cells
),
terms AS (
  SELECT variant, outcome, o,
         CAST(CAST(CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c
                   AS HUGEINT)
              * CAST(CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c
                     AS HUGEINT) AS HUGEINT) AS num,
         CAST(CAST(n AS HUGEINT) * r * c AS HUGEINT) AS den
  FROM tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST((COUNT(DISTINCT variant) - 1) * (COUNT(DISTINCT outcome) - 1)
            AS BIGINT) AS dof,
       CAST(SUM(CAST((num * 2000000 + den) // (2 * den) AS BIGINT))
            AS BIGINT) AS chi2_micro,
       CAST(CAST(SUM(CAST((num * 2000000 + den) // (2 * den) AS BIGINT))
                 AS BIGINT) AS DOUBLE) / 1000000.0 AS chi2_r
FROM terms
"""

REGISTRY["chi2_ab_events"] = {"fn": chi2_ab_events, "sql": CHI2_SQL}


# --------------------------------------------------------------------------
# Model-calibration curve: bucket a deterministic pseudo-score (portable
# hash of event_id -> [0, 1000) millis — the stand-in for a model score
# column, keeping the plumbing fully cross-engine-verifiable) into 10
# bins and compare mean predicted probability vs observed positive rate
# (outcome = click). Means are exact half-up rationals via
# exact_round_div_sql. Scale: one scan, one tiny groupBy on the bin id —
# the reliability-diagram readout every model-quality dashboard runs
# over full-corpus predictions.
# --------------------------------------------------------------------------


def calibration_bins_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql,
        phash_spark_sql,
    )

    ev = load_table(spark, sf_dir, "events")
    scored = ev.selectExpr(
        f"{phash_spark_sql('CAST(event_id AS STRING)', 40)} % 1000"
        " AS score_milli",
        "CAST(event_type = 'click' AS INT) AS pos",
    )
    binned = scored.groupBy(
        F.expr("score_milli DIV 100").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(pos) AS BIGINT)").alias("n_pos"),
        F.expr("CAST(SUM(score_milli) AS BIGINT)").alias("s_milli"),
    )
    return binned.selectExpr(
        "bin",
        "n",
        "n_pos",
        f"{exact_round_div_sql('s_milli', 'n * 1000', 'DIV')}"
        " AS mean_pred_r",
        f"{exact_round_div_sql('n_pos', 'n', 'DIV')} AS frac_pos_r",
    )


def _calibration_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql,
        phash_duck_sql,
    )

    return f"""
WITH scored AS (
  SELECT {phash_duck_sql("CAST(event_id AS VARCHAR)", 40)} % 1000
           AS score_milli,
         CAST(event_type = 'click' AS INT) AS pos
  FROM events
),
binned AS (
  SELECT score_milli // 100 AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(score_milli) AS BIGINT) AS s_milli
  FROM scored GROUP BY 1
)
SELECT bin, n, n_pos,
       {exact_round_div_sql("s_milli", "n * 1000", "//")} AS mean_pred_r,
       {exact_round_div_sql("n_pos", "n", "//")} AS frac_pos_r
FROM binned
"""


REGISTRY["calibration_bins_events"] = {
    "fn": calibration_bins_events,
    "sql": _calibration_sql(),
}


# --------------------------------------------------------------------------
# Audience-overlap matrix: for every pair of event types, how many users
# do both (the segment-overlap readout every growth/ads dashboard runs).
# The pair join is keyed on user_id with each user contributing at most
# |types| rows — fan-out bounded by C(|types|, 2) per user, never an
# all-pairs over users. Jaccard and lift are exact integer rationals;
# lift > 1 means the segments co-occur more than independence predicts
# (cnt_both * n_users vs cnt_a * cnt_b, integer cross-multiply inside
# the rational).
# --------------------------------------------------------------------------


def audience_overlap_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    ev = load_table(spark, sf_dir, "events")
    seg = (
        ev.filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
    )
    # in-plan scalar (1-row broadcast), not an eager .count() — see
    # assoc_rules_parts
    tot = seg.agg(F.count_distinct("user_id").alias("_n_users"))
    sizes = seg.groupBy(F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    a, b = seg.alias("a"), seg.alias("b")
    both = (
        a.join(b, F.col("a.user_id") == F.col("b.user_id"))
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(F.col("t").alias("type_a"), F.col("cnt").alias("n_a"))
    sb = sizes.select(F.col("t").alias("type_b"), F.col("cnt").alias("n_b"))
    return (
        both.join(sa, "type_a")
        .join(sb, "type_b")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            f"{exact_round_div_sql('n_both', 'n_a + n_b - n_both', 'DIV')}"
            " AS jaccard_r",
            f"{exact_round_div_sql('n_both * _n_users', 'n_a * n_b', 'DIV')}"
            " AS lift_r",
        )
    )


def _audience_sql() -> str:
    from de4ml_spark.operators.portable_hash import exact_round_div_sql

    return f"""
WITH seg AS (
  SELECT DISTINCT event_type, user_id FROM events
  WHERE user_id IS NOT NULL
),
tot AS (SELECT COUNT(DISTINCT user_id) AS n FROM seg),
sizes AS (SELECT event_type AS t, COUNT(*) AS cnt FROM seg GROUP BY 1),
ov AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM seg a JOIN seg b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT b.type_a, b.type_b,
       CAST(sa.cnt AS BIGINT) AS n_a,
       CAST(sb.cnt AS BIGINT) AS n_b,
       b.n_both,
       {exact_round_div_sql("b.n_both", "sa.cnt + sb.cnt - b.n_both", "//")}
         AS jaccard_r,
       {exact_round_div_sql("b.n_both * t.n", "sa.cnt * sb.cnt", "//")}
         AS lift_r
FROM ov b
JOIN sizes sa ON b.type_a = sa.t
JOIN sizes sb ON b.type_b = sb.t
CROSS JOIN tot t
"""


REGISTRY["audience_overlap_events"] = {
    "fn": audience_overlap_events,
    "sql": _audience_sql(),
}


# --------------------------------------------------------------------------
# Expected / maximum calibration error over the same hash-scored bins
# as calibration_bins_events — the single-number calibration summary
# (ECE) and its worst-bin companion (MCE). ECE collapses to ONE exact
# integer sum: Σ n_k·|p̄_k − ō_k| / N = Σ |s_milli − 1000·n_pos|
# / (1000·N) (the per-bin n cancels), so no quantization at all; MCE
# takes the max of per-bin half-up micro gaps (deterministic integer
# compare). Scale: one groupBy to the 10-bin table.
# --------------------------------------------------------------------------


def ece_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from de4ml_spark.operators.portable_hash import (
        phash_spark_sql,
        wide_to_double_sql as _w2d,
    )

    ev = load_table(spark, sf_dir, "events")
    scored = ev.selectExpr(
        f"{phash_spark_sql('CAST(event_id AS STRING)', 40)} % 1000"
        " AS score_milli",
        "CAST(event_type = 'click' AS INT) AS pos",
    )
    binned = scored.groupBy(
        F.expr("score_milli DIV 100").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("CAST(SUM(pos) AS BIGINT)").alias("n_pos"),
        F.expr("CAST(SUM(score_milli) AS BIGINT)").alias("s_milli"),
    )
    gaps = binned.selectExpr(
        "n",
        "CAST(abs(s_milli - 1000 * n_pos) AS DECIMAL(38,0)) AS gap",
        "CAST((2 * abs(s_milli - 1000 * n_pos) * 1000 + n)"
        " DIV (2000 * n) AS BIGINT) AS gap_milli_u",
    )
    agg = gaps.agg(
        F.sum("n").cast("bigint").alias("n_tot"),
        F.sum("gap").alias("gap_sum"),
        F.max("gap_milli_u").cast("bigint").alias("mce_milli_u"),
    )
    return agg.selectExpr(
        "n_tot",
        f"{_w2d('gap_sum', 'DIV')}"
        " / (1000.0 * CAST(n_tot AS DOUBLE)) AS ece",
        "CAST(mce_milli_u AS DOUBLE) / 1000.0 AS mce",
    )


def _ece_sql() -> str:
    from de4ml_spark.operators.portable_hash import (
        phash_duck_sql,
        wide_to_double_sql as _w2d,
    )

    return f"""
WITH scored AS (
  SELECT {phash_duck_sql("CAST(event_id AS VARCHAR)", 40)} % 1000
           AS score_milli,
         CAST(event_type = 'click' AS INT) AS pos
  FROM events
),
binned AS (
  SELECT score_milli // 100 AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(score_milli) AS BIGINT) AS s_milli
  FROM scored GROUP BY 1
),
gaps AS (
  SELECT n,
         CAST(abs(s_milli - 1000 * n_pos) AS HUGEINT) AS gap,
         CAST((2 * abs(s_milli - 1000 * n_pos) * 1000 + n)
              // (2000 * n) AS BIGINT) AS gap_milli_u
  FROM binned
),
agg AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
         SUM(gap) AS gap_sum,
         CAST(MAX(gap_milli_u) AS BIGINT) AS mce_milli_u
  FROM gaps
)
SELECT n_tot,
       {_w2d("gap_sum", "//")}
         / (1000.0 * CAST(n_tot AS DOUBLE)) AS ece,
       CAST(mce_milli_u AS DOUBLE) / 1000.0 AS mce
FROM agg
"""


REGISTRY["ece_events"] = {
    "fn": ece_events,
    "sql": _ece_sql(),
}
