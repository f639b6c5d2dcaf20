"""SparkSession factory and testdata loaders.

Scale notes (100 TB design):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic broadcast decisions replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE coalesces.
  On a real cluster set it to ~2-3x total cores and let AQE shrink.
- Timestamps: session timezone pinned to UTC so event-time semantics do not
  depend on cluster locale. Parquet NANOS timestamps (the ``events`` table)
  are read as raw int64 ns (``nanosAsLong``) and normalized to microsecond
  TIMESTAMP_NTZ by ``load_table`` — identical truncation to DuckDB's
  TIMESTAMP_NS -> TIMESTAMP cast, so oracles agree.
"""

from __future__ import annotations

import itertools
import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Ingest normalization for the one free-form float measure column:
# ``events.value`` maps NaN / +-Inf -> NULL at load. IEEE specials
# round-trip through parquet, so at 100 TB some shard WILL carry an
# upstream 0.0/0.0 or overflow; without the guard every downstream
# cents cast aborts (DuckDB DECIMAL conversion error, Spark ANSI
# CAST_OVERFLOW on BIGINT) and NaN-vs-NULL silently diverges between
# engines. NULL is the established degenerate convention (round 13),
# and the S11 validation tier already rejects non-finite rows at
# ingest — this guard is the scan-side belt for data that skipped it.
# Oracle view layers mirror it with this DuckDB snippet so both
# engines see the same normalized table (same pattern as the nanos-ts
# truncation below). The real testdata is verified non-finite-free at
# every SF, so this is behavior-preserving for the driver gate.
EVENTS_VALUE_GUARD_DUCKDB = (
    "CASE WHEN isfinite(value) THEN value END"
)
EVENTS_ORACLE_COLS = (
    "event_id, ts, user_id, event_type, "
    f"{EVENTS_VALUE_GUARD_DUCKDB} AS value, props"
)

# ts expression for shards that store events.ts as raw BIGINT nanos
# (the degenerate-parity builders): truncate to micro timestamps
# exactly like load_table's nanos-normalization (floor-div 1000).
EVENTS_TS_FROM_NANOS = "make_timestamp(ts // 1000)"


# Whole-vector twin of the events guard, as a row filter: a NULL
# vector or any non-finite element drops the row (missing, never
# silently repaired).
EMBEDDINGS_ORACLE_WHERE = (
    "embedding IS NOT NULL AND len(list_filter(embedding,"
    " x -> isnan(x) OR isinf(x))) = 0"
)


def duckdb_view_sql(
    table: str, parquet_path: str, *, events_ts: str = "ts"
) -> str:
    """The canonical DuckDB view body for one testdata table — every
    oracle layer (verify_oracle, degenerate_parity, bench_one,
    duckdb_baseline, recompute tests) builds its views from this one
    definition so the events.value / embeddings finite-guards above
    cannot drift. ``events_ts`` overrides the ts expression for shards
    that store events.ts as raw BIGINT nanos (pass
    :data:`EVENTS_TS_FROM_NANOS`); every other column, including the
    value finite-guard, stays the single definition below."""
    if table == "events":
        cols = (
            f"event_id, {events_ts} AS ts, user_id, event_type, "
            f"{EVENTS_VALUE_GUARD_DUCKDB} AS value, props"
        )
        return f"SELECT {cols} FROM '{parquet_path}'"
    if table == "embeddings":
        return (
            f"SELECT * FROM '{parquet_path}'"
            f" WHERE {EMBEDDINGS_ORACLE_WHERE}"
        )
    return f"SELECT * FROM '{parquet_path}'"


def get_spark(app_name: str = "de4ml_spark", cpus: int | None = None) -> SparkSession:
    """Build a local session with scale-ready defaults.

    On a real cluster the master/deploy settings come from spark-submit; every
    config here is cluster-safe (AQE, broadcast threshold, Arrow).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Initial shuffle partitions: low for local/small-SF latency (fewer task
    # launches); AQE coalesces/splits at runtime either way. On a real
    # cluster set SPARK_GRAFT_SHUFFLE ≈ 2-3x total cores (see SCALE.md).
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8"))
    # AQE default: ON for any real deployment (runtime coalescing, skew
    # splitting, dynamic broadcast are essential at 100 TB). For single-JVM
    # local[N] micro-benchmarks at tiny SF, AQE's per-stage re-planning adds
    # fixed latency with nothing to re-plan (partitions are already KB-sized),
    # measured ~25% of total wall clock — so local runs may set
    # SPARK_GRAFT_AQE=false. The driver correctness path (__spark_entry__)
    # always re-enables AQE; this knob only affects latency measurements.
    aqe = os.environ.get("SPARK_GRAFT_AQE", "true").lower()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # FAIR lets concurrently submitted jobs share executor slots instead
        # of queueing whole jobs FIFO — the right mode for multi-query
        # serving (bench.py's workload pass sets this; default stays FIFO).
        .config(
            "spark.scheduler.mode",
            os.environ.get("SPARK_GRAFT_SCHEDULER", "FIFO"),
        )
    )
    if "spark.master" not in os.environ.get("SPARK_CONF", ""):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()


_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}

# Session identity tokens: id(spark) can be reused after a stopped session
# is garbage-collected, which would hand a new session stale DataFrames
# bound to the dead one. A WeakKeyDictionary maps each live session to a
# unique monotonic token (int values — no ref cycle); a GC'd session's
# mapping vanishes and a new session always gets a fresh token.
_SESSION_TOKENS: "weakref.WeakKeyDictionary[SparkSession, int]" = (
    weakref.WeakKeyDictionary()
)
_TOKEN_COUNTER = itertools.count()


def _session_token(spark: SparkSession) -> int:
    tok = _SESSION_TOKENS.get(spark)
    if tok is None:
        tok = next(_TOKEN_COUNTER)
        _SESSION_TOKENS[spark] = tok
        # Prune cache entries from dead sessions while we're here.
        live = set(_SESSION_TOKENS.values())
        for k in [k for k in _TABLE_CACHE if k[0] not in live]:
            del _TABLE_CACHE[k]
    return tok


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing types for engine-portable semantics.

    ``events.ts`` arrives as int64 nanoseconds (legacy nanosAsLong); we floor-
    divide to micros — the same truncation DuckDB applies casting
    TIMESTAMP_NS -> TIMESTAMP — and expose TIMESTAMP_NTZ.

    The analyzed DataFrame is memoized per (session, sf_dir, table):
    DataFrames are immutable plan handles, and re-creating one repeats file
    listing + parquet schema read (~50-100 ms of driver latency per call) —
    pure overhead when the catalog runs many queries over the same tables.
    """
    key = (_session_token(spark), sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    if name == "events":
        # NaN/+-Inf -> NULL (see EVENTS_VALUE_GUARD_DUCKDB above).
        # isnan(NULL) is false and NULL != inf is NULL, so NULL rows
        # fall through the unmatched-WHEN to NULL — unchanged.
        df = df.withColumn(
            "value",
            F.when(
                ~F.isnan("value")
                & (F.abs(F.col("value")) != F.lit(float("inf"))),
                F.col("value"),
            ),
        )
    if name == "embeddings":
        # Whole-vector finite-guard, as a ROW FILTER: a NULL vector or
        # ANY non-finite element drops the row (one NaN coordinate
        # poisons every dot product and would rank the vector
        # arbitrarily; a partially-corrupt embedding must read as
        # MISSING, never be silently repaired). A filter — not a
        # NULL-out — because every consumer of this table needs the
        # vector; keeping a NULL-vector row would force the same
        # isNotNull guard into all 17 consumers. The scan-side twin of
        # S11 validation rejection; JVM-side higher-order function, no
        # Python. DuckDB mirror in duckdb_view_sql below.
        df = df.filter(
            F.col("embedding").isNotNull()
            & ~F.exists(
                "embedding",
                lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
            )
        )
    _TABLE_CACHE[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def spread(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition to the session's default parallelism when the input has
    fewer partitions. CPU-heavy per-row work (hashing, shingling, n-gram
    explode) serializes when a small corpus arrives as ONE parquet split;
    at real scale scans split naturally and this is a no-op. Never reduces
    parallelism."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, key_col)
    return df
