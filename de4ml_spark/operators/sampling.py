"""Deterministic sampling, dataset mixing, and leakage-safe splits.

Training-data pipelines need sampling that is (a) reproducible run-to-run,
(b) independent of partitioning/parallelism, and (c) auditable by another
engine. Spark's ``df.sample`` satisfies none of these (per-partition RNG).
Here membership is a pure function of the row's key: take the first 8 hex
chars of md5(key || salt) and compare against a hex threshold — lexicographic
order on lowercase hex equals numeric order, and md5 is identical in every
engine, so DuckDB oracles reproduce the exact row set.

Resolution: 16^8 ≈ 4.3e9 buckets — fraction granularity ~2.3e-10.
Skew-free: md5 output is uniform regardless of key distribution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(fraction: float) -> str:
    n = round(fraction * (0xFFFFFFFF + 1))
    if n <= 0:
        return "00000000"
    if n > 0xFFFFFFFF:
        # fraction == 1.0: must exceed every 8-char hex string. A 9-char
        # "100000000" would compare lexicographically SMALLER than most
        # hashes ("1" < "a"); "g" is > every hex digit in ASCII.
        return "g"
    return format(n, "08x")


def _key_hex(key_col: str, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8
    )


def key_hex_sql(key_col: str, salt: str) -> str:
    """DuckDB-equivalent expression (for oracle SQL twins)."""
    return f"substr(md5(CAST({key_col} AS VARCHAR) || '{salt}'), 1, 8)"


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep rows whose key hashes below the fraction threshold."""
    return df.filter(_key_hex(key_col, salt) < F.lit(_hex_threshold(fraction)))


def mix_sources(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Dataset mixture: per-source deterministic sampling rates in ONE pass
    (a CASE over the source column — no per-source scans/unions). The
    standard pretraining-mixture op: upweight/downweight corpora by rate."""
    thr = None
    for src, frac in rates.items():
        branch = (F.col(source_col) == src, F.lit(_hex_threshold(frac)))
        thr = (
            F.when(*branch)
            if thr is None
            else thr.when(*branch)
        )
    thr = thr.otherwise(F.lit(_hex_threshold(0.0)))
    return df.filter(_key_hex(key_col, salt) < thr)


def group_split(
    df: DataFrame,
    group_col: str,
    test_fraction: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe train/test split: the split is a function of the GROUP
    key (e.g. user_id), so every row of a group lands in the same split —
    no cross-split leakage of a user's behavior. Adds a ``split`` column."""
    is_test = _key_hex(group_col, salt) < F.lit(_hex_threshold(test_fraction))
    return df.withColumn(
        "split", F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    )


def temperature_rates(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-adjusted mixture rates (multilingual/pretraining
    standard): resample sources toward share q_s ∝ p_s^alpha, flattening
    the natural distribution p_s. Returns one row per source with the
    deterministic sampling ``rate`` to hand to ``mix_sources`` (largest
    upweighted source pinned at rate 1.0).

    alpha is fixed at 0.5 so p^alpha is ``sqrt`` — IEEE-exact and
    bit-identical across engines (generic ``pow`` may differ in the last
    ulp between libm implementations). The cross-source Σ sqrt(p) is summed
    as DECIMAL over 12-decimal roundings, making the reduction
    order-independent; every other step is counts, divisions, and
    comparisons — exact on both engines, so the DuckDB oracle reproduces
    rates bit-for-bit.

    Scale: one groupBy(source) count (map-side combined), then window math
    over the per-source summary (rows = |sources|, trivially small)."""
    if alpha != 0.5:
        raise ValueError("alpha fixed at 0.5 (sqrt) for engine portability")
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    p = F.col("n_docs") / F.sum("n_docs").over(w_all)
    wgt = F.round(F.sqrt(p), 12).cast("decimal(24,12)")
    q = wgt.cast("double") / F.sum(wgt).over(w_all).cast("double")
    rate_raw = q / p
    rate = rate_raw / F.max(rate_raw).over(w_all)
    return counts.select(
        F.col(source_col),
        F.col("n_docs"),
        F.round(p, 6).alias("p"),
        F.round(q, 6).alias("q"),
        F.round(rate, 6).alias("rate"),
        F.round(rate * F.col("n_docs"), 2).alias("expected_docs"),
    )
