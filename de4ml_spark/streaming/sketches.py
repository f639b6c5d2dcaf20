"""Streaming HyperLogLog: per-key distinct-count registers maintained
across micro-batches via ``applyInPandasWithState``.

Batch twin: ``queries/sketchq.py: hll_distinct_users`` — SAME portable
58-bit hash, SAME m=64 register derivation, SAME estimate arithmetic
(scaled-integer harmonic sum, inlined alpha literal, portable-ln linear
counting), so after draining identical events the streaming registers
EQUAL the batch registers and the emitted estimate EQUALS the batch
``hll_est`` bit-for-bit (pinned in tests/test_streaming_hll.py; the
Python replica relies on CPython floats being IEEE doubles with
correctly rounded + - * / — the same contract portable_ln_const uses).

State: 64 small ints per key — O(1), never a user set. That is the whole
point of the sketch: the streaming distinct counter over 100 TB of
replay holds ~512 bytes per key, and registers from parallel shards (or
a batch backfill) merge into the stream state by element-wise max.

Scale: one groupBy exchange on the key; batches update registers in
numpy. The NULL-key group flows through like any other (key[0] None).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from de4ml_spark.queries.sketchq import HLL_M, _HLL_ALPHA, _HLL_NUM
from de4ml_spark.queries.tsq2 import M4_ORIGIN_US

HLL_OUTPUT_SCHEMA = (
    "event_type STRING, n_rows BIGINT, s_scaled BIGINT, v_zero BIGINT,"
    " hll_est DOUBLE"
)
HLL_STATE_SCHEMA = "regs ARRAY<INT>, n_rows BIGINT"

_MASK58 = (1 << 58) - 1


def phash58_py(s: str) -> int:
    """Python replica of ``phash_spark_sql(expr, 58)``: low 58 bits of
    the little-endian integer of md5(s)'s LAST 8 digest bytes (matches
    operators/portable_hash.py:40-54 byte-by-byte)."""
    d = hashlib.md5(s.encode()).digest()
    return int.from_bytes(d[8:16], "little") & _MASK58


def hll_update(regs: list[int], member: str) -> None:
    """Fold one set member into the register array, in place."""
    h = phash58_py(member)
    bucket = h % HLL_M
    w = h // HLL_M
    rho = 53 if w == 0 else 53 - w.bit_length()
    if rho > regs[bucket]:
        regs[bucket] = rho


def hll_estimate(regs: list[int]) -> tuple[int, int, float]:
    """(s_scaled, v_zero, estimate) — the IDENTICAL op sequence the
    batch entry's SQL emits, replayed on Python doubles."""
    from de4ml_spark.operators.portable_hash import portable_ln_const

    s_scaled = sum((1 << (40 - m)) if m <= 40 else 0 for m in regs)
    v_zero = sum(1 for m in regs if m == 0)
    raw = _HLL_ALPHA * (float(_HLL_NUM) / float(s_scaled))
    if v_zero > 0 and raw <= 2.5 * HLL_M:
        return s_scaled, v_zero, float(HLL_M) * portable_ln_const(
            HLL_M, v_zero
        )
    return s_scaled, v_zero, raw


def streaming_hll(events: DataFrame) -> DataFrame:
    """Per-event-type running distinct-user estimate, one row per key
    per batch (update mode)."""

    # NULL members contribute nothing in the batch twin (NULL hash ->
    # NULL bucket, dropped by the register grid; COUNT(DISTINCT) skips
    # NULLs) — filter here so stream == batch holds exactly.
    src = events.filter(F.col("user_id").isNotNull()).select(
        "event_type", F.col("user_id").cast("bigint").alias("user_id")
    )

    def fn(key, pdfs, state: GroupState) -> Iterator:
        import pandas as pd

        if state.exists:
            regs, n_rows = state.get
            regs = list(regs)
        else:
            regs, n_rows = [0] * HLL_M, 0
        for pdf in pdfs:
            for uid in pdf["user_id"]:
                n_rows += 1
                hll_update(regs, str(int(uid)))
        state.update((regs, int(n_rows)))
        s_scaled, v_zero, est = hll_estimate(regs)
        yield pd.DataFrame(
            {
                "event_type": pd.array([key[0]], dtype=object),
                "n_rows": pd.array([int(n_rows)], dtype="int64"),
                "s_scaled": pd.array([int(s_scaled)], dtype="int64"),
                "v_zero": pd.array([int(v_zero)], dtype="int64"),
                "hll_est": pd.array([float(est)], dtype="float64"),
            }
        )

    return src.groupBy("event_type").applyInPandasWithState(
        fn,
        HLL_OUTPUT_SCHEMA,
        HLL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming M4 downsampler: per-bucket (first, last, min, max) state
# maintained across micro-batches — the live dashboard's reduction,
# O(1) state per bucket (7 scalars), ties resolved by the same unique
# (ts, event_id) order as the batch twin (queries/tsq2.py:
# m4_downsample; equality pinned in tests/test_streaming_m4.py).
# --------------------------------------------------------------------------

M4_OUTPUT_SCHEMA = (
    "bucket BIGINT, n BIGINT, t_first TIMESTAMP_NTZ, v_first DOUBLE,"
    " t_last TIMESTAMP_NTZ, v_last DOUBLE, v_min DOUBLE, v_max DOUBLE"
)
M4_STATE_SCHEMA = (
    "n BIGINT, tf BIGINT, idf BIGINT, vf DOUBLE,"
    " tl BIGINT, idl BIGINT, vl DOUBLE, vmin DOUBLE, vmax DOUBLE"
)

def streaming_m4(events: DataFrame, width_us: int) -> DataFrame:
    """Per-bucket running M4 tuple, one row per touched bucket per
    batch (update mode). ``events`` needs (event_id, ts, value)."""

    src = events.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__t"),
        F.col("value").cast("double").alias("value"),
    ).withColumn(
        "__bucket",
        F.expr(f"CAST((__t - {M4_ORIGIN_US}) DIV {width_us} AS BIGINT)"),
    )

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            n, tf, idf, vf, tl, idl, vl, vmin, vmax = state.get
        else:
            n = 0
            tf = idf = vf = tl = idl = vl = vmin = vmax = None
        for pdf in pdfs:
            for eid, t, v in zip(
                pdf["event_id"], pdf["__t"], pdf["value"]
            ):
                eid, t, v = int(eid), int(t), float(v)
                n += 1
                if tf is None or (t, eid) < (tf, idf):
                    tf, idf, vf = t, eid, v
                if tl is None or (t, eid) > (tl, idl):
                    tl, idl, vl = t, eid, v
                vmin = v if vmin is None else min(vmin, v)
                vmax = v if vmax is None else max(vmax, v)
        state.update((n, tf, idf, vf, tl, idl, vl, vmin, vmax))
        yield pd.DataFrame(
            {
                "bucket": pd.array([key[0]], dtype="int64"),
                "n": pd.array([n], dtype="int64"),
                "t_first": pd.to_datetime([tf], unit="us"),
                "v_first": pd.array([vf], dtype="float64"),
                "t_last": pd.to_datetime([tl], unit="us"),
                "v_last": pd.array([vl], dtype="float64"),
                "v_min": pd.array([vmin], dtype="float64"),
                "v_max": pd.array([vmax], dtype="float64"),
            }
        )

    return src.groupBy("__bucket").applyInPandasWithState(
        fn,
        M4_OUTPUT_SCHEMA,
        M4_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
