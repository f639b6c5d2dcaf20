"""Streaming HLL twin: after draining the same events, per-key register
state and the emitted estimate must EQUAL the batch entry's — including
the portable-ln linear-counting branch — and the Python hash replica
must match the engine's portable hash bit-for-bit.
"""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from de4ml_spark.streaming.sketches import (
    hll_estimate,
    hll_update,
    phash58_py,
    streaming_hll,
)

SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"


def test_phash58_py_matches_engine(spark):
    from de4ml_spark.operators.portable_hash import phash_spark_sql

    vals = [str(v) for v in [0, 1, 42, 7_000_000_000, 123456789]]
    df = spark.createDataFrame([(v,) for v in vals], "s STRING")
    got = {
        r["s"]: r["h"]
        for r in df.selectExpr(
            "s", f"{phash_spark_sql('s', 58)} AS h"
        ).collect()
    }
    for v in vals:
        assert got[v] == phash58_py(v), v


def _write(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    (path / f"b_{time.time_ns()}.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )


def _rows(start_uid, n, event_type, start_id):
    base = 1704067200.0
    out = []
    for i in range(n):
        t = time.strftime(
            "%Y-%m-%d %H:%M:%S", time.gmtime(base + start_id + i)
        )
        out.append(
            {
                "event_id": start_id + i,
                "ts": t,
                "user_id": start_uid + (i % max(n // 2, 1)),
                "event_type": event_type,
            }
        )
    return out


@pytest.mark.slow
def test_streaming_hll_equals_batch(spark, tmp_path):
    from de4ml_spark.queries.sketchq import HLL_M, _hll_rho_sql
    from de4ml_spark.operators.portable_hash import phash_spark_sql

    src = tmp_path / "ev"
    batch1 = _rows(0, 40, "view", 0) + _rows(100, 10, "click", 1000)
    batch2 = _rows(20, 30, "view", 2000) + _rows(500, 250, "click", 3000)
    _write(src, batch1)
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = streaming_hll(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(src, batch2)
        q.processAllAvailable()
    finally:
        q.stop()

    # latest emitted row per key
    rows = spark.sql(
        "SELECT * FROM hll_stream ORDER BY n_rows"
    ).collect()
    latest = {r["event_type"]: r for r in rows}

    # batch recompute over ALL drained events with the ENGINE's hash
    all_rows = batch1 + batch2
    df = spark.createDataFrame(
        [(r["user_id"], r["event_type"]) for r in all_rows],
        "user_id BIGINT, event_type STRING",
    )
    regs_rows = (
        df.distinct()
        .selectExpr(
            "event_type",
            f"{phash_spark_sql('CAST(user_id AS STRING)', 58)} AS h",
        )
        .selectExpr(
            "event_type",
            f"h % {HLL_M} AS bucket",
            f"{_hll_rho_sql(f'(h DIV {HLL_M})', 'spark')} AS rho",
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m"))
        .collect()
    )
    batch_regs: dict = {}
    for r in regs_rows:
        batch_regs.setdefault(r["event_type"], [0] * HLL_M)[
            r["bucket"]
        ] = r["m"]

    for et, regs in batch_regs.items():
        s_scaled, v_zero, est = hll_estimate(regs)
        got = latest[et]
        assert got["s_scaled"] == s_scaled, et
        assert got["v_zero"] == v_zero, et
        assert got["hll_est"] == est, (et, got["hll_est"], est)

    # the small-group key must exercise the linear-counting branch
    assert latest["view"]["v_zero"] > 0


def test_hll_update_replica_consistency():
    """Driver-side replica sanity: distinct members drive the estimate
    near truth; duplicates never change registers."""
    regs = [0] * 64
    for i in range(500):
        hll_update(regs, str(i))
    snapshot = list(regs)
    for i in range(500):
        hll_update(regs, str(i))  # duplicates are no-ops
    assert regs == snapshot
    _, _, est = hll_estimate(regs)
    assert abs(est - 500) / 500 < 0.4
