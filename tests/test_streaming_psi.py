"""Streaming PSI monitor: the running PSI after all batches must match
the batch twin's smoothed computation over the same events (identical
integer smoothing; ln terms within the portable-ln micro-quantization
band), and injected drift must move PSI up."""

from __future__ import annotations

import json
import time

import pytest

from de4ml_spark.streaming.psi import exact_psi, streaming_psi_monitor

SCHEMA = "event_id BIGINT, ts TIMESTAMP, value DOUBLE"

# reference: a frozen "training-time" histogram over $50 buckets
REFERENCE = {0: 40, 1: 25, 2: 15, 3: 10, 4: 10}


def _rows(bucket_counts: dict[int, int], start: int):
    base = 1704067200.0
    out, i = [], start
    for b, n in bucket_counts.items():
        for _ in range(n):
            t = time.strftime(
                "%Y-%m-%d %H:%M:%S", time.gmtime(base + i)
            )
            out.append(
                {
                    "event_id": i,
                    "ts": t,
                    # center of the $50 bucket
                    "value": b * 50.0 + 25.0,
                }
            )
            i += 1
    return out


def _write(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    (path / f"b_{time.time_ns()}.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )


@pytest.mark.slow
def test_streaming_psi_matches_batch_math(spark, tmp_path):
    src = tmp_path / "ev"
    batch1 = {0: 20, 1: 12, 2: 8, 3: 5, 4: 5}  # roughly the reference
    batch2 = {7: 40}  # drift: a new high-value bucket appears
    _write(src, _rows(batch1, 0))
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = streaming_psi_monitor(stream, REFERENCE)
    q = (
        out.writeStream.format("memory")
        .queryName("psi_monitor")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(src, _rows(batch2, 1000))
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM psi_monitor").collect()
    finally:
        q.stop()
    by_n = {r["n_events"]: r for r in rows}
    n1 = sum(batch1.values())
    n2 = n1 + sum(batch2.values())
    assert by_n[n1]["psi"] == pytest.approx(
        exact_psi(REFERENCE, batch1), abs=1e-12
    )
    merged = dict(batch1)
    for b, n in batch2.items():
        merged[b] = merged.get(b, 0) + n
    assert by_n[n2]["psi"] == pytest.approx(
        exact_psi(REFERENCE, merged), abs=1e-12
    )
    assert by_n[n2]["psi"] > by_n[n1]["psi"]
    assert by_n[n2]["n_buckets"] == len(set(merged) | set(REFERENCE))


def test_exact_psi_agrees_with_batch_entry(spark):
    """The shared smoothed-PSI math, fed the batch entry's own
    reference/current split at sf0.001, reproduces the catalog value
    (ln quantization can differ by ≤1 micro-unit per bucket)."""
    import duckdb

    from de4ml_spark.queries.mldataq5 import psi_value_drift

    con = duckdb.connect()
    halves = con.sql(
        """SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  // 5000 AS b,
                  ts < TIMESTAMP '2024-01-16 00:00:00' AS is_ref,
                  COUNT(*) AS n
           FROM '/root/testdata/sf0.001/events.parquet'
           WHERE value IS NOT NULL GROUP BY 1, 2"""
    ).fetchall()
    ref = {b: n for b, is_ref, n in halves if is_ref}
    cur = {b: n for b, is_ref, n in halves if not is_ref}
    got = psi_value_drift(spark, "/root/testdata/sf0.001").collect()[0]
    # per-bucket micro-quantized ln can differ by 1 unit between
    # math.log and the portable ln; bound the drift accordingly
    k = len(set(ref) | set(cur))
    tol = k * max(
        abs(
            (2 * ref.get(b, 0) + 1) * (2 * sum(cur.values()) + k)
            - (2 * cur.get(b, 0) + 1) * (2 * sum(ref.values()) + k)
        )
        for b in set(ref) | set(cur)
    ) / (
        (2 * sum(ref.values()) + k)
        * (2 * sum(cur.values()) + k)
        * 1_000_000.0
    )
    assert got["psi"] == pytest.approx(
        exact_psi(ref, cur), abs=max(tol, 1e-9)
    )
