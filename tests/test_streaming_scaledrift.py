"""Streaming Qn robust-scale monitor: the running statistic after every
micro-batch must equal the exact batch Qn over the same prefix
(integer identity — no tolerance), and the shared math must reproduce
the batch catalog entry's row at sf0.001."""

from __future__ import annotations

import json
import time

import pytest

from de4ml_spark.streaming.scaledrift import (
    QN_CONST,
    exact_qn,
    streaming_qn_monitor,
)

SCHEMA = "event_id BIGINT, ts TIMESTAMP, value DOUBLE"

REF_QN_RAW = 500  # frozen training-scale (cents)


def _rows(cents_counts: dict[int, int], start: int):
    base = 1704067200.0
    out, i = [], start
    for v_c, n in cents_counts.items():
        for _ in range(n):
            t = time.strftime(
                "%Y-%m-%d %H:%M:%S", time.gmtime(base + i)
            )
            out.append({"event_id": i, "ts": t, "value": v_c / 100.0})
            i += 1
    return out


def _write(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    (path / f"b_{time.time_ns()}.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )


@pytest.mark.slow
def test_streaming_qn_matches_batch_math(spark, tmp_path):
    src = tmp_path / "ev"
    batch1 = {1000: 10, 2000: 10, 3000: 10}
    # drift: variance blow-up — mass appears far out in both tails
    batch2 = {100: 8, 9000: 8}
    _write(src, _rows(batch1, 0))
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = streaming_qn_monitor(stream, REF_QN_RAW)
    q = (
        out.writeStream.format("memory")
        .queryName("qn_monitor")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(src, _rows(batch2, 1000))
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM qn_monitor").collect()
    finally:
        q.stop()
    merged = dict(batch1)
    for v, c in batch2.items():
        merged[v] = merged.get(v, 0) + c
    by_n = {r["n_live"]: r for r in rows}
    for hist in (batch1, merged):
        n, k, qn = exact_qn(hist)
        r = by_n[n]
        assert r["k_pairs"] == k
        assert r["qn_raw_cents"] == qn
        assert r["qn_scale"] == QN_CONST * (qn / 100.0)
        assert r["ref_qn_raw_cents"] == REF_QN_RAW
        assert r["scale_ratio"] == qn / REF_QN_RAW
    # the tail mass must blow the scale up vs both prefix-1 and ref
    n1, n2 = sum(batch1.values()), sum(merged.values())
    assert by_n[n2]["qn_raw_cents"] > by_n[n1]["qn_raw_cents"]
    assert by_n[n2]["scale_ratio"] > 1.0


def test_exact_qn_agrees_with_batch_entry(spark):
    """The shared Qn math, fed the batch entry's own value histogram at
    sf0.001, reproduces the catalog row exactly."""
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        """SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT),
               COUNT(*)
        FROM '/root/testdata/sf0.001/events.parquet'
        WHERE value IS NOT NULL GROUP BY 1"""
    ).fetchall()
    hist = {int(v): int(c) for v, c in rows}
    n, k, qn = exact_qn(hist)

    from de4ml_spark.queries.statq6 import qn_scale_value

    row = qn_scale_value(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_values"] == n
    assert row["k_pairs"] == k
    assert row["qn_raw_cents"] == qn
    assert row["qn_scale"] == QN_CONST * (qn / 100.0)


def test_exact_qn_degenerate():
    assert exact_qn({}) == (0, 0, -1)
    # n == 1 matches the batch entry's convention: k_pairs == 0, the
    # cum >= k filter matches the d=0 histogram row, qn_raw == 0
    # (ADVICE r12 alignment — previously a -1 sentinel).
    assert exact_qn({500: 1}) == (1, 0, 0)
    # two equal values: one pair at distance 0
    assert exact_qn({500: 2}) == (2, 1, 0)
