"""Streaming M4 twin: after draining the same events across batch
boundaries (including a bucket updated in BOTH batches), the latest
per-bucket rows must equal the batch builder's output exactly."""

from __future__ import annotations

import json
import time

import pytest

from de4ml_spark.streaming.sketches import streaming_m4

SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"
WIDTH_US = 6 * 3600 * 1_000_000


def _write(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    (path / f"b_{time.time_ns()}.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )


def _row(eid, hhmm, v):
    return {
        "event_id": eid,
        "ts": f"2024-01-01 {hhmm}:00",
        "user_id": 1,
        "value": v,
    }


@pytest.mark.slow
def test_streaming_m4_equals_batch(spark, tmp_path):
    from de4ml_spark.queries.tsq2 import m4_downsample

    src = tmp_path / "ev"
    # bucket 0 = [00:00, 06:00); bucket 1 = [06:00, 12:00)
    batch1 = [
        _row(1, "00:10", 5.0),
        _row(2, "00:10", 9.0),  # same ts: event_id tiebreak
        _row(3, "05:00", -2.0),
        _row(4, "07:00", 3.0),
    ]
    batch2 = [
        _row(5, "00:05", 7.0),   # new FIRST for bucket 0 (earlier ts)
        _row(6, "05:59", 11.0),  # new LAST + max for bucket 0
        _row(7, "11:00", 1.0),   # bucket 1 update
    ]
    _write(src, batch1)
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = streaming_m4(stream, WIDTH_US)
    q = (
        out.writeStream.format("memory")
        .queryName("m4_stream")
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

    rows = spark.sql("SELECT * FROM m4_stream ORDER BY n").collect()
    latest = {r["bucket"]: r for r in rows}

    batch_df = spark.createDataFrame(
        [
            (r["event_id"], r["ts"], r["value"])
            for r in batch1 + batch2
        ],
        "event_id BIGINT, ts STRING, value DOUBLE",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "value"
    )
    expect = {r["bucket"]: r for r in m4_downsample(batch_df).collect()}

    assert set(latest) == set(expect)
    for b, e in expect.items():
        g = latest[b]
        for c in (
            "n", "t_first", "v_first", "t_last", "v_last", "v_min", "v_max"
        ):
            assert g[c] == e[c], (b, c, g[c], e[c])
    # the cross-batch bucket really exercised first/last replacement
    assert expect[0]["v_first"] == 7.0 and expect[0]["v_last"] == 11.0
