"""Late-data semantics, pinned explicitly: a watermarked tumbling-window
aggregate in append mode must (a) only finalize windows once the
watermark passes them, and (b) DROP an event arriving after the
watermark has moved past its window — the closed window's count must
not change, and no duplicate window row may appear."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"


def _write(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    (path / f"b_{time.time_ns()}.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )


def _row(eid, hhmmss):
    return {
        "event_id": eid,
        "ts": f"2024-01-01 {hhmmss}",
        "user_id": 1,
        "event_type": "view",
    }


@pytest.mark.slow
def test_late_event_dropped_after_watermark(spark, tmp_path):
    src = tmp_path / "ev"
    _write(src, [_row(1, "00:01:00"), _row(2, "00:02:00")])
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    agg = (
        stream.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_windows")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # advance event time far past 00:10 + 5min watermark delay:
        # the [00:00, 00:10) window finalizes with n=2
        _write(src, [_row(3, "01:00:00")])
        q.processAllAvailable()
        closed = {
            str(r["w_start"]): r["n"]
            for r in spark.sql("SELECT * FROM late_windows").collect()
        }
        assert closed.get("2024-01-01 00:00:00") == 2, closed

        # a LATE event for the closed window (event time 00:03, far
        # behind the 00:55 watermark) must be dropped — not re-emit or
        # alter the window
        _write(src, [_row(4, "00:03:00")])
        q.processAllAvailable()
        # one more on-time event so the final batch isn't empty
        _write(src, [_row(5, "02:00:00")])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql(
        "SELECT * FROM late_windows ORDER BY w_start"
    ).collect()
    per_window = {}
    for r in rows:
        k = str(r["w_start"])
        assert k not in per_window, f"window {k} emitted twice"
        per_window[k] = r["n"]
    assert per_window["2024-01-01 00:00:00"] == 2  # late row NOT counted
