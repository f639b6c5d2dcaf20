"""Streaming CUSUM twin: after all batches the alarm set must equal
the batch entry's (sketchq.cusum_alarm_value) over the same events —
including under OUT-OF-ORDER delivery, since the state re-scans the
merged day map each batch."""

from __future__ import annotations

import json
import time

import duckdb
import pytest

from de4ml_spark.streaming.cusum import (
    CUSUM_H,
    CUSUM_K,
    exact_cusum_scan,
    streaming_cusum_alarms,
)

SF = "/root/testdata/sf0.001"
SCHEMA = "user_id BIGINT, ts TIMESTAMP, value DOUBLE"


def _event_rows():
    con = duckdb.connect()
    return con.sql(
        f"""SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND user_id IS NOT NULL
            ORDER BY ts"""
    ).fetchall()


def _batch_alarms():
    rows = _event_rows()
    per_user: dict[int, dict[str, int]] = {}
    for uid, ts, c in rows:
        per_user.setdefault(uid, {}).setdefault(
            str(ts.date()), 0
        )
        per_user[uid][str(ts.date())] += int(c)
    alarms = set()
    for uid, daymap in per_user.items():
        for day, s in exact_cusum_scan(daymap, CUSUM_K).items():
            if s > CUSUM_H:
                alarms.add((uid, day, daymap[day], s))
    return alarms


def test_exact_scan_matches_batch_entry(spark):
    """The shared scan reproduces the catalog entry's alarm rows."""
    from de4ml_spark.queries.sketchq import cusum_alarm_value

    got = {
        (r["user_id"], str(r["day"]), r["dc"], r["cusum_c"])
        for r in cusum_alarm_value(spark, SF).collect()
    }
    assert got == _batch_alarms()
    assert got  # non-degenerate at sf0.001


def _write(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    (path / f"b_{time.time_ns()}.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )


@pytest.mark.slow
def test_streaming_cusum_matches_batch(spark, tmp_path):
    rows = [
        {
            "user_id": uid,
            "ts": ts.strftime("%Y-%m-%d %H:%M:%S"),
            "value": c / 100.0,
        }
        for uid, ts, c in _event_rows()
    ]
    # out-of-order split: second half of days arrives FIRST
    mid = rows[len(rows) // 2]["ts"]
    late = [r for r in rows if r["ts"] >= mid]
    early = [r for r in rows if r["ts"] < mid]
    src = tmp_path / "ev"
    _write(src, late)
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = streaming_cusum_alarms(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("cusum_monitor")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(src, early)
        q.processAllAvailable()
        got = spark.sql(
            "SELECT user_id, day, MAX_BY(dc, ver) AS dc,"
            " MAX_BY(cusum_c, ver) AS cusum_c FROM ("
            "  SELECT *, monotonically_increasing_id() AS ver"
            "  FROM cusum_monitor) GROUP BY 1, 2"
        ).collect()
    finally:
        q.stop()
    # keep only rows whose FINAL emission still alarms: rebuild the
    # final per-user scan and intersect
    expected = _batch_alarms()
    final = {
        (r["user_id"], r["day"], r["dc"], r["cusum_c"]) for r in got
    }
    # every expected alarm must appear with its final-state values
    assert expected <= final
    # and nothing in the final emission contradicts the batch scan
    exp_by_key = {(u, d): (dc, s) for u, d, dc, s in expected}
    for u, d, dc, s in final:
        if (u, d) in exp_by_key:
            assert exp_by_key[(u, d)] == (dc, s)
