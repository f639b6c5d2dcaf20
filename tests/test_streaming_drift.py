"""Streaming drift monitor: the running TVD after all batches must equal
the exact batch computation over the same events, and drift must move
toward the injected skew."""

from __future__ import annotations

import json
import time
from fractions import Fraction

import pytest

from de4ml_spark.streaming.drift import streaming_drift_monitor

SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"

BASELINE = {"view": 40, "click": 30, "purchase": 10, "signup": 10, "error": 10}


def _rows(counts: dict[str, int], start: int):
    base = 1704067200.0
    out, i = [], start
    for et, n in counts.items():
        for _ in range(n):
            t = time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(base + i))
            out.append({"event_id": i, "ts": t, "user_id": 1, "event_type": et})
            i += 1
    return out


def _write(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    (path / f"b_{time.time_ns()}.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )


def _exact_tvd(live: dict[str, int]) -> float:
    lt, bt = sum(live.values()), sum(BASELINE.values())
    tvd = Fraction(0)
    for c in set(live) | set(BASELINE):
        tvd += abs(Fraction(live.get(c, 0), lt) - Fraction(BASELINE.get(c, 0), bt))
    return float(tvd / 2)


@pytest.mark.slow
def test_streaming_drift_running_tvd(spark, tmp_path):
    src = tmp_path / "ev"
    batch1 = {"view": 20, "click": 15, "purchase": 5, "signup": 5, "error": 5}
    batch2 = {"error": 50}  # incident: error storm -> drift must jump
    _write(src, _rows(batch1, 0))
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = streaming_drift_monitor(stream, BASELINE)
    q = (
        out.writeStream.format("memory")
        .queryName("drift_monitor")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r["n_events"]: r["tvd"]
            for r in spark.sql("SELECT * FROM drift_monitor").collect()
        }
        _write(src, _rows(batch2, 1000))
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM drift_monitor").collect()
    finally:
        q.stop()
    by_n = {r["n_events"]: r["tvd"] for r in rows}
    n1, n2 = sum(batch1.values()), sum(batch1.values()) + sum(batch2.values())
    assert abs(by_n[n1] - _exact_tvd(batch1)) < 1e-12
    merged = dict(batch1)
    merged["error"] = merged.get("error", 0) + batch2["error"]
    assert abs(by_n[n2] - _exact_tvd(merged)) < 1e-12
    assert by_n[n2] > by_n[n1]  # the error storm increases drift
    assert first[n1] == by_n[n1]


@pytest.mark.slow
def test_streaming_cusum_matches_recurrence(spark, tmp_path):
    """Alarms from the streaming fold (day closed by a later day's
    arrival) must equal the textbook recurrence replayed in Python over
    the completed days."""
    from de4ml_spark.streaming.drift import streaming_cusum

    ev_dir = tmp_path / "ev"
    sch = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"
    K, H = 5_000, 20_000

    def _ev(i, day, uid, value):
        return {
            "event_id": i,
            "ts": f"2024-01-{day:02d} 10:00:{i % 60:02d}",
            "user_id": uid,
            "value": value,
        }

    # user 1 spends 300/day (cents 30000 -> +25000/day after K): alarms
    # from day 1 on once folded; user 2 stays under allowance
    rows1 = [_ev(i, d, 1, 150.0) for d in (1, 2, 3) for i in (2 * d, 2 * d + 1)]
    rows2 = [_ev(100 + d, d, 2, 10.0) for d in (1, 2, 3)]
    _write(ev_dir, rows1[:4] + rows2[:2])

    src = spark.readStream.schema(sch).json(str(ev_dir))
    q = (
        streaming_cusum(src, k_cents=K, h_cents=H)
        .writeStream.format("memory")
        .queryName("cusum_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(ev_dir, rows1[4:] + rows2[2:])
        q.processAllAvailable()
        # day 4 arrivals fold day 3 for both users
        _write(ev_dir, [_ev(900, 4, 1, 1.0), _ev(901, 4, 2, 1.0)])
        q.processAllAvailable()
        got = {
            (r["user_id"], r["day_num"], r["cusum_c"])
            for r in spark.sql("SELECT * FROM cusum_stream").collect()
        }
    finally:
        q.stop()

    # replay: completed days are 1..3 per user
    expected = set()
    for uid, per_day in ((1, 30_000), (2, 1_000)):
        s = 0
        for d in (1, 2, 3):
            s = max(0, s + (per_day - K))
            if s > H:
                day_num = (
                    int(time.mktime((2024, 1, d, 10, 0, 0, 0, 0, 0)))
                    // 86_400
                )
                expected.add((uid, day_num, s))
    # day_num from the operator is epoch-days of the event micros (UTC)
    assert {(u, c) for u, _, c in got} == {(u, c) for u, _, c in expected}
    assert len(got) == len(expected)
