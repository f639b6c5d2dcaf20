"""Streaming J4 (last-reward-per-decision) via applyInPandasWithState:
single-row emission per decision after its window closes, latest in-window
reward wins, unmatched decisions emit reward=0."""

from __future__ import annotations

import json
import time

import pytest

from de4ml_spark.streaming.stateful import streaming_last_reward

D_SCHEMA = "key STRING, context STRING, action STRING, probability DOUBLE, d_ts TIMESTAMP"
R_SCHEMA = "key STRING, reward DOUBLE, r_ts TIMESTAMP"


def _ts(offset_s: float) -> str:
    base = 1704067200.0
    t = base + offset_s
    return time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(t)) + f"{t % 1:.3f}"[1:]


def _write(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    (path / f"b_{time.time_ns()}.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )


@pytest.mark.slow
def test_streaming_last_reward(spark, tmp_path):
    d_dir, r_dir = tmp_path / "d", tmp_path / "r"
    _write(
        d_dir,
        [
            {"key": "k1", "context": "{}", "action": "a", "probability": 0.5, "d_ts": _ts(0)},
            {"key": "k2", "context": "{}", "action": "b", "probability": 0.6, "d_ts": _ts(1)},
        ],
    )
    _write(
        r_dir,
        [
            {"key": "k1", "reward": 1.0, "r_ts": _ts(3)},
            {"key": "k1", "reward": 7.0, "r_ts": _ts(6)},   # later -> wins
            {"key": "k1", "reward": 9.0, "r_ts": _ts(15)},  # outside window
        ],
    )

    d = spark.readStream.schema(D_SCHEMA).json(str(d_dir))
    r = spark.readStream.schema(R_SCHEMA).json(str(r_dir))
    out = streaming_last_reward(d, r, window_ms=10_000)

    q = (
        out.writeStream.format("memory")
        .queryName("last_rewards")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # push the watermark past every window
        _write(d_dir, [{"key": "zz", "context": "{}", "action": "z", "probability": 0.0, "d_ts": _ts(600)}])
        q.processAllAvailable()
        _write(r_dir, [{"key": "zz_r", "reward": 0.0, "r_ts": _ts(1200)}])
        q.processAllAvailable()
        rows = {
            r_["key"]: r_
            for r_ in spark.sql(
                "SELECT * FROM last_rewards WHERE key NOT LIKE 'zz%'"
            ).collect()
        }
    finally:
        q.stop()

    assert set(rows) == {"k1", "k2"}  # exactly ONE row per decision
    assert rows["k1"]["reward"] == 7.0  # latest in-window, not the +15s one
    assert rows["k1"]["reward_delta_ms"] == pytest.approx(6000.0)
    assert rows["k2"]["reward"] == 0.0  # unmatched default fill
    assert rows["k2"]["reward_delta_ms"] is None


@pytest.mark.slow
def test_streaming_throttle_equals_batch(spark, tmp_path):
    """Cross-batch throttle state: batches fed in event-time order must
    reproduce the batch operator's kept set exactly — including a burst
    that STRADDLES the batch boundary (the second batch's first event is
    within the gap of a kept event from the first batch)."""
    from de4ml_spark.operators.throttle import streaming_throttle, throttle

    GAP = 10_000_000  # 10 s
    base = 1704067200.0

    def ev(eid, uid, et, off_s):
        return {
            "event_id": eid,
            "user_id": uid,
            "event_type": et,
            "ts": _ts(off_s),
        }

    batch1 = [
        ev(1, 1, "c", 0.0),    # kept (first)
        ev(2, 1, "c", 3.0),    # dropped
        ev(3, 1, "c", 11.0),   # kept (>= 10s after t=0)
        ev(4, 2, "c", 5.0),    # kept (other key)
    ]
    batch2 = [
        ev(5, 1, "c", 15.0),   # dropped: within 10s of kept t=11
        ev(6, 1, "c", 21.0),   # kept (>= 10s after 11)
        ev(7, 2, "c", 14.9),   # dropped: within 10s of kept t=5
        ev(8, 2, "c", 15.0),   # kept: exactly 10s after kept t=5
    ]
    src = tmp_path / "ev"
    _write(src, batch1)

    SCHEMA = "event_id BIGINT, user_id BIGINT, event_type STRING, ts TIMESTAMP"
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        streaming_throttle(stream, min_gap_us=GAP)
        .writeStream.format("memory")
        .queryName("throttled")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(src, batch2)
        q.processAllAvailable()
        got = {
            r["event_id"] for r in spark.sql("SELECT * FROM throttled").collect()
        }
    finally:
        q.stop()

    from pyspark.sql import functions as F

    batch_df = spark.createDataFrame(
        [tuple(e.values()) for e in batch1 + batch2],
        "event_id BIGINT, user_id BIGINT, event_type STRING, ts STRING",
    ).withColumn("ts", F.to_timestamp("ts"))
    want = {
        r["event_id"]
        for r in throttle(
            batch_df, ["user_id", "event_type"], min_gap_us=GAP
        ).collect()
    }
    assert got == want == {1, 3, 4, 6, 8}


@pytest.mark.slow
def test_streaming_quota_equals_batch(spark, tmp_path):
    """Cross-batch quota state: a day's budget partially consumed in
    batch 1 must carry into batch 2 (admits continue against the
    remaining budget), and a new day resets it. Per-event decisions must
    aggregate to exactly the batch operator's day rows."""
    from pyspark.sql import functions as F

    from de4ml_spark.operators.quota import (
        quota_admission,
        streaming_quota_admission,
    )

    Q = 1000  # cents

    def ev(eid, uid, day_off, sec, cents):
        return {
            "event_id": eid,
            "user_id": uid,
            "ts": _ts(day_off * 86400 + sec),
            "value": cents / 100.0,
        }

    batch1 = [
        ev(1, 1, 0, 10, 600),   # accept (600)
        ev(2, 1, 0, 20, 500),   # reject (would be 1100)
    ]
    batch2 = [
        ev(3, 1, 0, 30, 400),   # accept (1000 exactly — boundary)
        ev(4, 1, 0, 40, 1),     # reject (budget full)
        ev(5, 1, 1, 10, 900),   # accept (new day resets)
    ]
    src = tmp_path / "ev"
    _write(src, batch1)
    SCHEMA = "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, value DOUBLE"
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        streaming_quota_admission(stream, quota_cents=Q)
        .writeStream.format("memory")
        .queryName("quota_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(src, batch2)
        q.processAllAvailable()
        got = {
            r["event_id"]: r["accepted"]
            for r in spark.sql("SELECT * FROM quota_stream").collect()
        }
    finally:
        q.stop()
    assert got == {1: True, 2: False, 3: True, 4: False, 5: True}

    batch_df = spark.createDataFrame(
        [tuple(e.values()) for e in batch1 + batch2],
        "event_id BIGINT, user_id BIGINT, ts STRING, value DOUBLE",
    ).withColumn("ts", F.to_timestamp("ts"))
    day_rows = {
        (r["user_id"], str(r["day"]), r["n_accepted"], r["n_rejected"], r["consumed_c"])
        for r in quota_admission(batch_df, quota_cents=Q).collect()
    }
    # per-event stream decisions roll up to the batch day rows
    assert {(u, a, rj, c) for u, _, a, rj, c in day_rows} == {
        (1, 2, 2, 1000),
        (1, 1, 0, 900),
    }


@pytest.mark.slow
def test_streaming_capped_sessions_equals_batch(spark, tmp_path):
    """Cross-batch session state: a session OPEN at the batch boundary
    must continue (not split), and gap/cap breaks across batches must
    match the batch operator's CLOSED sessions exactly."""
    from pyspark.sql import functions as F

    from de4ml_spark.operators.sessions import (
        capped_sessions,
        streaming_capped_sessions,
    )

    GAP = 10_000_000       # 10 s inactivity
    CAP = 25_000_000       # 25 s max duration

    def ev(eid, uid, off_s):
        return {"event_id": eid, "user_id": uid, "ts": _ts(off_s)}

    batch1 = [
        ev(1, 1, 0.0),
        ev(2, 1, 5.0),     # same session (gap 5 < 10)
        ev(3, 2, 0.0),
    ]
    batch2 = [
        ev(4, 1, 9.0),     # continues session OPEN across the boundary
        ev(5, 1, 30.0),    # gap 21 > 10 -> closes session {1,2,4}
        ev(6, 1, 38.0),    # same session as 5
        ev(7, 1, 58.0),    # cap: 58-30=28 > 25 -> closes {5,6}
        ev(8, 2, 40.0),    # gap -> closes {3}
    ]
    src = tmp_path / "ev"
    _write(src, batch1)

    SCHEMA = "event_id BIGINT, user_id BIGINT, ts TIMESTAMP"
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        streaming_capped_sessions(stream, gap_us=GAP, max_len_us=CAP)
        .writeStream.format("memory")
        .queryName("capped_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cs"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(src, batch2)
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
            for r in spark.sql("SELECT * FROM capped_stream").collect()
        }
    finally:
        q.stop()

    batch_df = spark.createDataFrame(
        [tuple(e.values()) for e in batch1 + batch2],
        "event_id BIGINT, user_id BIGINT, ts STRING",
    ).withColumn("ts", F.to_timestamp("ts"))
    all_sessions = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in capped_sessions(
            batch_df, gap_us=GAP, max_len_us=CAP
        ).collect()
    }
    # the stream emits CLOSED sessions only; the batch set additionally
    # contains each key's final (still-open) session
    open_sessions = all_sessions - got
    assert got <= all_sessions
    assert len(open_sessions) == 2  # one open tail per user
    assert {u for u, *_ in open_sessions} == {1, 2}
    # the closed sessions match exactly
    assert got == {
        s for s in all_sessions
        if s not in open_sessions
    } and len(got) == 3
