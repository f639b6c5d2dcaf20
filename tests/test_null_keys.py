"""Null-key semantics for the recursive per-key scans.

applyInPandas delivers nullable int64 keys as float64 with NaN, and
``NaN == NaN`` is False — a naive equality scan either hangs forever
(quota's old inner while never advanced past a null) or silently treats
EVERY null row as its own key (old throttle/capped_sessions), diverging
from the oracle's window semantics where ``PARTITION BY k`` puts all
NULLs in ONE partition. All three operators now share
``partition_boundary_mask`` (operators/throttle.py), which encodes the
SQL rule; these tests pin it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SCHEMA = (
    "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _mixed_null_events(spark):
    # two real users + three null-key rows spread over one day; the null
    # rows are close enough in time to interact if (and only if) they
    # share a partition
    rows = [
        (1, "2024-01-05 00:00:00", 7, "click", 40.0, "{}"),
        (2, "2024-01-05 01:00:00", 7, "click", 40.0, "{}"),
        (3, "2024-01-05 00:30:00", 9, "click", 40.0, "{}"),
        (4, "2024-01-05 02:00:00", None, "click", 60.0, "{}"),
        (5, "2024-01-05 02:30:00", None, "click", 60.0, "{}"),
        (6, "2024-01-05 03:00:00", None, "click", 60.0, "{}"),
    ]
    return spark.createDataFrame(rows, SCHEMA).withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_throttle_null_keys_one_partition(spark):
    from de4ml_spark.operators.throttle import throttle

    ev = _mixed_null_events(spark)
    kept = throttle(
        ev, ["user_id"], min_gap_us=3_600_000_000  # 1h gap
    ).collect()
    by_key = {}
    for r in kept:
        by_key.setdefault(r["user_id"], []).append(r["event_id"])
    # nulls form ONE key: events at 02:00/02:30/03:00 with a 1h gap keep
    # {02:00, 03:00}; per-row-as-own-key would have kept all three
    assert sorted(by_key[None]) == [4, 6]
    assert sorted(by_key[7]) == [1, 2]
    assert by_key[9] == [3]


def test_capped_sessions_null_keys_one_partition(spark):
    from de4ml_spark.operators.sessions import capped_sessions

    ev = _mixed_null_events(spark)
    out = capped_sessions(ev, gap_us=3_600_000_000).collect()
    null_sessions = [r for r in out if r["user_id"] is None]
    # the three null rows are 30 min apart -> ONE session of 3 events
    assert len(null_sessions) == 1
    assert null_sessions[0]["n_events"] == 3
    # real keys unaffected: user 7's two events 1h apart merge (gap is
    # strict >), user 9 has a singleton
    assert {
        (r["user_id"], r["n_events"]) for r in out if r["user_id"] is not None
    } == {(7, 2), (9, 1)}


def test_quota_null_keys_terminate_and_group(spark):
    """The old scan HUNG FOREVER on a null key (NaN == NaN is False so
    the inner while never advanced). Completing at all is the headline
    assertion; grouping is the semantic one."""
    from de4ml_spark.operators.quota import quota_admission

    ev = _mixed_null_events(spark)
    out = quota_admission(ev, quota_cents=13_000).collect()
    nulls = [r for r in out if r["user_id"] is None]
    # one key-day row for all three null events: 60.00 + 60.00 accepted
    # (12000c <= 13000c), third rejected — only possible if they share
    # a budget
    assert len(nulls) == 1
    assert (nulls[0]["n_accepted"], nulls[0]["n_rejected"]) == (2, 1)
    assert nulls[0]["consumed_c"] == 12_000
    real = {r["user_id"]: r for r in out if r["user_id"] is not None}
    assert real[7]["n_accepted"] == 2 and real[9]["n_accepted"] == 1


def test_quota_fast_path_matches_walk(spark):
    """Groups under quota take the vectorized no-walk path; groups that
    cross it take the Python walk. Same answer either way — pin a case
    with both kinds."""
    from de4ml_spark.operators.quota import quota_admission

    rows = [
        # user 1: 3 x 30.00 = 9000c <= 10000c -> fast, all accepted
        (1, "2024-01-05 00:00:00", 1, "a", 30.0, "{}"),
        (2, "2024-01-05 01:00:00", 1, "a", 30.0, "{}"),
        (3, "2024-01-05 02:00:00", 1, "a", 30.0, "{}"),
        # user 2: 60+50 rejected at 50 (11000 > 10000), then 40 accepted
        # (10000 == quota) -> walk path, rejected events don't consume
        (4, "2024-01-05 00:00:00", 2, "a", 60.0, "{}"),
        (5, "2024-01-05 01:00:00", 2, "a", 50.0, "{}"),
        (6, "2024-01-05 02:00:00", 2, "a", 40.0, "{}"),
    ]
    ev = spark.createDataFrame(rows, SCHEMA).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {r["user_id"]: r for r in quota_admission(ev).collect()}
    assert (out[1]["n_accepted"], out[1]["consumed_c"]) == (3, 9_000)
    assert (out[2]["n_accepted"], out[2]["n_rejected"]) == (2, 1)
    assert out[2]["consumed_c"] == 10_000


def test_streaming_capped_sessions_null_key_group(spark, tmp_path):
    """The NULL-key group must flow through the streaming twin (nullable
    Int64 key emission), matching the batch null-partition semantics."""
    import json
    import time

    from de4ml_spark.operators.sessions import streaming_capped_sessions

    src = tmp_path / "ev"
    src.mkdir()

    def ev(eid, uid, off_s):
        base = 1704067200.0
        ts = time.strftime(
            "%Y-%m-%d %H:%M:%S", time.gmtime(base + off_s)
        )
        return {"event_id": eid, "user_id": uid, "ts": ts}

    # null-key events 5s apart (one session), then a 100s gap closes it
    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [ev(1, None, 0.0), ev(2, None, 5.0), ev(3, 7, 1.0)]
        )
    )
    stream = spark.readStream.schema(
        "event_id BIGINT, user_id BIGINT, ts TIMESTAMP"
    ).json(str(src))
    q = (
        streaming_capped_sessions(stream, gap_us=10_000_000)
        .writeStream.format("memory")
        .queryName("null_key_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        (src / "b2.json").write_text(
            json.dumps(ev(4, None, 100.0)) + "\n" + json.dumps(ev(5, 7, 100.0))
        )
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM null_key_sessions"
        ).collect()
    finally:
        q.stop()
    closed = {(r["user_id"], r["n_events"]) for r in rows}
    # the null-key pair closed as ONE session of 2; user 7's singleton
    # also closed
    assert (None, 2) in closed and (7, 1) in closed
