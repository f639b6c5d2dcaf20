"""Streaming tests for the delayed-emission join (SURVEY §5.2.4): file-source
micro-batches -> watermarked stream-stream left outer join -> memory sink.
Asserts the J1 contract: matched rows, unmatched-default-0 emission after the
watermark passes d_ts + W, multi-reward multiplicity, out-of-window exclusion.
"""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from de4ml_spark.streaming import delayed_emission_join

D_SCHEMA = "key STRING, context STRING, action STRING, probability DOUBLE, d_ts TIMESTAMP"
R_SCHEMA = "key STRING, reward DOUBLE, r_ts TIMESTAMP"

T0 = "2024-01-01 00:00:00"


def _ts(offset_s: float) -> str:
    base = 1704067200.0  # 2024-01-01 00:00:00 UTC
    t = base + offset_s
    frac = f"{t % 1:.3f}"[1:]
    return time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(t)) + frac


def _write(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    f = path / f"batch_{time.time_ns()}.json"
    f.write_text("\n".join(json.dumps(r) for r in rows))


@pytest.mark.slow
def test_delayed_emission_join_streaming(spark, tmp_path):
    d_dir, r_dir = tmp_path / "d", tmp_path / "r"
    # batch 1: k1 matched (+5s), k2 unmatched, k4 two in-window rewards,
    # k5's reward at +15s is OUTSIDE the 10s window
    _write(
        d_dir,
        [
            {"key": "k1", "context": "{}", "action": "a", "probability": 0.5, "d_ts": _ts(0)},
            {"key": "k2", "context": "{}", "action": "b", "probability": 0.6, "d_ts": _ts(1)},
            {"key": "k4", "context": "{}", "action": "c", "probability": 0.7, "d_ts": _ts(2)},
            {"key": "k5", "context": "{}", "action": "d", "probability": 0.8, "d_ts": _ts(3)},
        ],
    )
    _write(
        r_dir,
        [
            {"key": "k1", "reward": 1.0, "r_ts": _ts(5)},
            {"key": "k4", "reward": 2.0, "r_ts": _ts(4)},
            {"key": "k4", "reward": 3.0, "r_ts": _ts(6)},
            {"key": "k5", "reward": 9.0, "r_ts": _ts(18)},
        ],
    )

    d = spark.readStream.schema(D_SCHEMA).json(str(d_dir))
    r = spark.readStream.schema(R_SCHEMA).json(str(r_dir))
    joined = delayed_emission_join(d, r, window_ms=10_000)

    q = (
        joined.writeStream.format("memory")
        .queryName("joined_decisions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # advance the watermark well past every d_ts + W so unmatched rows emit
        _write(d_dir, [{"key": "zz", "context": "{}", "action": "z", "probability": 0.0, "d_ts": _ts(600)}])
        _write(r_dir, [{"key": "zz_r", "reward": 0.0, "r_ts": _ts(600)}])
        q.processAllAvailable()
        _write(d_dir, [{"key": "zz2", "context": "{}", "action": "z", "probability": 0.0, "d_ts": _ts(1200)}])
        _write(r_dir, [{"key": "zz2_r", "reward": 0.0, "r_ts": _ts(1200)}])
        q.processAllAvailable()

        rows = spark.sql(
            "SELECT * FROM joined_decisions WHERE key NOT LIKE 'zz%'"
        ).collect()
    finally:
        q.stop()

    by_key: dict[str, list] = {}
    for row in rows:
        by_key.setdefault(row["key"], []).append(row)

    assert [r_["reward"] for r_ in by_key["k1"]] == [1.0]
    assert [r_["reward"] for r_ in by_key["k2"]] == [0.0]  # delayed default fill
    assert sorted(r_["reward"] for r_ in by_key["k4"]) == [2.0, 3.0]  # multiplicity
    assert [r_["reward"] for r_ in by_key["k5"]] == [0.0]  # +15s outside window
    # reward_delta_ms parity: r.insert_ms - d.insert_ms (main.py:90)
    assert by_key["k1"][0]["reward_delta_ms"] == pytest.approx(5000.0)
    assert by_key["k2"][0]["reward_delta_ms"] is None


@pytest.mark.slow
def test_streaming_violation_rate_alert(spark, tmp_path):
    """A3 streaming twin: per-minute violation counts over a stream
    (dataops/app/profile.py:61-75 PromQL rate alert)."""
    src = tmp_path / "src"
    _write(
        src,
        [
            {"key": "a", "reward": 500.0, "r_ts": _ts(10)},
            {"key": "b", "reward": 600.0, "r_ts": _ts(20)},
            {"key": "c", "reward": 5.0, "r_ts": _ts(30)},
            {"key": "d", "reward": 700.0, "r_ts": _ts(90)},
        ],
    )
    stream = spark.readStream.schema(R_SCHEMA).json(str(src))
    alerts = (
        stream.filter(F.col("reward") > 450.0)
        .withWatermark("r_ts", "1 minute")
        .groupBy(F.window("r_ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    q = (
        alerts.writeStream.format("memory")
        .queryName("alerts")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["w"]["start"].isoformat(): r["n_violations"]
            for r in spark.sql("SELECT * FROM alerts").collect()
        }
    finally:
        q.stop()
    assert got == {"2024-01-01T00:00:00": 2, "2024-01-01T00:01:00": 1}


@pytest.mark.slow
def test_streaming_session_window(spark, tmp_path):
    """Session windows over an event-time stream (SURVEY §2.7: available
    beyond reference parity): events within a 60s gap coalesce into one
    session; a > gap pause starts a new one. Streaming result must equal
    the batch session_window over the same rows."""
    src = tmp_path / "ev"
    rows = [
        {"user_id": 1, "ts": _ts(0)},
        {"user_id": 1, "ts": _ts(30)},     # same session (gap 30s < 60s)
        {"user_id": 1, "ts": _ts(200)},    # new session (gap 170s)
        {"user_id": 2, "ts": _ts(10)},
    ]
    _write(src, rows)
    schema = "user_id BIGINT, ts TIMESTAMP"
    stream = (
        spark.readStream.schema(schema).json(str(src))
        .withWatermark("ts", "10 seconds")
        .groupBy(F.session_window("ts", "60 seconds").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("start"), "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], str(r["start"]), r["n"])
            for r in spark.sql("select * from sessions").collect()
        }
    finally:
        q.stop()
    batch = (
        spark.read.schema(schema).json(str(src))
        .groupBy(F.session_window("ts", "60 seconds").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("start"), "n")
    )
    want = {(r["user_id"], str(r["start"]), r["n"]) for r in batch.collect()}
    assert got == want
    # structural: user 1 has exactly two sessions, sized 2 and 1
    u1 = sorted(n for (u, _, n) in got if u == 1)
    assert u1 == [1, 2]


@pytest.mark.slow
def test_streaming_observed_violation_metrics(spark, tmp_path):
    """A2 streaming parity: violation counters ride the streaming query as
    observed metrics, surfaced per micro-batch in query progress — the
    Prometheus-scrape analog (dataops/promconfig/prometheus.yml:5) with no
    second pass over the stream."""
    from de4ml_spark.contracts.validation import Rule
    from de4ml_spark.profile.observe import observed_violation_counts

    src = tmp_path / "ev"
    _write(
        src,
        [
            {"key": "a", "probability": 0.5},
            {"key": "b", "probability": 1.5},   # bounds violation
            {"key": "c", "probability": None},  # required violation
        ],
    )
    stream = spark.readStream.schema("key STRING, probability DOUBLE").json(
        str(src)
    )
    rules = [
        Rule(loc="probability", kind="required"),
        Rule(loc="probability", kind="bounds", lo=0.0, hi=1.0),
    ]
    observed, _obs = observed_violation_counts(stream, rules, name="dq")
    q = (
        observed.writeStream.format("memory")
        .queryName("dq_rows")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        metrics = None
        for p in reversed(q.recentProgress):
            if p["observedMetrics"].get("dq"):
                metrics = p["observedMetrics"]["dq"]
                break
        assert metrics is not None, "no observed metrics in progress"
        assert metrics["probability__required"] == 1
        assert metrics["probability__bounds"] == 1
    finally:
        q.stop()


@pytest.mark.slow
def test_streaming_checkpoint_recovery(spark, tmp_path):
    """Exactly-once across restart (SURVEY §2.7: durability the reference
    concedes it lacks — join-service/README.md:66-68): stop a query, add
    data, restart from the SAME checkpoint — already-processed rows are not
    re-emitted, new rows are."""
    src, ckpt = tmp_path / "src", str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write(src, [{"k": "a", "v": 1}, {"k": "b", "v": 2}])
    schema = "k STRING, v BIGINT"

    def start():
        return (
            spark.readStream.schema(schema).json(str(src))
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    def sink_rows():
        return sorted(
            (r["k"], r["v"]) for r in spark.read.parquet(out).collect()
        )

    q1 = start()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    assert sink_rows() == [("a", 1), ("b", 2)]

    _write(src, [{"k": "c", "v": 3}])
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    # restart from the same checkpoint: already-committed rows appear
    # exactly once, the new batch is appended (no replay, no loss)
    assert sink_rows() == [("a", 1), ("b", 2), ("c", 3)]


@pytest.mark.slow
def test_streaming_ingest_dedup(spark, tmp_path):
    """At-least-once delivery -> exactly-once downstream: duplicate
    event_ids across micro-batches inside the watermark emit once."""
    from de4ml_spark.streaming.dedup import dedup_stream

    src = tmp_path / "ev"
    _write(src, [
        {"event_id": 1, "ts": _ts(0), "v": 10},
        {"event_id": 2, "ts": _ts(1), "v": 20},
        {"event_id": 1, "ts": _ts(0), "v": 10},   # same-batch dupe
    ])
    schema = "event_id BIGINT, ts TIMESTAMP, v BIGINT"
    stream = dedup_stream(
        spark.readStream.schema(schema).json(str(src)),
        keys=["event_id"],
        watermark="10 minutes",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(src, [
            {"event_id": 2, "ts": _ts(1), "v": 20},  # cross-batch dupe
            {"event_id": 3, "ts": _ts(2), "v": 30},
        ])
        q.processAllAvailable()
        rows = spark.sql("select event_id from dedup_sink").collect()
    finally:
        q.stop()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3], ids


def test_delayed_join_earlier_reward_variant(spark):
    """Batch twin of the README variant (join-service/README.md:121-124):
    a reward W/2 BEFORE the decision matches only with
    include_earlier_rewards=True; default pins code semantics."""
    d = spark.createDataFrame(
        [("k1", "{}", "a", 0.5, "2024-01-01 00:00:10.000")],
        "key STRING, context STRING, action STRING, probability DOUBLE, d_ts STRING",
    ).withColumn("d_ts", F.col("d_ts").cast("timestamp"))
    r = spark.createDataFrame(
        [("k1", 7.0, "2024-01-01 00:00:05.000")],
        "key STRING, reward DOUBLE, r_ts STRING",
    ).withColumn("r_ts", F.col("r_ts").cast("timestamp"))

    strict = delayed_emission_join(d, r, window_ms=10_000).collect()
    assert [x["reward"] for x in strict] == [0.0]  # default fill, no match

    variant = delayed_emission_join(
        d, r, window_ms=10_000, include_earlier_rewards=True
    ).collect()
    assert [x["reward"] for x in variant] == [7.0]
    assert variant[0]["reward_delta_ms"] == -5000.0
