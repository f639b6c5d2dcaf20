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
