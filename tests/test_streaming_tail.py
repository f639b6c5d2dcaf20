"""Streaming retraction parity (S9): the reference's TAIL consumer
receives (timestamp, diff, *cols) and keeps diff>0 inserts
(join-service/app/main.py:107-120). tail_changelog_sink reconstructs the
explicit insert/retract pairs from Spark's folded update-mode stream;
these tests pin the delta algebra: pairing, folding to the view, and the
inserts-only consumer read.
"""

from __future__ import annotations

import json
import time
from collections import Counter

import pytest
from pyspark.sql import functions as F

from de4ml_spark.streaming.sinks import tail_changelog_sink

E_SCHEMA = "user_id BIGINT, value DOUBLE, ts TIMESTAMP"


def _write(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    f = path / f"batch_{time.time_ns()}.json"
    f.write_text("\n".join(json.dumps(r) for r in rows))


@pytest.mark.slow
def test_tail_retraction_pairing_and_fold(spark, tmp_path):
    src = tmp_path / "src"
    view_path = str(tmp_path / "view")
    log_path = str(tmp_path / "log")
    # epoch A: u1 twice, u2 once
    _write(
        src,
        [
            {"user_id": 1, "value": 10.0, "ts": "2024-01-01 00:00:00"},
            {"user_id": 1, "value": 5.0, "ts": "2024-01-01 00:00:01"},
            {"user_id": 2, "value": 7.0, "ts": "2024-01-01 00:00:02"},
        ],
    )
    stream = spark.readStream.schema(E_SCHEMA).json(str(src))
    q = tail_changelog_sink(
        spark,
        stream,
        ["user_id"],
        [
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("value") * 100).cast("bigint")).alias("sum_c"),
        ],
        view_path,
        log_path,
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        # epoch B: u1 again (update -> retract+insert), u3 new (insert
        # only), and a NULL-key event opening the NULL group
        _write(
            src,
            [
                {"user_id": 1, "value": 1.0, "ts": "2024-01-01 00:01:00"},
                {"user_id": 3, "value": 2.0, "ts": "2024-01-01 00:01:01"},
                {"user_id": None, "value": 4.0, "ts": "2024-01-01 00:01:02"},
            ],
        )
        q.processAllAvailable()
        # epoch C: the NULL group updates — must retract its epoch-B row
        # (null-safe key match in both the semi join and the upsert)
        _write(
            src,
            [
                {"user_id": None, "value": 6.0, "ts": "2024-01-01 00:02:00"},
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    log = [
        r.asDict()
        for r in spark.read.parquet(log_path)
        .orderBy("epoch", "diff")
        .collect()
    ]
    view = {
        r["user_id"]: (r["n"], r["sum_c"])
        for r in spark.read.parquet(view_path).collect()
    }

    # Final view is the batch recompute (the IVM arbiter) — exactly one
    # row per key including the NULL group (no stale duplicate).
    assert view == {
        1: (3, 1600),
        2: (1, 700),
        3: (1, 200),
        None: (2, 1000),
    }
    null_rows = [r for r in log if r["user_id"] is None]
    assert (
        sorted((r["n"], r["sum_c"], r["diff"]) for r in null_rows)
        == [(1, 400, -1), (1, 400, 1), (2, 1000, 1)]
    )

    # (1) Pairing: every retraction is preceded by an identical insert.
    seen_inserts: Counter = Counter()
    for r in log:
        key = (r["user_id"], r["n"], r["sum_c"])
        if r["diff"] == 1:
            seen_inserts[key] += 1
        else:
            assert seen_inserts[key] > 0, f"unpaired retraction {key}"
            seen_inserts[key] -= 1
    # u1's epoch-A aggregate (2, 1500) was retracted in epoch B.
    diffs = Counter(
        ((r["user_id"], r["n"], r["sum_c"]), r["diff"]) for r in log
    )
    assert diffs[((1, 2, 1500), -1)] == 1
    assert diffs[((1, 2, 1500), 1)] == 1

    # (2) Folding: multiset sum of diffs == the final view, exactly.
    folded: Counter = Counter()
    for r in log:
        folded[(r["user_id"], r["n"], r["sum_c"])] += r["diff"]
    survivors = {k: c for k, c in folded.items() if c != 0}
    assert survivors == {
        (u, n, s): 1 for u, (n, s) in view.items()
    }

    # (3) Reference consumer read: inserts only, latest epoch per key.
    latest: dict = {}
    for r in log:
        if r["diff"] > 0:
            prev = latest.get(r["user_id"])
            if prev is None or r["epoch"] >= prev["epoch"]:
                latest[r["user_id"]] = r
    assert {
        u: (r["n"], r["sum_c"]) for u, r in latest.items()
    } == view
