"""Streaming KS drift monitor: the running statistic after every
batch must equal the exact batch KS over the same prefix
(integer identity — no tolerance), and the shared math must
reproduce the batch catalog entry's value at sf0.001."""

from __future__ import annotations

import json
import time

import pytest

from de4ml_spark.streaming.ksdrift import exact_ks, streaming_ks_monitor

SCHEMA = "event_id BIGINT, ts TIMESTAMP, value DOUBLE"

# reference: cents-value histogram of a frozen "training" sample
REFERENCE = {1000: 30, 2000: 25, 3000: 25, 4000: 20}


def _rows(cents_counts: dict[int, int], start: int):
    base = 1704067200.0
    out, i = [], start
    for v_c, n in cents_counts.items():
        for _ in range(n):
            t = time.strftime(
                "%Y-%m-%d %H:%M:%S", time.gmtime(base + i)
            )
            out.append(
                {"event_id": i, "ts": t, "value": v_c / 100.0}
            )
            i += 1
    return out


def _write(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    (path / f"b_{time.time_ns()}.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )


@pytest.mark.slow
def test_streaming_ks_matches_batch_math(spark, tmp_path):
    src = tmp_path / "ev"
    batch1 = {1000: 15, 2000: 13, 3000: 12, 4000: 10}
    batch2 = {9000: 30}  # drift: mass appears far right of reference
    _write(src, _rows(batch1, 0))
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = streaming_ks_monitor(stream, REFERENCE)
    q = (
        out.writeStream.format("memory")
        .queryName("ks_monitor")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(src, _rows(batch2, 1000))
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ks_monitor").collect()
    finally:
        q.stop()
    by_n = {r["n_live"]: r for r in rows}
    n1 = sum(batch1.values())
    merged = dict(batch1)
    for v, n in batch2.items():
        merged[v] = merged.get(v, 0) + n
    n2 = sum(merged.values())
    d1, nr, nl1 = exact_ks(REFERENCE, batch1)
    d2, _nr, nl2 = exact_ks(REFERENCE, merged)
    assert by_n[n1]["d_num"] == d1 and by_n[n1]["n_ref"] == nr
    assert by_n[n2]["d_num"] == d2
    assert by_n[n1]["ks_d"] == d1 / (nr * nl1)
    assert by_n[n2]["ks_d"] == d2 / (nr * nl2)
    assert by_n[n2]["ks_d"] > by_n[n1]["ks_d"]


def test_exact_ks_agrees_with_batch_entry(spark):
    """The shared KS math, fed the batch entry's own click/purchase
    histograms at sf0.001, reproduces the catalog value exactly."""
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        """SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT),
               event_type
        FROM '/root/testdata/sf0.001/events.parquet'
        WHERE value IS NOT NULL
          AND event_type IN ('click', 'purchase')"""
    ).fetchall()
    click: dict[int, int] = {}
    purchase: dict[int, int] = {}
    for v_c, et in rows:
        d = click if et == "click" else purchase
        d[v_c] = d.get(v_c, 0) + 1
    d_num, n_ref, n_live = exact_ks(click, purchase)

    from de4ml_spark.queries.statq3 import ks_two_sample_value

    row = ks_two_sample_value(spark, "/root/testdata/sf0.001").collect()[
        0
    ]
    assert row["n_a"] == n_ref and row["n_b"] == n_live
    assert row["d_num"] == d_num
    assert row["ks_d"] == d_num / (n_ref * n_live)
