"""Streaming SPRT twin: decision rows emitted at first barrier
crossing must equal the batch replay's decided rows across a
micro-batch split, a decided test must ignore later days, and day
regressions are dropped-and-counted."""

from __future__ import annotations

import json
import time

import pytest

from pyspark.sql import functions as F

from de4ml_spark.streaming.sprt import streaming_sprt

SCHEMA = "decile BIGINT, day DATE, n BIGINT, x BIGINT"

SF = "/root/testdata/sf0.001"


def _write(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    (path / f"b_{time.time_ns()}.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )


def _run(spark, tmp_path, batches, name):
    src = tmp_path / "daily"
    _write(src, batches[0])
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        streaming_sprt(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        for b in batches[1:]:
            _write(src, b)
            q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()


@pytest.mark.slow
def test_stream_decisions_equal_batch_replay(spark, tmp_path):
    from de4ml_spark.queries.statq import sprt_ctr_deciles
    from de4ml_spark.session import load_table

    daily = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .filter(F.col("user_id").isNotNull())
        .groupBy(
            (F.col("user_id") % 10).alias("decile"),
            F.col("ts").cast("date").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("x"),
        )
        .selectExpr(
            "decile", "CAST(day AS STRING) AS day", "n", "x"
        )
        .collect()
    )
    rows = sorted(
        (
            {
                "decile": r["decile"],
                "day": r["day"],
                "n": r["n"],
                "x": r["x"],
            }
            for r in daily
        ),
        key=lambda r: (r["day"], r["decile"]),
    )
    mid = len(rows) // 2
    got = {
        r["decile"]: r
        for r in _run(spark, tmp_path, [rows[:mid], rows[mid:]], "sprt_sf")
    }
    batch = {
        r["decile"]: r
        for r in sprt_ctr_deciles(spark, SF).collect()
        if r["decision"] != "continue"
    }
    assert set(got) == set(batch)
    for dec, w in batch.items():
        g = got[dec]
        assert g["decision"] == w["decision"]
        assert g["decision_day"] == w["decision_day"]
        assert g["n_days_used"] == w["n_days_used"]
        assert g["llr_micro"] == w["llr_micro"]
        assert g["n_dropped"] == 0


@pytest.mark.slow
def test_decided_key_freezes_and_regressions_drop(spark, tmp_path):
    # decile 1: huge click day -> h1 immediately; later days ignored
    b1 = [
        {"decile": 1, "day": "2024-01-02", "n": 100, "x": 100},
        {"decile": 2, "day": "2024-01-02", "n": 10, "x": 3},
    ]
    b2 = [
        {"decile": 1, "day": "2024-01-03", "n": 100, "x": 0},
        {"decile": 2, "day": "2024-01-01", "n": 999, "x": 999},  # regress
    ]
    got = _run(spark, tmp_path, [b1, b2], "sprt_frozen")
    by_dec = {r["decile"]: r for r in got}
    assert set(by_dec) == {1}
    assert by_dec[1]["decision"] == "h1"
    assert by_dec[1]["n_days_used"] == 1
