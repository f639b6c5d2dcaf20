"""Streaming ETL E2E: the whole logging-service pipeline (ingest -> typed
parse -> validate -> __-flatten -> parquet + dead-letter rejects) as one
continuous query, fed incrementally."""

from __future__ import annotations

import json
import time

import pytest

from de4ml_spark.contracts import Rule, struct_from_json_schema
from de4ml_spark.streaming.sinks import stream_etl
from tests.test_contracts import SEARCH_SCHEMA

GOOD = {
    "timestamp_micros": 1,
    "user": {"id": 1},
    "query_id": "q1",
    "raw_query": "hello",
    "results": [{"document_id": 1, "position": 1, "score": 1.0}],
}
BAD = {"timestamp_micros": 2, "user": {"id": 2}, "raw_query": "no query_id"}


def _write(path, events):
    path.mkdir(parents=True, exist_ok=True)
    (path / f"b_{time.time_ns()}.json").write_text(
        "\n".join(json.dumps({"ts": i, "data": json.dumps(e)}) for i, e in enumerate(events))
    )


@pytest.mark.slow
def test_stream_etl_e2e(spark, tmp_path):
    raw = tmp_path / "raw"
    _write(raw, [GOOD, BAD])
    struct = struct_from_json_schema(SEARCH_SCHEMA)
    rules = [Rule(loc="query_id", kind="required"), Rule(loc="user", kind="required")]

    q = stream_etl(
        spark,
        str(raw),
        struct,
        out_path=str(tmp_path / "wh"),
        rejects_path=str(tmp_path / "dlq"),
        checkpoint=str(tmp_path / "ckpt"),
        rules=rules,
    )
    try:
        q.processAllAvailable()
        # feed a second micro-batch — the pipeline is continuous
        good2 = dict(GOOD, query_id="q2")
        _write(raw, [good2])
        q.processAllAvailable()
    finally:
        q.stop()

    wh = spark.read.parquet(str(tmp_path / "wh"))
    got = {r["query_id"]: r for r in wh.collect()}
    assert set(got) == {"q1", "q2"}
    assert got["q1"]["user__id"] == 1
    assert got["q1"]["results__score"] == [1.0]  # parallel-array flatten shape

    dlq = spark.read.json(str(tmp_path / "dlq"))
    rej = dlq.collect()
    assert len(rej) == 1
    assert "query_id" in rej[0]["violations"]


def test_incremental_agg_view(spark, tmp_path):
    """Materialized-view parity: per-key running aggregates upserted into a
    parquet view as epochs arrive — changed groups only (update mode)."""
    import json as _json
    import time as _time

    from pyspark.sql import functions as F

    from de4ml_spark.streaming.sinks import incremental_agg_view

    src = tmp_path / "src"
    src.mkdir()

    def write_batch(rows):
        (src / f"b{_time.time_ns()}.json").write_text(
            "\n".join(_json.dumps(r) for r in rows)
        )

    write_batch([
        {"key": "a", "reward": 1.0},
        {"key": "a", "reward": 2.0},
        {"key": "b", "reward": 5.0},
    ])
    stream = spark.readStream.schema("key STRING, reward DOUBLE").json(str(src))
    q = incremental_agg_view(
        spark,
        stream,
        ["key"],
        [F.count(F.lit(1)).alias("n"), F.sum("reward").alias("total")],
        view_path=str(tmp_path / "view"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        v1 = {
            r["key"]: (r["n"], r["total"])
            for r in spark.read.parquet(str(tmp_path / "view")).collect()
        }
        assert v1 == {"a": (2, 3.0), "b": (1, 5.0)}

        write_batch([{"key": "a", "reward": 4.0}, {"key": "c", "reward": 7.0}])
        q.processAllAvailable()
        v2 = {
            r["key"]: (r["n"], r["total"])
            for r in spark.read.parquet(str(tmp_path / "view")).collect()
        }
        assert v2 == {"a": (3, 7.0), "b": (1, 5.0), "c": (1, 7.0)}
    finally:
        q.stop()
