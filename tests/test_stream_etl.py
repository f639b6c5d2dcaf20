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
