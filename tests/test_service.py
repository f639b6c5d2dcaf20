"""HTTP ingest service: validate-then-persist endpoints feeding the
existing raw -> typed ETL path (logging-service/app/api.py parity on
stdlib http.server)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from de4ml_spark.contracts import struct_from_json_schema
from de4ml_spark.service import IngestService, TableSink

CLICK_SCHEMA = {
    "type": "object",
    "properties": {
        "query_id": {"type": "string"},
        "document_id": {"type": "integer"},
        "position": {"type": "integer"},
    },
    "required": ["query_id", "document_id", "position"],
}


def _post(port: int, path: str, payload) -> tuple[int, dict]:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port: int, path: str) -> tuple[int, object]:
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def service(tmp_path):
    contract = struct_from_json_schema(CLICK_SCHEMA)
    svc = IngestService(
        {"clicks": TableSink(contract, tmp_path / "raw" / "clicks")}
    )
    svc.start()
    yield svc, tmp_path
    svc.stop()


def test_health_and_unknown_table(service):
    svc, _ = service
    assert _get(svc.port, "/") == (200, {"ok": True})
    code, _body = _post(svc.port, "/nope", {})
    assert code == 404


def test_validate_then_persist_roundtrip(spark, service):
    svc, tmp_path = service
    ok = {"query_id": "q1", "document_id": 7, "position": 1}
    assert _post(svc.port, "/clicks", ok) == (200, {"ok": True})
    # validation failures: missing required field, wrong type, bad JSON
    code, body = _post(svc.port, "/clicks", {"query_id": "q2"})
    assert code == 422
    msgs = " ".join(d["msg"] for d in body["detail"])
    assert "document_id" in msgs and "position" in msgs
    code, _ = _post(
        svc.port, "/clicks", {"query_id": 3, "document_id": 7, "position": 1}
    )
    assert code == 422
    # second valid row, then fetch shows both in order
    ok2 = {"query_id": "q9", "document_id": 8, "position": 2}
    assert _post(svc.port, "/clicks", ok2)[0] == 200
    code, rows = _get(svc.port, "/fetch?table=clicks&limit=10")
    assert code == 200 and [json.loads(r["data"])["query_id"] for r in rows] == [
        "q1",
        "q9",
    ]
    assert all(isinstance(r["ts"], int) for r in rows)

    # the persisted raw dir is directly consumable by the ETL path
    from de4ml_spark.etl.pipeline import parse_typed, read_raw

    contract = struct_from_json_schema(CLICK_SCHEMA)
    raw = read_raw(spark, str(tmp_path / "raw" / "clicks"))
    typed = parse_typed(raw, contract)
    got = {
        (r["query_id"], r["document_id"], r["position"])
        for r in typed.select("query_id", "document_id", "position").collect()
    }
    assert got == {("q1", 7, 1), ("q9", 8, 2)}


def test_nested_contract_validation(tmp_path):
    schema = {
        "type": "object",
        "properties": {
            "user": {
                "type": "object",
                "properties": {"id": {"type": "integer"}},
                "required": ["id"],
            },
            "tags": {"type": "array", "items": {"type": "string"}},
        },
        "required": ["user"],
    }
    svc = IngestService(
        {
            "events": TableSink(
                struct_from_json_schema(schema), tmp_path / "raw" / "events"
            )
        }
    )
    svc.start()
    try:
        assert (
            _post(svc.port, "/events", {"user": {"id": 3}, "tags": ["a"]})[0]
            == 200
        )
        assert _post(svc.port, "/events", {"user": {}})[0] == 422
        assert (
            _post(svc.port, "/events", {"user": {"id": 3}, "tags": [1]})[0]
            == 422
        )
    finally:
        svc.stop()


def test_fetch_limit_edge_cases(service):
    """limit=0 must return zero rows (lines[-0:] is the WHOLE file), a
    negative limit likewise, and a non-integer limit is a 422, not an
    unhandled 500."""
    svc, _ = service
    ok = {"query_id": "q1", "document_id": 7, "position": 1}
    assert _post(svc.port, "/clicks", ok)[0] == 200
    assert _get(svc.port, "/fetch?table=clicks&limit=0") == (200, [])
    assert _get(svc.port, "/fetch?table=clicks&limit=-3") == (200, [])
    code, _body = _get(svc.port, "/fetch?table=clicks&limit=abc")
    assert code == 422
    code, rows = _get(svc.port, "/fetch?table=clicks&limit=5")
    assert code == 200 and len(rows) == 1
