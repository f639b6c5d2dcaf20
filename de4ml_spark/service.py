"""HTTP ingest service — the reference's logging-service surface on the
standard library only (no web framework in this environment).

Parity: logging-service/app/api.py:12-30 (``POST /searches`` /
``POST /clicks`` validate-then-persist, ``GET /fetch`` debug reads,
``GET /`` health) and storage.py:40-46 (server-assigned timestamp on
write). Endpoints here are table-driven instead of hand-written per
contract: ``POST /<table>`` validates the JSON body against the table's
contract (StructType, usually built from JSON Schema via
``contracts.struct_from_json_schema``) and appends
``{"ts": <server epoch micros>, "data": <raw json>}`` lines to the
table's raw directory — exactly the ``RAW_SCHEMA`` shape
``etl.pipeline.read_raw`` consumes, so the service plugs directly into
the existing ETL path (ingest -> parse_typed -> flatten -> warehouse).

Validation is a pure-Python structural check derived from the contract
(required non-nullable fields, primitive type checks, nested structs,
arrays) — the same role Pydantic plays at the reference's endpoints;
invalid bodies get 422 with a field-level error list, mirroring
FastAPI's validation failure contract.

Scale posture: the service is the thin stateless edge — one append-only
JSON-lines file per server instance per table (rotated by instance, the
storage.py single-writer pattern); horizontal scale is N instances
writing N files, which the downstream Spark scan globs together. The
heavy lifting (typing, flattening, validation *analytics*) stays in the
engine, not the endpoint.
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any
from urllib.parse import parse_qs, urlparse

from pyspark.sql import types as T


def _type_errors(value: Any, dt: T.DataType, path: str) -> list[str]:
    """Structural validation of a parsed-JSON value against a Spark type."""
    errs: list[str] = []
    if isinstance(dt, T.StructType):
        if not isinstance(value, dict):
            return [f"{path or '$'}: expected object"]
        for f in dt.fields:
            p = f"{path}.{f.name}" if path else f.name
            if f.name not in value or value[f.name] is None:
                if not f.nullable:
                    errs.append(f"{p}: missing required field")
                continue
            errs.extend(_type_errors(value[f.name], f.dataType, p))
        return errs
    if isinstance(dt, T.ArrayType):
        if not isinstance(value, list):
            return [f"{path}: expected array"]
        for i, item in enumerate(value):
            errs.extend(_type_errors(item, dt.elementType, f"{path}[{i}]"))
        return errs
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)):
        if isinstance(value, bool) or not isinstance(value, int):
            errs.append(f"{path}: expected integer")
    elif isinstance(dt, (T.DoubleType, T.FloatType)):
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            errs.append(f"{path}: expected number")
    elif isinstance(dt, T.BooleanType):
        if not isinstance(value, bool):
            errs.append(f"{path}: expected boolean")
    elif isinstance(dt, (T.StringType, T.TimestampType, T.DateType)):
        if not isinstance(value, str):
            errs.append(f"{path}: expected string")
    # other types (binary, decimal, ...) pass through untyped raw JSON
    return errs


@dataclass
class TableSink:
    """Append-only JSON-lines sink for one table (RAW_SCHEMA shape)."""

    contract: T.StructType
    raw_dir: Path
    _lock: threading.Lock = field(default_factory=threading.Lock)
    _file: Path | None = None

    def write(self, raw_body: bytes, parsed: dict) -> None:
        line = json.dumps(
            {"ts": time.time_ns() // 1_000, "data": raw_body.decode("utf-8")}
        )
        with self._lock:
            if self._file is None:
                self.raw_dir.mkdir(parents=True, exist_ok=True)
                self._file = self.raw_dir / f"ingest_{time.time_ns()}.json"
            with self._file.open("a") as fh:
                fh.write(line + "\n")

    def fetch(self, limit: int) -> list[dict]:
        if limit <= 0:  # lines[-0:] would return EVERYTHING
            return []
        with self._lock:
            if self._file is None or not self._file.exists():
                return []
            lines = self._file.read_text().splitlines()
        return [json.loads(ln) for ln in lines[-limit:]]


class IngestService:
    """Table-driven validate-and-persist HTTP service."""

    def __init__(self, tables: dict[str, TableSink], host: str = "127.0.0.1", port: int = 0):
        self.tables = tables
        service = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def _reply(self, code: int, payload: Any) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:
                url = urlparse(self.path)
                if url.path == "/":
                    self._reply(200, {"ok": True})
                    return
                if url.path == "/fetch":
                    q = parse_qs(url.query)
                    table = (q.get("table") or [""])[0]
                    try:
                        limit = int((q.get("limit") or ["10"])[0])
                    except ValueError:
                        self._reply(422, {"detail": "limit must be an integer"})
                        return
                    sink = service.tables.get(table)
                    if sink is None:
                        self._reply(404, {"detail": f"unknown table {table!r}"})
                        return
                    self._reply(200, sink.fetch(limit))
                    return
                self._reply(404, {"detail": "not found"})

            def do_POST(self) -> None:
                table = urlparse(self.path).path.strip("/")
                sink = service.tables.get(table)
                if sink is None:
                    self._reply(404, {"detail": f"unknown table {table!r}"})
                    return
                length = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(length)
                try:
                    parsed = json.loads(raw)
                except ValueError:
                    self._reply(422, {"detail": [{"msg": "invalid JSON body"}]})
                    return
                errs = _type_errors(parsed, sink.contract, "")
                if errs:
                    self._reply(
                        422, {"detail": [{"msg": e} for e in errs]}
                    )
                    return
                sink.write(raw, parsed)
                self._reply(200, {"ok": True})

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
