"""CLI surface tests (reference parity: bin/etl.sh, bin/profile.sh, pcat)."""

from __future__ import annotations

import json


def test_cli_etl_and_pcat(spark, tmp_path, capsys):
    from de4ml_spark.__main__ import main

    raw = tmp_path / "raw"
    raw.mkdir()
    events = [
        {"ts": 1, "data": json.dumps({"query_id": "q1", "user": {"id": 7}})},
        {"ts": 2, "data": json.dumps({"query_id": "q2", "user": {"id": 8}})},
    ]
    (raw / "part.json").write_text("\n".join(json.dumps(e) for e in events))
    schema = {
        "type": "object",
        "properties": {
            "query_id": {"type": "string"},
            "user": {
                "type": "object",
                "properties": {"id": {"type": "integer"}},
            },
        },
    }
    sf = tmp_path / "schema.json"
    sf.write_text(json.dumps(schema))
    out = str(tmp_path / "out.parquet")

    assert main(["etl", "--raw", str(raw), "--schema", str(sf), "--out", out]) == 0
    got = {r["query_id"]: r["user__id"] for r in spark.read.parquet(out).collect()}
    assert got == {"q1": 7, "q2": 8}

    assert main(["pcat", out, "--limit", "1"]) == 0
    printed = capsys.readouterr().out
    assert "user__id" in printed


def test_cli_query(spark, capsys):
    from de4ml_spark.__main__ import main

    assert main(["query", "--list"]) == 0
    assert "q1_pricing_summary" in capsys.readouterr().out.splitlines()
    assert main(["query", "q1_pricing_summary", "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "l_returnflag" in out
    assert main(["query", "no_such_query"]) == 2


def test_cli_profile_rules(tmp_path, spark, capsys):
    from de4ml_spark.__main__ import main

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.1)], "id BIGINT, p DOUBLE"
    ).write.parquet(p)
    assert main(["profile", "--table", p, "--exact", "--rules"]) == 0
    out = capsys.readouterr().out
    lines = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    byname = {l["column_name"]: l for l in lines}
    assert byname["p"]["min"] == "0.1" and byname["p"]["max"] == "0.9"
    assert "# rule:" in out


def test_cli_serve_roundtrip(tmp_path):
    """serve subcommand: spins up the ingest endpoint from a schema file,
    accepts a valid POST, rejects an invalid one, lands RAW_SCHEMA lines."""
    import json
    import subprocess
    import sys
    import time
    import urllib.error
    import urllib.request

    schema = {
        "type": "object",
        "properties": {"q": {"type": "string"}, "n": {"type": "integer"}},
        "required": ["q"],
    }
    sf = tmp_path / "search.json"
    sf.write_text(json.dumps(schema))
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "de4ml_spark", "serve",
            "--table", f"searches={sf}",
            "--raw-root", str(tmp_path / "raw"),
            "--port", "0",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        cwd="/root/repo",
    )
    try:
        line = proc.stdout.readline()
        assert "serving ['searches'] on 127.0.0.1:" in line, line
        port = int(line.rsplit(":", 1)[1])

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/searches",
            data=json.dumps({"q": "hello", "n": 3}).encode(),
        )
        with urllib.request.urlopen(req) as resp:
            assert json.loads(resp.read()) == {"ok": True}
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/searches", data=json.dumps({"n": 3}).encode()
        )
        try:
            urllib.request.urlopen(bad)
            raise AssertionError("expected 422")
        except urllib.error.HTTPError as e:
            assert e.code == 422
        files = list((tmp_path / "raw" / "searches").glob("*.json"))
        assert len(files) == 1
        row = json.loads(files[0].read_text().strip())
        assert json.loads(row["data"]) == {"q": "hello", "n": 3}
        assert isinstance(row["ts"], int)
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_cli_profile_contracts_out(tmp_path, spark, capsys):
    """profile --contracts-out regenerates the typed contract artifact
    (dataops/app/profile.py:50-59 parity) and the artifact validates."""
    from de4ml_spark.__main__ import main
    from de4ml_spark.contracts.codegen import load_module

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.1)], "id BIGINT, p DOUBLE"
    ).write.parquet(p)
    out_mod = str(tmp_path / "contracts_gen.py")
    assert (
        main(
            [
                "profile",
                "--table",
                p,
                "--exact",
                "--contracts-out",
                out_mod,
                "--contracts-name",
                "TRequest",
            ]
        )
        == 0
    )
    mod = load_module(out_mod, modname="cli_generated_contract")
    assert mod.CONSTRAINTS["p"]["minimum"] == 0.1
    assert mod.CONSTRAINTS["p"]["maximum"] == 0.9
    assert mod.validate({"id": 1, "p": 0.5}) == []
    assert mod.validate({"id": None, "p": 2.0}) != []
