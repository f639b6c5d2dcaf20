"""CLI entry points mirroring the reference's operational surface.

Reference commands (relative to /root/reference/):
- ``bin/etl.sh <db> <table> <outdir>`` (logging-service/app/etl.py:76-90)
  -> ``python -m de4ml_spark etl --raw <json_dir> --schema <schema.json>
     --out <out.parquet>``
- ``bin/profile.sh`` (dataops/app/profile.py:42-78)
  -> ``python -m de4ml_spark profile --table <file.parquet> [--rules]``
- ``app/pcat.py`` (parquet cat, logging-service/app/pcat.py:1-17)
  -> ``python -m de4ml_spark pcat <file.parquet> [--limit N]``

The reference's ETL reads a SQLite event log; ours reads the JSON-lines
landing zone (SURVEY §7.5.5 — parity at the data level). For true SQLite
files use ``--sqlite <db> --sqlite-table <t>``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(cpus: int = 8):
    from de4ml_spark.session import get_spark

    return get_spark("de4ml-cli", cpus=cpus)


def cmd_etl(args: argparse.Namespace) -> int:
    from de4ml_spark.contracts.jsonschema import (
        flatten_manifest,
        struct_from_json_schema,
    )
    from de4ml_spark.etl.flatten import flatten
    from de4ml_spark.etl.pipeline import etl, parse_typed

    with open(args.schema) as fh:
        struct = struct_from_json_schema(json.load(fh))
    spark = _spark()
    if args.sqlite:
        from de4ml_spark.sources.sqlite import read_sqlite_table

        raw = read_sqlite_table(spark, args.sqlite, args.sqlite_table)
        flat = flatten(parse_typed(raw, struct).drop("ts"), struct)
        flat.write.mode("overwrite").parquet(args.out)
    else:
        flat = etl(spark, args.raw, struct, args.out)
    n = spark.read.parquet(args.out).count()
    print(f"wrote {n} rows x {len(flatten_manifest(struct))} cols -> {args.out}")
    return 0


def cmd_profile(args: argparse.Namespace) -> int:
    from de4ml_spark.contracts.validation import rules_from_profile
    from de4ml_spark.profile.battery import profile

    spark = _spark()
    df = spark.read.parquet(args.table)
    prof = profile(df, exact=args.exact)
    rows = [r.asDict() for r in prof.collect()]
    for r in rows:
        print(json.dumps(r, default=str))
    if args.rules:
        for rule in rules_from_profile(rows):
            print(f"# rule: {rule}")
    if args.promql:
        from de4ml_spark.profile.promexport import rules_to_promql

        with open(args.promql, "w") as fh:
            fh.write(rules_to_promql(rules_from_profile(rows)))
        print(f"# wrote alert rules -> {args.promql}")
    if args.contracts_out:
        from de4ml_spark.contracts.codegen import write_contract_module

        write_contract_module(
            args.contracts_out,
            args.contracts_name,
            df.schema,
            rules_from_profile(rows),
        )
        print(f"# wrote contract module -> {args.contracts_out}")
    return 0


def cmd_pcat(args: argparse.Namespace) -> int:
    spark = _spark()
    df = spark.read.parquet(args.file)
    print(df.columns)
    if args.limit:
        rows = df.limit(args.limit).collect()
    else:
        # full cat streams one partition at a time through the driver
        # (toLocalIterator) — never an unbounded collect()
        rows = df.toLocalIterator()
    for row in rows:
        print(tuple(row))
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    """Run a catalog query by name against a testdata directory — the
    ad-hoc query surface (list names with --list)."""
    from de4ml_spark.queries import catalog

    qs = catalog.queries()
    if args.list or not args.name:
        for name in qs:
            print(name)
        return 0
    if args.name not in qs:
        print(f"unknown query: {args.name}", file=sys.stderr)
        return 2
    spark = _spark()
    df = qs[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    rows = df.limit(args.limit).collect() if args.limit else df.collect()
    print(df.columns)
    for row in rows:
        print(json.dumps([*row], default=str))
    return 0


def cmd_serve(args: argparse.Namespace) -> int:
    """Run the HTTP ingest service (logging-service parity): each
    ``--table name=schema.json`` pair becomes a validate-then-persist
    ``POST /name`` endpoint appending RAW_SCHEMA JSON lines under
    ``<raw_root>/name`` for the etl subcommand to consume."""
    from de4ml_spark.contracts.jsonschema import struct_from_json_schema
    from de4ml_spark.service import IngestService, TableSink
    from pathlib import Path

    tables = {}
    for spec in args.table:
        name, _, schema_path = spec.partition("=")
        if not schema_path:
            print(f"--table expects name=schema.json, got {spec!r}", file=sys.stderr)
            return 2
        with open(schema_path) as fh:
            contract = struct_from_json_schema(json.load(fh))
        tables[name] = TableSink(contract, Path(args.raw_root) / name)
    svc = IngestService(tables, host=args.host, port=args.port)
    svc.start()
    print(f"serving {sorted(tables)} on {args.host}:{svc.port}")
    try:
        import threading

        threading.Event().wait()  # run until interrupted
    except KeyboardInterrupt:
        pass
    finally:
        svc.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="de4ml_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("etl", help="raw events -> typed, flattened parquet")
    pe.add_argument("--raw", help="JSON-lines landing dir (ts,data rows)")
    pe.add_argument("--sqlite", help="SQLite db path (alternative to --raw)")
    pe.add_argument("--sqlite-table", default="events")
    pe.add_argument("--schema", required=True, help="JSON Schema file")
    pe.add_argument("--out", required=True, help="output parquet path")
    pe.set_defaults(fn=cmd_etl)

    pp = sub.add_parser("profile", help="per-column stats battery")
    pp.add_argument("--table", required=True, help="parquet path")
    pp.add_argument("--exact", action="store_true")
    pp.add_argument("--rules", action="store_true", help="derive quality rules")
    pp.add_argument(
        "--promql",
        help="write the Prometheus alert-rules YAML artifact here "
        "(mirrors bin/profile.sh -> promconfig/data_quality_rules.yml)",
    )
    pp.add_argument(
        "--contracts-out",
        help="regenerate the typed contract module artifact here "
        "(mirrors dataops/app/profile.py:50-59 -> app/contracts.py)",
    )
    pp.add_argument(
        "--contracts-name",
        default="GeneratedContract",
        help="class name for the regenerated contract dataclass",
    )
    pp.set_defaults(fn=cmd_profile)

    pc = sub.add_parser("pcat", help="print a parquet file")
    pc.add_argument("file")
    pc.add_argument("--limit", type=int, default=0)
    pc.set_defaults(fn=cmd_pcat)

    pq = sub.add_parser("query", help="run a catalog query by name")
    pq.add_argument("name", nargs="?", help="catalog query name")
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pq.add_argument("--limit", type=int, default=20)
    pq.add_argument("--list", action="store_true", help="list query names")
    pq.add_argument(
        "--explain", action="store_true", help="print the physical plan"
    )
    pq.set_defaults(fn=cmd_query)

    ps = sub.add_parser(
        "serve", help="HTTP ingest service (validate-then-persist endpoints)"
    )
    ps.add_argument(
        "--table",
        action="append",
        required=True,
        help="name=schema.json (repeatable; one POST endpoint per table)",
    )
    ps.add_argument("--raw-root", required=True, help="landing-zone root dir")
    ps.add_argument("--host", default="127.0.0.1")
    ps.add_argument("--port", type=int, default=8080)
    ps.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
