#!/usr/bin/env python
"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry from __spark_entry__.py at a given sf and
compares against ``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted).

Usage: python tools/verify_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


# --------------------------------------------------------------------------
# Cross-engine type parity: the driver's hasher preserves Arrow-level types,
# so a DuckDB HUGEINT (decimal128) against a Spark BIGINT (int64) hash-
# mismatches on IDENTICAL values. The round-5 driver failures (ks_drift,
# epoch_mix, rollup_cascade) all passed the value compare below while
# carrying exactly that drift. Canonicalize both engines' result types and
# fail on any pair outside the explicit allowed-widening map.
# --------------------------------------------------------------------------

_DUCK_CANON = {
    "BIGINT": "bigint", "INT64": "bigint", "LONG": "bigint",
    "INTEGER": "int", "INT32": "int", "INT": "int",
    "SMALLINT": "smallint", "TINYINT": "tinyint",
    "UBIGINT": "hugeint", "HUGEINT": "hugeint", "UHUGEINT": "hugeint",
    "UINTEGER": "bigint", "USMALLINT": "int", "UTINYINT": "smallint",
    "DOUBLE": "double", "FLOAT": "float", "REAL": "float",
    "VARCHAR": "string", "BOOLEAN": "boolean", "DATE": "date",
    "BLOB": "binary", "INTERVAL": "interval",
}

# Pairs (spark, duck) that hash identically at the driver's compare layer
# despite different engine names. Keep this SMALL and explicit, and only
# add a pair with DRIVER EVIDENCE: (int, bigint) is proven benign by 26
# catalog entries (daily_heavy_hitters, bm25_search_docs, tfidf_*, knn_*,
# ...) that carry int32 rank/bin columns against BIGINT oracles and have
# driver-green hash_match; HUGEINT and decimal-vs-double drift are exactly
# what failed in round 5, so they are NOT widened.
_ALLOWED_WIDENING = {
    ("timestamp", "timestamp"),
    ("timestamp_ntz", "timestamp"),
    ("int", "bigint"),
    ("array<int>", "array<bigint>"),
}


def canon_duck_type(t: str) -> str:
    t = str(t).strip().upper()
    if t.endswith("[]"):
        return f"array<{canon_duck_type(t[:-2])}>"
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return _DUCK_CANON.get(t, t.lower())


def canon_spark_type(t: str) -> str:
    t = t.strip().lower()
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{canon_spark_type(t[6:-1])}>"
    return {"integer": "int", "long": "bigint"}.get(t, t)


# Driver-PROVEN safe result types: every historically hash-green catalog
# entry exposes only these. DECIMAL and HUGEINT result columns are the
# proven failure class (rounds 5 AND 6: the only red rows each round were
# exactly the only decimal128-class results in the graded set, with
# bit-identical values locally) — so membership here is a HARD gate, not
# name-parity: a decimal(38,4)==decimal(38,4) match still fails.
_SAFE_RESULT_TYPES = {
    "bigint", "int", "smallint", "tinyint", "double", "float",
    "string", "boolean", "date", "timestamp", "timestamp_ntz", "binary",
}


def _unsafe(canon_t: str) -> bool:
    base = canon_t[6:-1] if canon_t.startswith("array<") else canon_t
    return base not in _SAFE_RESULT_TYPES


def type_parity_errors(sdf_dtypes, duck_cols, duck_types) -> list[str]:
    """Compare Spark dtypes vs DuckDB relation types by column NAME
    (the driver sorts columns by name before hashing), AND enforce the
    driver-proven safe-type whitelist on BOTH engines' result schemas.
    Returns a list of human-readable drift descriptions; empty means
    parity."""
    spark_map = {c: canon_spark_type(t) for c, t in sdf_dtypes}
    errs = []
    for col, scanon in spark_map.items():
        if _unsafe(scanon):
            errs.append(f"{col}: unsafe spark result type {scanon} "
                        f"(driver hasher diverges on decimal128-class)")
    for col, dt in zip(duck_cols, duck_types):
        dcanon = canon_duck_type(dt)
        if _unsafe(dcanon):
            errs.append(f"{col}: unsafe duckdb result type {dcanon} "
                        f"(driver hasher diverges on decimal128-class)")
        scanon = spark_map.get(col)
        if scanon is None:
            continue  # column-name mismatch is reported separately
        if scanon == dcanon:
            continue
        if (scanon, dcanon) in _ALLOWED_WIDENING:
            continue
        errs.append(f"{col}: spark={scanon} duck={dcanon}({dt})")
    return errs


def norm_cell(v):
    import datetime
    import math
    from decimal import Decimal

    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def main() -> int:
    import __spark_entry__ as entrymod
    from de4ml_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # A bogus sf_dir must be a one-line usage error, not a raw DuckDB
    # IOException traceback on the first CREATE VIEW (VERDICT r12 #5).
    import os

    from de4ml_spark.session import TABLES

    missing = [
        t
        for t in TABLES
        if not os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
    ]
    if missing:
        print(
            f"NO SUCH SF DIR  {sf_dir}: missing "
            f"{', '.join(m + '.parquet' for m in missing[:3])}"
            f"{' ...' if len(missing) > 3 else ''}\n"
            f"USAGE: python tools/verify_oracle.py [sf_dir] [query_name ...]"
        )
        return 2

    spark = get_spark("verify_oracle", cpus=8)
    con = duckdb.connect()
    from de4ml_spark.session import duckdb_view_sql

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            + duckdb_view_sql(t, f"{sf_dir}/{t}.parquet")
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    # A typo'd CLI name must be a hard error, not a silent no-op: a
    # verification list that filters to zero known names would otherwise
    # read as "verified" when nothing ran (VERDICT r11 #2/#5).
    unknown = only - set(qs)
    for name in sorted(unknown):
        print(f"UNKNOWN  {name}: not in queries()")
        failures += 1
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        finally:
            # release corpus-sized rank/cumsum intermediates registered
            # during this entry (see de4ml_spark.cache.defer_release)
            from de4ml_spark.cache import drain_deferred

            drain_deferred()
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            otypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        ok = True
        terrs = type_parity_errors(sdf.dtypes, ocols, otypes)
        if terrs:
            print(f"FAIL  {name}: type drift: {'; '.join(terrs)}")
            ok = False
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            ok = False
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            ok = False
        if ok:
            a, b = canon(srows, scols), canon(orows, ocols)
            if a != b:
                bad = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL  {name}: value mismatch; first diffs: {bad}")
                ok = False
        if ok:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        else:
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
