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

    spark = get_spark("verify_oracle", cpus=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
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
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        ok = True
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
