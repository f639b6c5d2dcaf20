"""SQLite landing-table source (S3) and observe-based DQ metrics (A2)."""

from __future__ import annotations

import json
import sqlite3

from de4ml_spark.planaudit import final_plan

from de4ml_spark.contracts.validation import Rule
from de4ml_spark.profile.observe import observed_violation_counts
from de4ml_spark.sources.sqlite import read_sqlite_table


def test_read_sqlite_landing_table(spark, tmp_path):
    """Mirror of the reference's landing store: (ts, data) rows with one
    JSON blob per event (storage.py:31, 40-46)."""
    db = str(tmp_path / "events.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE searches (ts INTEGER, data TEXT)")
    for i in range(5):
        con.execute(
            "INSERT INTO searches VALUES (?, ?)",
            (1700000000000000 + i, json.dumps({"query_id": f"q{i}"})),
        )
    con.commit()
    con.close()

    df = read_sqlite_table(spark, db, "searches")
    assert df.count() == 5
    assert set(df.columns) == {"ts", "data"}
    assert df.filter("ts = 1700000000000003").collect()[0]["data"] == (
        '{"query_id": "q3"}'
    )


def test_observe_counts_no_extra_pass(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (2, 1.5), (3, None)], "id BIGINT, probability DOUBLE"
    )
    rules = [
        Rule(loc="probability", kind="required"),
        Rule(loc="probability", kind="bounds", lo=0.0, hi=1.0),
    ]
    observed, obs = observed_violation_counts(df, rules)
    assert observed.count() == 3  # the "real" job; metrics ride along
    assert obs.get == {"probability__required": 1, "probability__bounds": 1}


def test_jsonl_roundtrip_and_corrupt_policy(spark, tmp_path):
    """JSONL: explicit-schema roundtrip; PERMISSIVE captures the raw bad
    line; DROPMALFORMED drops it; valid/reject split matches."""
    from de4ml_spark.sources.files import (
        read_jsonl,
        split_corrupt,
        write_jsonl,
    )

    p = str(tmp_path / "land")
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id BIGINT, name STRING, v DOUBLE"
    )
    write_jsonl(df, p)
    # inject a malformed line alongside Spark's output
    (tmp_path / "land" / "bad.json").write_text('{"id": broken!!\n')
    got = read_jsonl(spark, p, "id BIGINT, name STRING, v DOUBLE")
    valid, rejects = split_corrupt(got)
    assert {tuple(r) for r in valid.collect()} == {(1, "a", 1.5), (2, "b", 2.5)}
    assert rejects.count() == 1
    assert "broken" in rejects.collect()[0]["_corrupt_record"]
    dropped = read_jsonl(
        spark, p, "id BIGINT, name STRING, v DOUBLE", mode="DROPMALFORMED"
    )
    assert dropped.count() == 2


def test_csv_roundtrip_and_corrupt_policy(spark, tmp_path):
    from de4ml_spark.sources.files import read_csv, split_corrupt, write_csv

    p = str(tmp_path / "land_csv")
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id BIGINT, name STRING, v DOUBLE"
    )
    write_csv(df, p)
    (tmp_path / "land_csv" / "bad.csv").write_text("id,name,v\nnope,x\n")
    got = read_csv(spark, p, "id BIGINT, name STRING, v DOUBLE")
    valid, rejects = split_corrupt(got)
    assert {tuple(r) for r in valid.collect()} == {(1, "a", 1.5), (2, "b", 2.5)}
    assert rejects.count() == 1


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    """ORC sink/scan roundtrip preserves values; a filter on the scan
    reaches the ORC reader as a pushed filter with pruned columns."""
    from de4ml_spark.session import load_table
    from de4ml_spark.sources.files import read_orc, write_orc

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    a = sorted(tuple(r) for r in orders.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b
    filtered = back.filter(back["o_totalprice"] > 1000.0).select("o_orderkey")
    plan = final_plan(filtered)
    scan = next(l for l in plan.splitlines() if "FileScan orc" in l)
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split(
        "PushedFilters:"
    )[1].split("]")[0]
    assert "o_orderpriority" not in scan  # column pruning


def test_table_schemas_manifest_matches_testdata(spark, sf_dir):
    """The declared TABLE_SCHEMAS manifest (the schema every
    directory-shaped scan and every oracle view derives from) must
    stay in lockstep with the real testdata: same column names in the
    same order, and same types — except events.ts, where the manifest
    deliberately declares BIGINT (the raw int64-nanos ingest
    convention; load_table normalizes after the scan) while sf0.001
    happens to store micro timestamps."""
    from pyspark.sql import types as T

    from de4ml_spark.session import TABLES, TABLE_SCHEMAS, table_columns

    for t in TABLES:
        inferred = spark.read.parquet(f"{sf_dir}/{t}.parquet").schema
        declared = T.StructType.fromDDL(TABLE_SCHEMAS[t])
        assert [f.name for f in inferred] == table_columns(t), t
        for inf_f, dec_f in zip(inferred, declared):
            if t == "events" and inf_f.name == "ts":
                assert dec_f.dataType == T.LongType(), "ts manifest is nanos"
                continue
            assert inf_f.dataType == dec_f.dataType, (t, inf_f.name)


def test_manifest_scan_null_fills_pre_migration_file(spark, sf_dir, tmp_path):
    """Unit twin of the missingcol parity sweep: a directory holding a
    canonical file plus a pre-migration file (no `source`) reads
    null-filled under load_table's declared-manifest scan — same row
    count, missing column NULL on exactly the old file's rows."""
    import pyarrow.parquet as pq

    from de4ml_spark.session import load_table

    ddir = tmp_path / "documents.parquet"
    ddir.mkdir()
    tbl = pq.read_table(f"{sf_dir}/documents.parquet").sort_by("doc_id")
    pq.write_table(tbl.slice(0, 3), ddir / "part-0.parquet")
    pq.write_table(
        tbl.slice(3, 2).drop_columns(["source"]), ddir / "part-1.parquet"
    )
    got = load_table(spark, str(tmp_path), "documents")
    assert got.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert got.count() == 5
    assert got.filter("source IS NULL").count() == 2
