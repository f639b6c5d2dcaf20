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
