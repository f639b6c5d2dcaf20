"""SQLite landing-table source (S3) and observe-based DQ metrics (A2)."""

from __future__ import annotations

import json
import sqlite3

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
