"""Incremental join-view maintenance: after arbitrary churn (inserts,
updates, deletes on both sides) the maintained view must equal the
from-scratch join of the current snapshots."""

from __future__ import annotations

from pyspark.sql import functions as F


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_maintained_view_equals_recompute(spark, tmp_path):
    from de4ml_spark.etl import versioned as vt
    from de4ml_spark.etl.ivm import (
        bootstrap_join_view,
        join_view,
        maintain_join_view,
    )

    a_root = str(tmp_path / "a")
    b_root = str(tmp_path / "b")
    v_root = str(tmp_path / "v")

    # A: orders (a_id, cust, amount); B: customers (cust, name)
    a0 = spark.createDataFrame(
        [(1, 10, 5.0), (2, 11, 6.0), (3, 10, 7.0), (4, 12, 8.0)],
        "a_id BIGINT, cust BIGINT, amount DOUBLE",
    )
    b0 = spark.createDataFrame(
        [(10, "x"), (11, "y"), (13, "z")], "cust BIGINT, name STRING"
    )
    va0 = vt.commit(spark, a_root, a0)
    vb0 = vt.commit(spark, b_root, b0)
    bootstrap_join_view(spark, a_root, b_root, v_root, on="cust")

    # churn both sides: update a_id=2 (cust 11 -> 13), delete a_id=4,
    # insert a_id=5; update cust=10's name, delete cust=11, insert 12
    a1 = spark.createDataFrame(
        [(1, 10, 5.0), (2, 13, 6.5), (3, 10, 7.0), (5, 12, 9.0)],
        "a_id BIGINT, cust BIGINT, amount DOUBLE",
    )
    b1 = spark.createDataFrame(
        [(10, "x2"), (13, "z"), (12, "w")], "cust BIGINT, name STRING"
    )
    va1 = vt.commit(spark, a_root, a1)
    vb1 = vt.commit(spark, b_root, b1)

    maintain_join_view(
        spark, a_root, b_root, v_root, on="cust", ka="a_id", kb="cust",
        a_from=va0, a_to=va1, b_from=vb0, b_to=vb1,
    )
    got = _rows(vt.read(spark, v_root))
    want = _rows(join_view(a1, b1, "cust"))
    assert got == want and len(want) > 0

    # second cycle: A unchanged, B churns again (delete cust 12)
    b2 = spark.createDataFrame(
        [(10, "x2"), (13, "z3")], "cust BIGINT, name STRING"
    )
    vb2 = vt.commit(spark, b_root, b2)
    maintain_join_view(
        spark, a_root, b_root, v_root, on="cust", ka="a_id", kb="cust",
        a_from=va1, a_to=va1, b_from=vb1, b_to=vb2,
    )
    assert _rows(vt.read(spark, v_root)) == _rows(join_view(a1, b2, "cust"))

    # the view is itself versioned: the previous cycle's result is
    # still time-travelable
    versions = vt.committed_versions(v_root)
    assert len(versions) == 3
    assert _rows(vt.read(spark, v_root, versions[1])) == want
