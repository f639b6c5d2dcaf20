"""Profile battery tests (parity: DuckDB SUMMARIZE consumption at
dataops/app/profile.py:26-48 and rule derivation profile.py:21-39)."""

from __future__ import annotations

import math

from de4ml_spark.planaudit import final_plan

from de4ml_spark.contracts.validation import rules_from_profile
from de4ml_spark.profile import profile


def _df(spark):
    return spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, "y"), (3, None, "y"), (4, 40.0, None)],
        "id BIGINT, v DOUBLE, s STRING",
    )


def test_battery_values(spark):
    rows = {r["column_name"]: r.asDict() for r in profile(_df(spark), exact=True).collect()}
    v = rows["v"]
    assert v["count"] == 4 and v["nulls"] == 1
    assert v["null_percentage"] == 25.0
    assert v["min"] == "10.0" and v["max"] == "40.0"
    assert abs(v["avg"] - 70.0 / 3) < 1e-9
    assert v["distinct"] == 3
    assert v["q50"] == 20.0
    assert v["is_numeric"] is True

    s = rows["s"]
    assert s["is_numeric"] is False
    assert s["distinct"] == 2
    assert s["min"] == "x" and s["max"] == "y"
    assert s["avg"] is None

    i = rows["id"]
    assert i["q25"] == 1.75 and i["q75"] == 3.25  # exact interpolation


def test_std_edge_cases_match_stddev_samp(spark):
    """Shifted-moment std: n=1 and all-null columns yield NULL (matching
    STDDEV_SAMP, where the old E[x^2]-mean^2 form gave NaN), and a
    large-mean/low-variance column survives without catastrophic
    cancellation."""
    df = spark.createDataFrame(
        [(1.0, None, 1e9 + 0.1), (None, None, 1e9 + 0.2), (None, None, 1e9 + 0.3)],
        "one DOUBLE, all_null DOUBLE, shifted DOUBLE",
    )
    rows = {
        r["column_name"]: r.asDict()
        for r in profile(df, exact=True).collect()
    }
    assert rows["one"]["std"] is None
    assert rows["all_null"]["std"] is None
    # exact sample std of {0.1, 0.2, 0.3} around 1e9 is 0.1; the naive
    # single-pass form loses every significant digit here
    assert abs(rows["shifted"]["std"] - 0.1) < 1e-6


def test_single_job_single_row_reduction(spark):
    # one scan, no shuffle beyond the final single-row aggregate
    p = profile(_df(spark), exact=False)
    plan = final_plan(p)
    assert "Python" not in plan


def test_rules_from_profile(spark):
    prof = [r.asDict() for r in profile(_df(spark), exact=True).collect()]
    rules = rules_from_profile(prof)
    by = {(r.loc, r.kind): r for r in rules}
    assert ("id", "required") in by  # 0% nulls
    assert ("v", "required") not in by  # has nulls
    b = by[("v", "bounds")]
    assert b.lo == 10.0 and b.hi == 40.0


def test_hll_sketches_rollup_matches_direct(spark, sf_dir):
    """Mergeable HLL sketches: daily-grain sketches rolled up to a total
    must give EXACTLY the estimate of sketching the whole column directly
    (union of HLL registers is lossless w.r.t. the direct sketch), and the
    estimate must be within ~2% of the exact distinct count."""
    from pyspark.sql import functions as F

    from de4ml_spark.profile.sketches import (
        distinct_sketches,
        rollup_sketches,
        with_estimate,
    )
    from de4ml_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    daily = distinct_sketches(ev, "user_id", by=["day", "event_type"])
    # rollup over a SUBSET of keys and to the grand total
    per_type = with_estimate(rollup_sketches(daily, ["event_type"]))
    total = with_estimate(rollup_sketches(daily, []))
    direct = with_estimate(distinct_sketches(ev, "user_id", by=[]))
    assert total.collect()[0]["n_distinct"] == direct.collect()[0]["n_distinct"]
    exact = ev.select("user_id").distinct().count()
    est = total.collect()[0]["n_distinct"]
    assert abs(est - exact) / exact < 0.02
    # per-type estimates close to exact per-type counts
    exact_pt = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in per_type.collect():
        assert abs(r["n_distinct"] - exact_pt[r["event_type"]]) / max(
            exact_pt[r["event_type"]], 1
        ) < 0.05
