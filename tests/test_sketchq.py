"""Sketch / SPC tier semantics: the window-algebra CUSUM must equal the
textbook recurrence, the KMV estimate must be in a sane band around the
exact count, and CountMin must never underestimate."""

from __future__ import annotations


def test_cusum_closed_form_equals_recurrence(spark, sf_dir):
    """s_i = P_i - min(0, running_min(P)) == max(0, s_{i-1} + x_i),
    replayed row-by-row in Python on the same daily frame."""
    from pyspark.sql import functions as F

    from de4ml_spark.queries.sketchq import (
        CUSUM_H,
        CUSUM_K,
        cusum_alarm_value,
    )
    from de4ml_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
            ).alias("dc")
        )
        .collect()
    )
    by_user: dict = {}
    for r in daily:
        by_user.setdefault(r["user_id"], []).append((r["day"], r["dc"]))
    expected = set()
    for uid, rows in by_user.items():
        s = 0
        for day, dc in sorted(rows):
            s = max(0, s + (dc - CUSUM_K))
            if s > CUSUM_H:
                expected.add((uid, day, s))
    got = {
        (r["user_id"], r["day"], r["cusum_c"])
        for r in cusum_alarm_value(spark, sf_dir).collect()
    }
    assert got == expected and len(got) > 0


def test_kmv_estimate_sane(spark, sf_dir):
    """KMV with k=64 has relative standard error ~1/sqrt(k-2) ~ 13%;
    assert every day's estimate is within 5 sigma, and that sub-k days
    fall back to the exact count."""
    from de4ml_spark.queries.sketchq import KMV_K, kmv_distinct_users

    rows = kmv_distinct_users(spark, sf_dir).collect()
    assert rows
    for r in rows:
        exact, est = r["exact_distinct"], r["kmv_est"]
        if exact < KMV_K:
            assert est == exact
        else:
            assert abs(est - exact) <= 0.65 * exact, (r["day"], exact, est)


def test_countmin_never_underestimates(spark, sf_dir):
    from de4ml_spark.queries.sketchq import countmin_event_types

    rows = countmin_event_types(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cm_est"] >= r["exact_count"]


def test_entropy_bounds(spark, sf_dir):
    """0 <= H <= ln(vocab size) per source."""
    import math

    from pyspark.sql import functions as F

    from de4ml_spark.queries.sketchq import entropy_by_source
    from de4ml_spark.operators.text import tokens
    from de4ml_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    vocab_by_source = {
        r["source"]: r["v"]
        for r in docs.select("source", F.explode(tokens("text")).alias("t"))
        .groupBy("source")
        .agg(F.count_distinct("t").alias("v"))
        .collect()
    }
    for r in entropy_by_source(spark, sf_dir).collect():
        assert 0.0 <= r["entropy_r"] <= math.log(vocab_by_source[r["source"]]) + 1e-6
