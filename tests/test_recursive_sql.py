"""Native Spark 4 recursive-CTE twin vs the sharded Arrow scan: the two
throttle implementations must produce the identical kept SET."""

from __future__ import annotations


def test_throttle_recursive_cte_matches_arrow_scan(spark, sf_dir):
    from de4ml_spark.operators.recursive_sql import throttle_recursive_sql
    from de4ml_spark.operators.throttle import throttle
    from de4ml_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_rcte_v")
    native = spark.sql(
        throttle_recursive_sql("events_rcte_v", min_gap_us=86_400_000_000)
    )
    arrow = throttle(ev, ["user_id", "event_type"])
    a = {tuple(r) for r in native.collect()}
    b = {tuple(r) for r in arrow.collect()}
    assert a == b and len(a) > 0


def test_throttle_recursive_cte_short_gap(spark, sf_dir):
    """A shorter gap exercises deeper recursion (more kept per key)."""
    from de4ml_spark.operators.recursive_sql import throttle_recursive_sql
    from de4ml_spark.operators.throttle import throttle
    from de4ml_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").limit(500)
    ev.createOrReplaceTempView("events_rcte_small_v")
    native = spark.sql(
        throttle_recursive_sql(
            "events_rcte_small_v", min_gap_us=3_600_000_000
        )
    )
    arrow = throttle(ev, ["user_id", "event_type"], min_gap_us=3_600_000_000)
    assert {tuple(r) for r in native.collect()} == {
        tuple(r) for r in arrow.collect()
    }
