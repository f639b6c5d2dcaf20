"""Distributed global rank / NTILE / cumsum (operators/rank.py):
exactness vs the naive single-partition window, and the plan contract
that no catalog entry sorts a base-table-sized frame on one partition.

Reference parity: the reference delegates ORDER BY / NTILE to DuckDB
(dataops/app/queries.py); rank.py is the Spark-native replacement that
keeps the total-order computation distributed.
"""

from __future__ import annotations

from pyspark.sql import Window

from de4ml_spark.planaudit import final_plan
from pyspark.sql import functions as F

from de4ml_spark.operators.rank import (
    global_rank_and_total,
    with_global_cumsum,
    with_global_ntile,
    with_global_rank,
    with_grouped_rank,
)


def _toy(spark, n=997):
    # adversarial: heavy value ties (v has ~20 distinct), unique id
    return spark.range(n).selectExpr(
        "id", "CAST(id % 20 AS BIGINT) AS v", "CAST(id % 7 AS STRING) AS g"
    )


def test_global_rank_matches_window(spark):
    df = _toy(spark)
    got = {
        r["id"]: r["rk"]
        for r in with_global_rank(
            df, ["v", "id"], out_col="rk", num_partitions=8
        ).collect()
    }
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


def test_global_rank_and_total(spark):
    df = _toy(spark, 123)
    ranked, total = global_rank_and_total(
        df, ["v", "id"], out_col="rk", num_partitions=5
    )
    assert total == 123
    rks = sorted(r["rk"] for r in ranked.collect())
    assert rks == list(range(1, 124))


def test_grouped_rank_matches_window(spark):
    df = _toy(spark)
    got = {
        r["id"]: r["rk"]
        for r in with_grouped_rank(
            df, ["g"], ["v", "id"], out_col="rk", num_partitions=8
        ).collect()
    }
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("g").orderBy("v", "id")
            ),
        ).collect()
    }
    assert got == want


def test_global_cumsum_matches_window(spark):
    df = _toy(spark)
    got = {
        r["id"]: r["cs"]
        for r in with_global_cumsum(
            df,
            [F.desc("v"), F.col("id")],
            "v",
            out_col="cs",
            num_partitions=8,
        ).collect()
    }
    w = Window.orderBy(F.desc("v"), F.col("id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        r["id"]: r["cs"]
        for r in df.withColumn("cs", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_global_ntile_matches_window(spark):
    # 997 rows / 5 tiles: 997 = 5*199 + 2 -> two tiles of 200, three
    # of 199 — exercises the uneven allocation
    df = _toy(spark)
    for k in (5, 7):
        got = {
            r["id"]: r["nt"]
            for r in with_global_ntile(
                df, ["v", "id"], k, "nt", num_partitions=8
            ).collect()
        }
        want = {
            r["id"]: r["nt"]
            for r in df.withColumn(
                "nt", F.ntile(k).over(Window.orderBy("v", "id"))
            ).collect()
        }
        assert got == want


def test_global_ntile_fewer_rows_than_tiles(spark):
    df = spark.range(3).selectExpr("id", "id AS v")
    got = sorted(
        r["nt"]
        for r in with_global_ntile(
            df, ["v", "id"], 10, "nt", num_partitions=4
        ).collect()
    )
    assert got == [1, 2, 3]


def test_rank_ops_plan_is_distributed(spark):
    # the whole point: the window must be partitioned by the range
    # partition id, never preceded by an Exchange SinglePartition
    df = _toy(spark)
    ranked = with_global_rank(df, ["v", "id"], "rk", num_partitions=8)
    plan = final_plan(ranked)
    assert _single_partition_windows(plan) == []


def _single_partition_windows(plan: str) -> list[int]:
    """Line numbers of Window nodes whose immediate child chain hits
    an Exchange SinglePartition — i.e. single-partition sorts."""
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "Window [" not in line:
            continue
        for j in range(i + 1, min(i + 4, len(lines))):
            if "Exchange SinglePartition" in lines[j]:
                bad.append(i)
                break
            if "Window [" in lines[j] or "Join" in lines[j]:
                break
    return bad


GLOBAL_ORDER_ENTRIES = [
    # every catalog entry that computes a global total-order statistic
    # over a frame that scales with the corpus — each must use the
    # distributed rank/cumsum recipe, never a one-partition sort
    "quantile_normalize_docs",
    "rfm_segments_customers",
    "pareto_revenue_parts",
    "gini_revenue_parts",
    # round-9 additions on the same recipe
    "spearman_quantity_price",
    "lift_deciles_events",
    "runs_test_value",
    "hurst_value_events",
]


def test_no_single_partition_sort_in_global_order_entries(spark, sf_dir):
    from de4ml_spark.queries import catalog

    qs = catalog.queries()
    for name in GLOBAL_ORDER_ENTRIES:
        df = qs[name](spark, sf_dir)
        plan = final_plan(df)
        assert _single_partition_windows(plan) == [], name


def test_pair_membership_join_is_hash_not_bnl(spark, sf_dir):
    # mann_whitney / emd: the histogram fan-out must be an equi-join
    # (BroadcastHashJoin) on event_type; the only nested loop allowed
    # is the tiny types x types pair generator and 1-row scalar
    # broadcasts — the histogram-sized side must never ride a BNL
    from de4ml_spark.queries.sketchq import emd_value_types
    from de4ml_spark.queries.statq import mann_whitney_value

    for fn in (mann_whitney_value, emd_value_types):
        df = fn(spark, sf_dir)
        plan = final_plan(df)
        assert "BroadcastHashJoin" in plan
        # the pair generator cross-join is the single permitted BNL
        assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_global_cumsum_double_offsets_exact(spark):
    # ADVICE r8: offsets used to truncate through int(); a double
    # value column must carry double offsets (0.5 steps survive)
    df = spark.range(200).selectExpr(
        "id", "CAST(id % 9 AS BIGINT) AS v", "0.5D AS half"
    )
    got = {
        r["id"]: r["cs"]
        for r in with_global_cumsum(
            df, ["v", "id"], "half", out_col="cs", num_partitions=8
        ).collect()
    }
    w = (
        Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["id"]: r["cs"]
        for r in df.withColumn("cs", F.sum("half").over(w)).collect()
    }
    assert got == want


def test_global_cumsum_decimal_offsets_exact(spark):
    df = spark.range(150).selectExpr(
        "id",
        "CAST(id % 11 AS BIGINT) AS v",
        "CAST(1.25 AS DECIMAL(10,2)) AS amt",
    )
    got = {
        r["id"]: r["cs"]
        for r in with_global_cumsum(
            df, ["v", "id"], "amt", out_col="cs", num_partitions=6
        ).collect()
    }
    w = (
        Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["id"]: r["cs"]
        for r in df.withColumn("cs", F.sum("amt").over(w)).collect()
    }
    assert got == want


def test_grouped_rank_keeps_null_groups(spark):
    # ADVICE r8: the offset join must be null-safe — NULL group keys
    # form their own rank group exactly like Window.partitionBy
    df = spark.range(90).selectExpr(
        "id",
        "CAST(id % 13 AS BIGINT) AS v",
        "CASE WHEN id % 4 = 0 THEN NULL"
        " ELSE CAST(id % 3 AS STRING) END AS g",
    )
    res = with_grouped_rank(
        df, ["g"], ["v", "id"], out_col="rk", num_partitions=7
    )
    assert res.count() == 90  # no dropped rows
    got = {r["id"]: r["rk"] for r in res.collect()}
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("g").orderBy("v", "id")),
        ).collect()
    }
    assert got == want


def test_rank_intermediates_release_on_drain(spark):
    from de4ml_spark.cache import drain_deferred

    drain_deferred()  # clear any registrations from earlier tests
    df = _toy(spark, 300)
    with_global_rank(df, ["v", "id"], out_col="rk").collect()
    assert drain_deferred() >= 1
    assert drain_deferred() == 0
