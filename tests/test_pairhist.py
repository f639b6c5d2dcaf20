"""Pins for the shared pair-histogram frame (operators/pairhist.py) and
the plan-string stripper that its cross-entry cache made necessary
(VERDICT r10 #1 / #6, ADVICE r10)."""

from __future__ import annotations

from de4ml_spark.planaudit import final_plan, strip_initial_plans

SYNTHETIC_PLAN = """AdaptiveSparkPlan isFinalPlan=false
+- HashAggregate(keys=[type_a], functions=[sum(x)])
   +- InMemoryTableScan [type_a, x]
         +- InMemoryRelation [type_a, x], StorageLevel(memory)
               +- AdaptiveSparkPlan isFinalPlan=true
                  +- == Final Plan ==
                     *(5) BroadcastNestedLoopJoin BuildRight, Cross
                     :- *(4) HashAggregate(keys=[a])
                     +- BroadcastExchange
                  +- == Initial Plan ==
                     BroadcastNestedLoopJoin BuildRight, Cross
                     :- HashAggregate(keys=[a])
                     +- BroadcastExchange
   +- Exchange hashpartitioning(type_a, 32)"""


def test_strip_initial_plans_drops_only_the_initial_section():
    got = strip_initial_plans(SYNTHETIC_PLAN)
    # the duplicated cached-relation section is gone ...
    assert got.count("BroadcastNestedLoopJoin") == 1
    assert got.count("HashAggregate") == 2
    assert "== Initial Plan ==" not in got
    # ... but siblings/uncles AFTER the section survive
    assert "Exchange hashpartitioning(type_a, 32)" in got
    # and a marker-free plan passes through untouched
    plain = "HashAggregate\n+- Exchange\n   +- FileScan parquet"
    assert strip_initial_plans(plain) == plain


def test_two_sample_slice_degenerate_contract(spark, tmp_path):
    """ADVICE r10: when one side of the battery pair has no valued
    events, the data-derived pair never forms and the slice is EMPTY —
    the documented contract (NOT the old zero-filled one-sided rows).
    Deliberate: the full-frame consumers and their oracles both derive
    pairs from data, so they stay synchronized on the same input."""
    from de4ml_spark.operators.pairhist import two_sample_cums

    sf = str(tmp_path / "degenerate_sf")
    rows = [
        (1, 7, "click", 1.0),
        (2, 7, "click", 2.0),
        (3, 8, "purchase", None),  # purchase exists but value is NULL
        (4, 9, "view", 9.0),
    ]
    spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, event_type STRING,"
        " value DOUBLE",
    ).write.parquet(f"{sf}/events.parquet")
    assert two_sample_cums(spark, sf).count() == 0


def test_eviction_recomputes_same_results_and_plan(spark, sf_dir):
    """VERDICT r10 #4: LRU eviction unpersists a frame that consumer
    DataFrames may still reference. Pin the intended semantics: after
    eviction the consumer silently RECOMPUTES — identical rows,
    identical final-plan join shape — never a wrong answer or raise."""
    from de4ml_spark.operators import pairhist
    from de4ml_spark.queries.statq import mann_whitney_value

    df = mann_whitney_value(spark, sf_dir)
    before = sorted(map(tuple, df.collect()))
    assert before  # non-degenerate at sf0.001

    from de4ml_spark.session import _session_token

    key = (_session_token(spark), sf_dir)
    assert key in pairhist._CACHE
    pairhist._evict(key)  # simulate LRU pressure mid-flight
    try:
        after = sorted(map(tuple, df.collect()))  # SAME consumer handle
        assert after == before
        fresh = mann_whitney_value(spark, sf_dir)  # rebuilds the cache
        assert sorted(map(tuple, fresh.collect())) == before
        plan = final_plan(fresh)
        assert "BroadcastHashJoin" in plan
        assert plan.count("BroadcastNestedLoopJoin") <= 1
    finally:
        # leave the shared frame in place for later tests in the session
        pairhist.pair_value_histogram(spark, sf_dir)


def test_eviction_tolerates_dead_session_entries():
    """ADVICE r10: a cache entry whose SparkSession has stopped must
    evict without raising (unpersist on a dead JVM handle throws)."""
    from de4ml_spark.operators import pairhist

    class _DeadFrame:
        def unpersist(self, blocking=False):
            raise RuntimeError("JVM gone")

    pairhist._CACHE[(-1, "/nonexistent")] = _DeadFrame()
    pairhist._evict((-1, "/nonexistent"))  # must not raise
    assert (-1, "/nonexistent") not in pairhist._CACHE
