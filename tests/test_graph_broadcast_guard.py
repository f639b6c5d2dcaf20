"""The size-guarded broadcast hint on node-sized graph build sides
(VERDICT r17 #1): below the cap the hint pins the broadcast plan the
test SFs always took; above it the hint is dropped and the planner
falls back to a shuffled join. Results must be identical either way —
this suite forces the shuffled path (cap = 0 MB so the gate drops every
hint, plus autoBroadcastJoinThreshold = -1 so the planner cannot
re-choose a broadcast on its own) and pins row-for-row equality with
the default broadcast path for every gated operator.
"""

from __future__ import annotations

import os

import pytest

SF = "/root/testdata/sf0.001"

GATED = [
    "khop_reach_parts",
    "kcore_parts",
    "triangle_count_parts",
    "hyperanf_parts",
    "anf_closeness_parts",
]


def _rows(df):
    return sorted(
        tuple(r) for r in df.collect()
    )


@pytest.mark.parametrize("name", GATED)
def test_shuffled_fallback_matches_broadcast_path(spark, name):
    from de4ml_spark.queries import catalog

    qs = catalog.queries()
    expected = _rows(qs[name](spark, SF))

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    os.environ["SPARK_GRAFT_GRAPH_BC_CAP_MB"] = "0"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # evict the memoized prepared plan so the gated build actually
    # re-runs the builder under the changed gate/threshold
    catalog.evict(name, SF)
    try:
        got = _rows(qs[name](spark, SF))
    finally:
        del os.environ["SPARK_GRAFT_GRAPH_BC_CAP_MB"]
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        catalog.evict(name, SF)  # drop the shuffled-path plan too

    assert got == expected


def test_gate_drops_hint_above_cap(spark):
    """With cap=0 the gated frames carry no broadcast hint: the khop
    plan under autoBroadcastJoinThreshold=-1 must contain no broadcast
    join at the 1-hop-sets site (SortMergeJoin instead)."""
    from de4ml_spark.cache import no_release
    from de4ml_spark.queries import catalog

    qs = catalog.queries()
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    os.environ["SPARK_GRAFT_GRAPH_BC_CAP_MB"] = "0"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    catalog.evict("khop_reach_parts", SF)
    try:
        # no_release(): keep the interior plan visible (release_after
        # would hand back a checkpointed RDD scan with no joins in it)
        with no_release():
            df = qs["khop_reach_parts"](spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
    finally:
        del os.environ["SPARK_GRAFT_GRAPH_BC_CAP_MB"]
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        catalog.evict("khop_reach_parts", SF)
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
