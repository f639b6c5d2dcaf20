"""Empty-input robustness: every reusable DataFrame-level builder must
return an EMPTY result (correct schema, no rows) on an empty source —
not raise. At 100 TB a partition-pruned read or a fresh landing zone
regularly produces zero rows, and an operator that throws on empty
kills the whole job."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def empty_events(spark):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )


def test_rolling_active_users_empty(spark, empty_events):
    from de4ml_spark.queries.tsq2 import rolling_active_users

    assert rolling_active_users(empty_events).collect() == []


def test_transition_matrix_empty(spark, empty_events):
    from de4ml_spark.queries.tsq2 import transition_matrix

    assert transition_matrix(empty_events).collect() == []


def test_incident_windows_empty(spark, empty_events):
    from de4ml_spark.queries.tsq2 import incident_windows

    assert incident_windows(empty_events).collect() == []


def test_throttle_empty(spark, empty_events):
    from de4ml_spark.operators.throttle import throttle

    assert throttle(empty_events, ["user_id", "event_type"]).collect() == []


def test_capped_sessions_empty(spark, empty_events):
    from de4ml_spark.operators.sessions import capped_sessions

    assert capped_sessions(empty_events).collect() == []


def test_quota_admission_empty(spark, empty_events):
    from de4ml_spark.operators.quota import quota_admission

    assert quota_admission(empty_events).collect() == []


def test_dedup_builders_empty(spark):
    from pyspark.sql import functions as F

    from de4ml_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    empty_docs = spark.createDataFrame(
        [], "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    pairs = ngram_jaccard_pairs(empty_docs, threshold=0.8, n=3)
    assert pairs.collect() == []
    assert connected_components(
        pairs.select("id_a", "id_b"), empty_docs, id_col="doc_id"
    ).collect() == []


def test_single_row_inputs(spark):
    """One-row sources: the recursive scans and WAU must emit exactly one
    sensible row (the other degenerate boundary)."""
    from pyspark.sql import functions as F

    from de4ml_spark.operators.quota import quota_admission
    from de4ml_spark.operators.sessions import capped_sessions
    from de4ml_spark.operators.throttle import throttle
    from de4ml_spark.queries.tsq2 import rolling_active_users

    one = spark.createDataFrame(
        [(1, "2024-01-05 10:00:00", 7, "click", 5.0, "{}")],
        "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert [r["event_id"] for r in throttle(one, ["user_id", "event_type"]).collect()] == [1]
    s = capped_sessions(one).collect()
    assert len(s) == 1 and s[0]["n_events"] == 1
    q = quota_admission(one).collect()
    assert len(q) == 1 and (q[0]["n_accepted"], q[0]["consumed_c"]) == (1, 500)
    w = rolling_active_users(one).collect()
    assert len(w) == 1 and w[0]["active_users_7d"] == 1
