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


@pytest.mark.sweep
def test_every_catalog_entry_survives_empty_tables(spark, tmp_path_factory):
    """The full-catalog degenerate sweep: EVERY entry must build and
    collect against zero-row tables without raising. At 100 TB a
    partition-pruned scan or a fresh landing zone routinely produces
    zero rows; an operator that throws there (ANSI DIVIDE_BY_ZERO on an
    empty denominator, a literal-embedding build step that assumes a
    non-empty probe set, a model fit on an empty sample) kills the whole
    job. Round-13 sweep found 8 such entries (knn_* literal/IVF paths,
    profile null-rate, fk coverage, minhash recall); this pins the
    invariant for all 374."""
    import duckdb

    d = tmp_path_factory.mktemp("empty_sf")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        con.execute(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
            f" LIMIT 0) TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    # events ships as INT64 nanos in the real testdata; mirror that so
    # load_table's nanos normalization path is the one exercised
    con.execute(
        "COPY (SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
        " user_id, event_type, value, props"
        f" FROM '/root/testdata/sf0.001/events.parquet' LIMIT 0)"
        f" TO '{d}/events.parquet' (FORMAT PARQUET)"
    )

    from de4ml_spark.queries import catalog

    failures = []
    for name, fn in catalog.queries().items():
        try:
            fn(spark, str(d)).collect()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {str(e).splitlines()[0][:90]}")
    assert not failures, f"{len(failures)} entries raised on empty input:\n" + "\n".join(failures)


@pytest.mark.sweep
def test_every_catalog_entry_survives_single_row_tables(
    spark, tmp_path_factory
):
    """The n = 1 boundary: every entry must tolerate one-row tables.
    This is where (n-1)-style variance denominators, single-class
    samples, and one-group designs go to zero — round-13 found 50
    entries that died with ANSI DIVIDE_BY_ZERO here (DuckDB's twin
    silently NULLs the same division, so the engines also diverged on
    degenerate input). All such denominators now carry NULLIF guards:
    the statistic degrades to NULL, identical on both engines."""
    import duckdb

    d = tmp_path_factory.mktemp("one_sf")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        con.execute(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
            f" LIMIT 1) TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(
        "COPY (SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
        " user_id, event_type, value, props"
        f" FROM '/root/testdata/sf0.001/events.parquet' LIMIT 1)"
        f" TO '{d}/events.parquet' (FORMAT PARQUET)"
    )

    from de4ml_spark.queries import catalog

    failures = []
    for name, fn in catalog.queries().items():
        try:
            fn(spark, str(d)).collect()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {str(e).splitlines()[0][:90]}")
    assert not failures, (
        f"{len(failures)} entries raised on 1-row input:\n"
        + "\n".join(failures)
    )


@pytest.mark.sweep
def test_every_catalog_entry_survives_all_null_values(
    spark, tmp_path_factory
):
    """Third degenerate boundary: a shard whose nullable columns are
    ENTIRELY NULL (value, props) — the shape a schema-evolved or
    partially-ingested partition produces. Statistics must skip to
    their empty/NULL degenerate forms, not abort (round-13 found the
    interarrival-burstiness sd hitting DIVIDE_BY_ZERO here via
    two-event types)."""
    import duckdb

    d = tmp_path_factory.mktemp("null_sf")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        con.execute(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
            f" LIMIT 5) TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(
        "COPY (SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
        " user_id, event_type, CAST(NULL AS DOUBLE) AS value,"
        " CAST(NULL AS VARCHAR) AS props"
        f" FROM '/root/testdata/sf0.001/events.parquet' LIMIT 5)"
        f" TO '{d}/events.parquet' (FORMAT PARQUET)"
    )

    from de4ml_spark.queries import catalog

    failures = []
    for name, fn in catalog.queries().items():
        try:
            fn(spark, str(d)).collect()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {str(e).splitlines()[0][:90]}")
    assert not failures, (
        f"{len(failures)} entries raised on all-NULL values:\n"
        + "\n".join(failures)
    )


@pytest.mark.sweep
def test_every_catalog_entry_survives_constant_tables(
    spark, tmp_path_factory
):
    """Fourth degenerate boundary: CONSTANT data (five copies of one
    row, distinct event ids) — zero variance with n > 1, the shape a
    stuck upstream producer emits. Round-13 found Spark 4's ANSI
    corr() aggregate itself raising here (DuckDB's returns NULL), a
    Mantel-Haenszel all-concordant denominator, and the participation
    ratio on a rank-one Gram matrix."""
    import duckdb

    d = tmp_path_factory.mktemp("const_sf")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW one AS SELECT * FROM"
            f" '/root/testdata/sf0.001/{t}.parquet' LIMIT 1"
        )
        con.execute(
            f"COPY (SELECT one.* FROM one, generate_series(1, 5))"
            f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(
        "COPY (SELECT gs.g AS event_id, CAST(epoch_ns(ts) AS BIGINT)"
        " AS ts, user_id, event_type, value, props"
        " FROM (SELECT * FROM"
        " '/root/testdata/sf0.001/events.parquet' LIMIT 1),"
        " (SELECT unnest(generate_series(1, 5)) AS g) gs)"
        f" TO '{d}/events.parquet' (FORMAT PARQUET)"
    )

    from de4ml_spark.queries import catalog

    failures = []
    for name, fn in catalog.queries().items():
        try:
            fn(spark, str(d)).collect()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {str(e).splitlines()[0][:90]}")
    assert not failures, (
        f"{len(failures)} entries raised on constant input:\n"
        + "\n".join(failures)
    )
