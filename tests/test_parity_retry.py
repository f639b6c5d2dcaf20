"""Parity-sweep retry independence (VERDICT r14 #1, ADVICE r14).

The round-14 flake: an in-fleet local-mode race caches an empty
persisted/checkpointed block inside a memoized prepared plan; the old
serial re-check reused the memoized frame, so the corruption survived
the retry and `pytest tests/` went red on a non-bug. The fix has three
testable parts:

1. ``catalog.evict`` drops the memoized plan (and releases its blocks)
   so the next call REBUILDS from scratch.
2. ``run_parity`` calls evict before its serial re-run, downgrades a
   one-off in-fleet divergence that is clean on the fresh plan to a
   logged transient, and QUARANTINES an entry that flakes twice in one
   process (a retry loop must not be able to mask genuine
   nondeterminism forever).
3. LRU eviction and the bounded deferred list release storage instead
   of stranding persisted blocks.

All tests here are pure-Python (fake plans/sessions) — no Spark.
"""

from __future__ import annotations


class _FakePlan:
    def __init__(self, tag):
        self.tag = tag
        self.unpersisted = False

    def unpersist(self, blocking=False):
        self.unpersisted = True


class _FakeSession:
    pass


def _fresh_cache(catalog):
    saved = dict(catalog._PLAN_CACHE)
    catalog._PLAN_CACHE.clear()
    return saved


def _restore_cache(catalog, saved):
    catalog._PLAN_CACHE.clear()
    catalog._PLAN_CACHE.update(saved)


def test_evict_forces_rebuild_and_releases():
    from de4ml_spark.queries import catalog

    saved = _fresh_cache(catalog)
    try:
        built = []

        def fn(spark, sf_dir):
            plan = _FakePlan(f"build{len(built)}")
            built.append(plan)
            return plan

        wrapped = catalog._prepared("entry_x", fn)
        sess = _FakeSession()
        first = wrapped(sess, "/sf")
        assert wrapped(sess, "/sf") is first  # memoized
        assert len(built) == 1

        n = catalog.evict("entry_x", "/sf")
        assert n == 1
        assert first.unpersisted  # blocks released on evict
        second = wrapped(sess, "/sf")
        assert second is not first and len(built) == 2  # fresh plan

        # sf_dir-scoped: other dirs' plans survive
        wrapped(sess, "/sf2")
        assert catalog.evict("entry_x", "/sf") == 1
        assert catalog.evict("entry_x", "/sf") == 0
        assert catalog.evict("entry_x") == 1  # None = all dirs
    finally:
        _restore_cache(catalog, saved)


def test_lru_eviction_unpersists():
    from de4ml_spark.queries import catalog

    saved = _fresh_cache(catalog)
    saved_max = catalog._PLAN_CACHE_MAX
    catalog._PLAN_CACHE_MAX = 2
    try:
        plans = {}

        def mk(name):
            def fn(spark, sf_dir):
                plans[name] = _FakePlan(name)
                return plans[name]

            return fn

        sess = _FakeSession()
        for n in ("a", "b", "c"):
            catalog._prepared(n, mk(n))(sess, "/sf")
        assert plans["a"].unpersisted  # evicted AND released
        assert not plans["b"].unpersisted and not plans["c"].unpersisted
    finally:
        catalog._PLAN_CACHE_MAX = saved_max
        _restore_cache(catalog, saved)


def test_defer_release_bounded():
    from de4ml_spark import cache

    cache.drain_deferred()  # other tests may legitimately leave frames
    frames = [_FakePlan(i) for i in range(cache._DEFERRED_MAX + 5)]
    try:
        for f in frames:
            cache.defer_release(f)
        assert len(cache._DEFERRED) == cache._DEFERRED_MAX
        assert all(f.unpersisted for f in frames[:5])  # oldest released
        assert not frames[-1].unpersisted
    finally:
        cache.drain_deferred()


def test_events_oracle_view_single_definition():
    """ADVICE r14: the parity harness's events view must come from the
    ONE canonical definition in session.duckdb_view_sql — the nanos-ts
    variant differs only in the ts expression; the value finite-guard
    text is identical in both variants."""
    from de4ml_spark.session import (
        EVENTS_TS_FROM_NANOS,
        EVENTS_VALUE_GUARD_DUCKDB,
        duckdb_view_sql,
    )

    nanos = duckdb_view_sql(
        "events", "/x/events.parquet", events_ts=EVENTS_TS_FROM_NANOS
    )
    raw = duckdb_view_sql("events", "/x/events.parquet")
    assert "make_timestamp(ts // 1000) AS ts" in nanos
    assert EVENTS_VALUE_GUARD_DUCKDB in nanos
    assert EVENTS_VALUE_GUARD_DUCKDB in raw
    # identical apart from the ts expression
    assert nanos.replace(f"{EVENTS_TS_FROM_NANOS} AS ts", "ts AS ts") == raw


def test_view_sql_multi_file_explicit_and_auto(tmp_path):
    """ADVICE r16: the shard shape is an explicit caller choice, with
    auto-detection covering globs AND bare directory paths (the latter
    previously rendered footer-only single-file SQL silently)."""
    from de4ml_spark.session import duckdb_view_sql

    # glob path: auto-detected multi-file (established behavior)
    glob = duckdb_view_sql("region", "/x/region/*.parquet")
    assert "read_parquet('/x/region/*.parquet', union_by_name=true)" in glob
    # bare directory path: auto-detected multi-file, glob appended
    d = tmp_path / "region"
    d.mkdir()
    auto = duckdb_view_sql("region", str(d))
    # '**' glob (ADVICE r17): matches the flat shard exactly like the
    # old single-level glob AND nested/Hive-partitioned layouts
    assert f"read_parquet('{d}/**/*.parquet', union_by_name=true)" in auto
    # explicit override wins over the sniff in both directions
    forced = duckdb_view_sql("region", "/x/region", multi_file=True)
    assert "read_parquet('/x/region/**/*.parquet', union_by_name=true)" in forced
    single = duckdb_view_sql("region", "/x/region.parquet", multi_file=False)
    assert "read_parquet" not in single and "'/x/region.parquet'" in single


def test_table_columns_depth_aware_split():
    """ADVICE r16: DDL field split must ignore commas nested inside
    DECIMAL(p,s) / MAP<...> / STRUCT<...> type parameters."""
    from de4ml_spark import session
    from de4ml_spark.session import _split_top_level_fields, table_columns

    ddl = (
        "a DECIMAL(12,2), b MAP<STRING, INT>, "
        "c STRUCT<x: INT, y: ARRAY<DOUBLE>>, d STRING"
    )
    assert [f.split()[0] for f in _split_top_level_fields(ddl)] == [
        "a",
        "b",
        "c",
        "d",
    ]
    # every real manifest entry still yields its declared names
    assert table_columns("events") == [
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        "props",
    ]
    assert all(table_columns(t) for t in session.TABLE_SCHEMAS)


def _run_parity_scripted(monkeypatch, script):
    """Drive run_parity with a scripted _parity_one.

    ``script`` maps entry name -> list of results popped per call
    (first element = in-fleet verdict, next = serial retries).
    Returns (confirmed, evict_calls)."""
    import __spark_entry__ as entrymod
    from de4ml_spark.queries import catalog
    from tools import degenerate_parity as dp

    evict_calls = []
    monkeypatch.setattr(
        catalog, "evict", lambda name, sf_dir=None: evict_calls.append(
            (name, sf_dir)
        )
    )

    class _Con:
        def cursor(self):
            return None

    monkeypatch.setattr(dp, "oracle_con", lambda d: _Con())
    feed = {k: list(v) for k, v in script.items()}
    monkeypatch.setattr(
        dp, "_parity_one",
        lambda spark, d, name, fn, sql, cur: feed[name].pop(0),
    )
    monkeypatch.setattr(
        entrymod, "queries",
        lambda: {k: (lambda s, d: None) for k in script},
    )
    monkeypatch.setattr(
        entrymod, "oracle_sql", lambda: {k: "SELECT 1" for k in script}
    )
    confirmed = dp.run_parity(object(), "/degen")
    return confirmed, evict_calls


def test_run_parity_retry_is_independent_and_quarantines(monkeypatch):
    from tools import degenerate_parity as dp

    monkeypatch.setattr(dp, "_TRANSIENTS", {})

    # One-off in-fleet flake, clean on the fresh plan: transient (green),
    # but the retry MUST have evicted the memoized plan first.
    confirmed, evicts = _run_parity_scripted(
        monkeypatch, {"flaky_entry": ["flaky_entry: rowcount 0 vs 1", None]}
    )
    assert confirmed == []
    assert ("flaky_entry", "/degen") in evicts

    # Same entry flakes AGAIN in this process: quarantined as a failure.
    confirmed, _ = _run_parity_scripted(
        monkeypatch, {"flaky_entry": ["flaky_entry: rowcount 0 vs 1", None]}
    )
    assert len(confirmed) == 1 and "flaky" in confirmed[0]

    # A semantic divergence survives the fresh-plan retry: reported.
    monkeypatch.setattr(dp, "_TRANSIENTS", {})
    confirmed, evicts = _run_parity_scripted(
        monkeypatch,
        {"real_bug": ["real_bug: value divergence", "real_bug: value divergence"]},
    )
    assert confirmed == ["real_bug: value divergence"]
    assert ("real_bug", "/degen") in evicts
