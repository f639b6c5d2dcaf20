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
@pytest.mark.parametrize(
    "kind",
    ["empty", "one", "null", "const", "oneclass", "negative",
     "emptytext", "unicode", "nonfinite", "ties", "badjson",
     "epochs", "embnan", "nullkeys", "nulldocs", "nulltpch",
     "nullepochs", "nonfinone", "mixed", "chaos",
     "emptyevents", "emptydocs",
     "missingcol", "extracol", "widened", "driftmix", "driftcorrupt",
     "driftemb"],
)
def test_catalog_degenerate_cross_engine_parity(
    spark, tmp_path_factory, kind
):
    """Full-catalog degenerate sweep, upgraded (round 14) from
    no-abort to CROSS-ENGINE PARITY: every oracle-backed entry (all
    374) runs on BOTH engines against the same degenerate tables and
    must agree on rows, columns, types, and values — with NaN distinct
    from NULL, the divergence class the hash gate never sees at real
    SF (an unguarded Spark 0.0/0.0 = NaN where DuckDB's division
    returns NULL). Shapes:

    - empty: zero-row tables (a partition-pruned scan / fresh landing
      zone). Round-13 no-abort sweep found 8 raisers; the round-14
      parity pass found 9 silent divergences (ROLLUP/CUBE grand-total
      rows, LIMIT-1 vs MAX(struct) shapes, a DuckDB sqrt(negative)
      abort in runs_updown) — all fixed to the empty-in/empty-out
      convention.
    - one: the n = 1 boundary ((n-1) variance denominators, one-class
      samples; round-13 fixed 50 DIVIDE_BY_ZERO aborts here) — parity
      additionally caught poisson_bootstrap's NULL-mean reps entering
      ROW_NUMBER, where Spark sorts NULLs first and DuckDB last.
    - null: value/props entirely NULL (schema-evolved shard) — parity
      caught value_quartiles emitting NULL-stat rows on one engine
      only.
    - const: five copies of one row, DISTINCT primary keys (event_id/
      doc_id/vec_id), zero variance with n > 1 — parity caught the
      max_by/arg_max tie-break divergence in latest_event_per_user.

    - oneclass: a 5-row shard with NO clicks — empties one side of
      every click-vs-purchase two-sample entry; the first run found 15
      divergences (pair-existence asymmetry between the shared pair
      frame and the oracle byval CTEs, plus 3 ANSI aborts), all fixed.
    - negative: every value negated (refund/chargeback shard), both
      classes present — caught quota_admission's MAX(total) oracle
      overshooting the non-monotone running total and 4 small-sample
      zero-variance ANSI aborts (yuen, brunner_munzel,
      fligner_policello, ccf_daily_lags), all fixed.

    - emptytext: empty / whitespace-only / single-char documents (a
      scraped corpus routinely produces these) — caught unanimous-rater
      cochran_q and one-token simpson_lambda ANSI aborts, both fixed.

    - unicode: CJK / accents / emoji / RTL / combining-mark documents
      — pins UTF-8 parity of the portable md5 hash, length()/split(),
      and every text entry (clean on first run).

    - nonfinite: NaN / +Inf / -Inf landed in events.value (IEEE
      specials round-trip through parquet; at 100 TB some shard WILL
      carry an upstream 0.0/0.0). First run: 129 failures — fixed
      centrally by the load_table finite-guard (non-finite -> NULL at
      ingest, mirrored in session.duckdb_view_sql) plus packing every
      nullable arg_max/arg_min oracle payload as arg_max([x], k)[1]
      (DuckDB skips NULL args; Spark max_by is row-faithful — the
      oracle was reporting an older row's value under the newest ts).

    - ties: every value identical across 20 rows, both classes, with
      distinct keys/timestamps — pins rank/percentile/median
      interpolation and zero-POOLED-variance denominators the const
      shape (single class) cannot reach. First run found 6 ANSI
      aborts (welch t, ansari-bradley z, anderson-darling full-span
      group, dunn tie-correction cancelling the variance exactly,
      cohen's d pooled sd, MCC with tp=fp=0), all fixed to NULL
      parity.

    - badjson: malformed / wrong-typed / empty props JSON (a scraped
      or schema-evolved producer) — caught DuckDB's ->> raising on
      malformed input and its VARCHAR cast ROUNDING '1.5' -> 2 where
      Spark's PERMISSIVE from_json NULLs both; the oracle now guards
      with json_valid + json_type + TRY_CAST.

    - epochs: timestamps at the 1970 epoch boundary and in 2100 (a
      zeroed/corrupted producer clock) — caught Spark's INT unix_date
      day-index overflowing in x*x once the span passes ~46341 days
      (DuckDB's date_diff is BIGINT), and an all-tied cox-stuart
      m_pairs = 0 abort; also pins that calendar-spine entries stay
      bounded when one bad row spans 80 years.

    - embnan: NaN/+-Inf elements inside embedding vectors — first run
      crashed 4 driver-side kNN literal paths ('NoneType' not
      iterable) and diverged 4 count/centroid entries; fixed
      centrally by load_table's whole-vector finite FILTER (a corrupt
      vector reads as MISSING on both engines — one NaN coordinate
      poisons every dot product — mirrored in
      session.duckdb_view_sql), zero per-entry edits.

    - nullkeys: NULL user_id / event_type on some rows (an anonymous
      or redacted producer). Both engines group NULL keys together
      and never join-match them — first run caught the recursive-CTE
      oracles (throttle, capped sessions, quota) dropping the
      NULL-key group's recursion through plain equi-joins (fixed with
      IS NOT DISTINCT FROM), a NULL outcome level zeroing chi2's
      expected-count denominator, DuckDB string_agg returning NULL
      where Spark array_join yields '' for an all-NULL-symbol user,
      and the IQR oracle's inner join dropping the NULL-type group
      Spark's left join kept.

    - nulldocs: NULL text/lang/source document fields (a partially-
      ingested crawl batch; emptytext covered '' — NULL is the other
      arm). First run: 9 divergences in two classes. The rater-
      agreement family (kappa, cochran q, mcnemar, gwet AC1,
      krippendorff) derived flags with Spark CAST(cond AS BIGINT),
      which keeps NULL where the oracle's CASE..ELSE 0 fails the
      rule — now CASE on both engines (missing doc fails the quality
      rule). Chunkers/scorers/payload entries (chunk, cdc_chunk,
      quality_rank, multimodal) now filter NULL text on both engines
      (no chunks/score/payload for a missing doc).

    - nulltpch: NULL lineitem measures / part key / returnflag /
      shipdate and NULL orders custkey/totalprice — the relational
      tier's arm. First run: 5 divergences, four of them the
      NULL-in-rank-order class (Spark sorts NULLs FIRST ascending,
      DuckDB LAST): price deciles, RFM money quintiles, the Gini
      Lorenz rank, and blomqvist's median windows now exclude or
      COALESCE missing measures identically on both engines; the
      negative sampler also dropped its phantom NULL-custkey user
      (Spark CONCAT(NULL) is NULL, DuckDB CONCAT skips NULLs — the
      seeded hash walk diverged).

    Round-15 COMPOSED shapes (corruptions co-occurring in one shard,
    the realistic 100 TB case — VERDICT r14 #5):

    - nullepochs: NULL user_id/event_type rows INSIDE a clock-skewed
      shard (one row is both NULL-keyed and at the 1970 boundary) —
      the NULL-key group semantics and far-calendar date math must
      hold simultaneously. First run: 2 divergences neither parent
      shape could reach — weibull's fit denominator hits exactly zero
      when the surviving users collapse to ONE distinct duration
      point (Spark ANSI abort vs DuckDB NULL; now NULLIF on both),
      and mahalanobis' SUM(CAST(event_type='click' AS BIGINT))
      returns NULL for a day whose only row is NULL-typed — latent in
      the plain nullkeys shape because NULL-typed rows always shared
      days with typed rows; the clock skew isolates one on its own
      day (now CASE..ELSE 0 like the oracle; granger carried the same
      latent pattern and got the same fix).
    - nonfinone: a corrupt-float shard that also empties one class
      (no clicks, NaN/±Inf in the surviving class) — the two-sample
      battery must reach its empty-side convention AFTER the finite
      guard, identically on both engines (clean on first run: the
      guard composes with the oneclass conventions).
    - mixed: one corruption kind PER TABLE at once (nonfinite events,
      nulldocs documents, embnan embeddings, nulltpch lineitem/
      orders) — the realistic case; clean on first run (per-table
      guards don't interfere across tables).
    - chaos: `mixed` with the events arm escalated to ALL FOUR
      event-level corruptions stacked in one table (clock skew, NULL
      keys, non-finite values, malformed props — different cycle
      lengths so one row carries several at once). Clean on first
      run: the per-axis guards compose within a single row.

    Round-15 ASYMMETRIC-EMPTY shapes — one table family empty while
    the rest stay populated (a fresh landing zone / unavailable
    upstream; the all-empty shape cannot reach the
    populated-joins-empty paths):

    - emptyevents: zero-row events, everything else populated.
    - emptydocs: zero-row documents AND embeddings, relational/event
      tables populated.

    Both clean on first run — the round-13/14 empty-in/empty-out
    conventions generalize to one-sided emptiness.

    Round-16 SCHEMA-DRIFT shapes (VERDICT r15 #2) — events and
    documents become DIRECTORIES mid-migration: one canonical-schema
    file plus one drifted file. Pins load_table's declared-manifest
    scan (session.TABLE_SCHEMAS) against the oracle's
    read_parquet(union_by_name) glob — SURVEY §1.3's additive
    schema-evolution contract as a parity target:

    - missingcol: the drifted file predates a migration (events
      without props, documents without source) — old rows must read
      NULL-FILLED on both engines, never dropped or erroring.
    - extracol: the drifted file carries an unknown column
      (ingest_shard / crawl_batch) — both engines must DROP it (the
      manifest defines the reader contract; Spark's declared schema
      and the enumerated oracle view both project it away).
    - widened: the drifted file stores a narrower physical type
      (user_id / n_chars as INT32 under a BIGINT manifest) — both
      engines must upcast (Spark 4.x parquet type widening under the
      declared schema; DuckDB union_by_name promotion). Note
      mergeSchema would hard-fail here ("Failed to merge incompatible
      data types int and bigint") — the manifest scan is the only
      strategy that survives a widened migration.

    - driftmix: one drift kind PER TABLE in the same shard (a
      migration rolling through the lake table-by-table): events
      missing props, documents with an extra column, lineitem with
      INT32 l_suppkey, orders missing o_orderpriority — the last two
      reach the relational tier the single shapes don't (NULL
      o_orderpriority flows through the priority CASE/group paths).

    - driftcorrupt: the pre-migration events file (no props) is ALSO
      corrupt — clock-skewed timestamps, NULL keys, and non-finite
      values with co-prime cycles (the chaos discipline) — pinning
      that the manifest null-fill composes with every ingest guard
      inside the same rows.

    - driftemb: the embeddings table as a THREE-file directory
      (canonical + missing-label + INT32 vec_id). First run found 1
      divergence no earlier shape reached: cluster_purity's majority
      tie-break ordered by nullable label — Spark ROW_NUMBER sorts
      NULLs FIRST ascending where DuckDB sorts them LAST, so a
      null-filled label WON the majority on one engine only. Fixed
      with shared explicit NULLS LAST in both texts (a real label
      outranks NULL in a tie).

    The first five were clean on first run (the manifest scan and the
    union_by_name oracle view agree, and the null-filled rows reuse
    the NULL-semantics conventions the nulldocs/null shapes pinned);
    driftemb's find above is the round's one engine-paired fix.

    A raise on either engine also fails (the dupconst no-abort sweep
    below covers the out-of-contract duplicate-key shape)."""
    from tools.degenerate_parity import build_degenerate, run_parity

    d = tmp_path_factory.mktemp(f"degen_{kind}")
    build_degenerate(kind, str(d))
    fails = run_parity(spark, str(d))
    assert not fails, (
        f"{len(fails)} entries diverged on {kind} input:\n"
        + "\n".join(fails)
    )


@pytest.mark.sweep
def test_catalog_survives_duplicate_key_constant_shard(
    spark, tmp_path_factory
):
    """Out-of-contract shape: five rows sharing ONE doc_id/vec_id (a
    double-ingested shard that skipped the S11 validation tier). The
    doc-keyed dedup/text entries legitimately disagree with their
    oracles here (duplicate-key joins multiply differently across two
    independently-authored plans), so the pin is NO-ABORT only: every
    entry must still build and collect."""
    from de4ml_spark.queries import catalog
    from tools.degenerate_parity import build_degenerate

    d = tmp_path_factory.mktemp("degen_dupconst")
    build_degenerate("dupconst", str(d))
    failures = []
    for name, fn in catalog.queries().items():
        try:
            fn(spark, str(d)).collect()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {str(e).splitlines()[0][:90]}")
    assert not failures, (
        f"{len(failures)} entries raised on duplicate-key input:\n"
        + "\n".join(failures)
    )
