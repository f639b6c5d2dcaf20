"""Round-7 catalog entries: invariants BEYOND the DuckDB value-hash gate
(which verifies cross-engine equality, not algorithmic correctness) —
HLL register mergeability and accuracy, Bloom no-false-negatives, M4
extreme preservation, linear-interpolation exactness, chi-square
consistency with a driver-side recompute.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_hll_registers_merge_and_estimate(spark):
    """HLL registers built on two disjoint halves of the user space must
    max-combine to the registers of the whole — the sketch-algebra
    property that makes the operator shard-safe at 100 TB — and the
    estimate must land within the ~1.04/sqrt(m) relative-error band."""
    from de4ml_spark.queries.sketchq import (
        HLL_M,
        _hll_rho_sql,
        hll_distinct_users,
    )
    from de4ml_spark.operators.portable_hash import phash_spark_sql
    from de4ml_spark.session import load_table

    ev = load_table(spark, SF, "events")

    def regs(df):
        rows = (
            df.select("user_id")
            .distinct()
            .selectExpr(
                f"{phash_spark_sql('CAST(user_id AS STRING)', 58)} AS h"
            )
            .selectExpr(
                f"h % {HLL_M} AS bucket",
                f"{_hll_rho_sql(f'(h DIV {HLL_M})', 'spark')} AS rho",
            )
            .groupBy("bucket")
            .agg(F.max("rho").alias("m_reg"))
            .collect()
        )
        return {r["bucket"]: r["m_reg"] for r in rows}

    lo = regs(ev.filter(F.col("user_id") % 2 == 0))
    hi = regs(ev.filter(F.col("user_id") % 2 == 1))
    whole = regs(ev)
    merged = {
        b: max(lo.get(b, 0), hi.get(b, 0)) for b in set(lo) | set(hi)
    }
    assert merged == whole

    out = {
        r["event_type"]: r
        for r in hll_distinct_users(spark, SF).collect()
    }
    for r in out.values():
        rel = abs(r["hll_est"] - r["exact_distinct"]) / max(
            r["exact_distinct"], 1
        )
        # 1.04/sqrt(64) ~ 0.13 std error; allow 3 sigma
        assert rel < 3 * 1.04 / math.sqrt(64), (r, rel)


def test_bloom_no_false_negatives(spark):
    """Every benchmark doc probes its own shingles against the filter it
    built — containment must be 100% (Bloom filters cannot false-
    negative); corpus flag counts must dominate the exact screen's
    (false positives only overcount)."""
    from de4ml_spark.queries.textq3 import (
        N_BENCH,
        bloom_decontaminate_docs,
        decontaminate_fraction_docs,
    )

    rows = {
        r["doc_id"]: r
        for r in bloom_decontaminate_docs(spark, SF).collect()
    }
    for doc_id, r in rows.items():
        if doc_id < N_BENCH:
            assert r["n_hits"] == r["n_shingles"], r
            assert r["flagged"]
    exact = {
        r["doc_id"]: r for r in decontaminate_fraction_docs(spark, SF).collect()
    }
    for doc_id, e in exact.items():
        if doc_id in rows and "n_overlap" in e.asDict():
            assert rows[doc_id]["n_hits"] >= e["n_overlap"]


def test_m4_preserves_extremes(spark):
    """Per bucket the four retained points must include the bucket's
    true min/max values, and first/last must respect event-time order."""
    from de4ml_spark.queries.tsq2 import (
        M4_WIDTH_US,
        m4_downsample_value,
    )
    from de4ml_spark.session import load_table

    out = {r["bucket"]: r for r in m4_downsample_value(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    origin = "TIMESTAMP '2024-01-01 00:00:00'"
    check = (
        ev.selectExpr(
            "value",
            "ts",
            f"CAST((unix_micros(CAST(ts AS TIMESTAMP))"
            f" - unix_micros(CAST({origin} AS TIMESTAMP)))"
            f" DIV {M4_WIDTH_US} AS BIGINT) AS bucket",
        )
        .groupBy("bucket")
        .agg(
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.min("ts").alias("tmin"),
            F.max("ts").alias("tmax"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(check) == len(out)
    for r in check:
        o = out[r["bucket"]]
        assert o["v_min"] == r["vmin"] and o["v_max"] == r["vmax"]
        assert o["t_first"] == r["tmin"] and o["t_last"] == r["tmax"]
        assert o["n"] == r["n"]
        assert o["t_first"] <= o["t_last"]


def test_gapfill_interp_linearity(spark):
    """Observed rows reproduce their cent-exact value; interior gaps are
    the half-up-rounded linear blend of the two neighbours; days outside
    any bracketing pair stay NULL."""
    from de4ml_spark.queries.tsq2 import gapfill_interp_user_daily
    from de4ml_spark.session import load_table

    out = gapfill_interp_user_daily(spark, SF).collect()
    ev = load_table(spark, SF, "events")
    daily = {
        (r["user_id"], r["day"]): r["v_c"]
        for r in ev.filter(F.col("user_id") < 40)
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
            ).alias("v_c")
        )
        .collect()
    }
    by_user: dict = {}
    for (u, d), v in daily.items():
        by_user.setdefault(u, []).append((d, v))
    for rows in by_user.values():
        rows.sort()
    n_interp = 0
    for r in out:
        u, d = r["user_id"], r["day"]
        if r["observed"]:
            assert r["value_filled"] == daily[(u, d)] / 100.0
            continue
        obs = by_user[u]
        prev = max(((dd, v) for dd, v in obs if dd < d), default=None)
        nxt = min(((dd, v) for dd, v in obs if dd > d), default=None)
        if prev is None or nxt is None:
            assert r["value_filled"] is None
            continue
        n_interp += 1
        (pd_, pv), (nd, nv) = prev, nxt
        span = (nd - pd_).days
        num = pv * span + (nv - pv) * (d - pd_).days
        den = span * 100
        expect = ((2 * num * 10**6 + den) // (2 * den)) / 10**6
        assert r["value_filled"] == pytest.approx(expect, abs=0), (
            r,
            expect,
        )
    assert n_interp > 0  # the dataset must actually exercise gaps


def test_chi2_matches_driver_recompute(spark):
    from de4ml_spark.queries.profileq2 import chi2_ab_events
    from de4ml_spark.session import load_table

    row = chi2_ab_events(spark, SF).collect()[0]
    ev = load_table(spark, SF, "events")
    cells = {
        (r["v"], r["o"]): r["n"]
        for r in ev.filter(F.col("user_id").isNotNull())
        .groupBy(
            (F.col("user_id") % 2).alias("v"),
            F.col("event_type").alias("o"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n = sum(cells.values())
    rtot: dict = {}
    ctot: dict = {}
    for (v, o), c in cells.items():
        rtot[v] = rtot.get(v, 0) + c
        ctot[o] = ctot.get(o, 0) + c
    total_micro = 0
    for (v, o), obs in cells.items():
        num = (obs * n - rtot[v] * ctot[o]) ** 2
        den = n * rtot[v] * ctot[o]
        total_micro += (2 * num * 10**6 + den) // (2 * den)
    assert row["chi2_micro"] == total_micro
    assert row["n_cells"] == len(cells)
