"""Recompute-test backfill for pre-round-9 statistics (VERDICT r12 #7):
independent pure-Python/from-the-definition reference implementations
for catalog entries whose only prior evidence was the cross-engine
oracle gate. The oracle proves Spark==DuckDB; these prove both equal
the FORMULA — the class of bug (shared wrong algebra in query + oracle
SQL) the round-12 recompute discipline caught four times.

Raw inputs come from DuckDB reads of the same parquet; all statistics
are recomputed with math.log / Decimal / integer arithmetic, never by
re-running either engine's SQL.
"""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"


def _con(sf_dir: str):
    from de4ml_spark.session import TABLES, duckdb_view_sql

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            + duckdb_view_sql(t, f"{sf_dir}/{t}.parquet")
        )
    return con


def _phash(s: str, bits: int = 59) -> int:
    """Python twin of operators/portable_hash.py phash_*_sql: low
    ``bits`` bits of the little-endian int of md5 digest bytes 8..15."""
    d = hashlib.md5(s.encode()).digest()
    nbytes = (bits + 7) // 8
    return int.from_bytes(d[8 : 8 + nbytes], "little") & ((1 << bits) - 1)


def _cents(v: float) -> int:
    """CAST(value AS DECIMAL(18,2)) * 100 — half-up at 2dp on the exact
    binary double, matching both engines' float->decimal cast."""
    return int(
        Decimal(v).quantize(Decimal("0.01"), ROUND_HALF_UP) * 100
    )


def _halfup_div(p: int, q: int, decimals: int = 6) -> float:
    """exact_round_div_sql twin: ROUND(p/q, decimals) half-up in pure
    integer arithmetic, final value the nearest double."""
    scale = 10**decimals
    return float((2 * p * scale + q) // (2 * q)) / scale


# ------------------------------------------------------------- KL drift


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_kl_drift_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.sketchq import KL_SPLIT_DAY, kl_drift_event_type

    con = _con(sf_dir)
    rows = con.sql(
        f"""SELECT event_type,
               COUNT(*) FILTER (WHERE date_part('day', ts) < {KL_SPLIT_DAY}),
               COUNT(*) FILTER (WHERE date_part('day', ts) >= {KL_SPLIT_DAY})
        FROM events GROUP BY 1"""
    ).fetchall()
    common = [(c1, c2) for _, c1, c2 in rows if c1 > 0 and c2 > 0]
    n1 = sum(c1 for c1, _ in common)
    n2 = sum(c2 for _, c2 in common)
    kl = sum(
        (c1 / n1) * math.log((c1 / n1) / (c2 / n2)) for c1, c2 in common
    )
    row = kl_drift_event_type(spark, sf_dir).collect()[0]
    assert row["n1"] == n1
    assert row["n2"] == n2
    # per-term micro-quantization + ~2ulp portable ln
    assert row["kl_r"] == pytest.approx(kl, abs=5e-6, rel=1e-4)


# ------------------------------------------------------------- entropy


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_entropy_by_source_matches_reference(spark, sf_dir):
    from collections import Counter

    from de4ml_spark.queries.sketchq import entropy_by_source

    con = _con(sf_dir)
    by_source: dict[str, Counter] = {}
    for source, text in con.sql(
        "SELECT source, text FROM documents"
    ).fetchall():
        by_source.setdefault(source, Counter()).update(text.split(" "))
    got = {r["source"]: r for r in entropy_by_source(spark, sf_dir).collect()}
    assert set(got) == set(by_source)
    for source, tf in by_source.items():
        t = sum(tf.values())
        h = sum((c / t) * math.log(t / c) for c in tf.values())
        assert got[source]["n_tokens"] == t
        assert got[source]["entropy_r"] == pytest.approx(
            h, abs=5e-6, rel=1e-4
        )


# ------------------------------------------------------------- Benford


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_benford_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.sketchq import benford_audit_totalprice

    con = _con(sf_dir)
    obs = {d: 0 for d in range(1, 10)}
    for (v,) in con.sql("SELECT o_totalprice FROM orders").fetchall():
        first = str(Decimal(v).quantize(Decimal("0.01"), ROUND_HALF_UP))[0]
        if "1" <= first <= "9":
            obs[int(first)] += 1
    n = sum(obs.values())
    chi2 = sum(
        (obs[d] - n * math.log(1 + 1 / d) / math.log(10)) ** 2
        / (n * math.log(1 + 1 / d) / math.log(10))
        for d in range(1, 10)
    )
    rows = benford_audit_totalprice(spark, sf_dir).collect()
    assert len(rows) == 9
    got = {r["digit"]: r for r in rows}
    for d in range(1, 10):
        assert got[d]["observed"] == obs[d]
    assert rows[0]["chi2_r"] == pytest.approx(chi2, rel=1e-4, abs=1e-4)


# ------------------------------------------------------------- chi2 A/B


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_chi2_ab_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.profileq2 import chi2_ab_events

    con = _con(sf_dir)
    cells: dict[tuple[int, str], int] = {}
    for v, o, c in con.sql(
        """SELECT user_id % 2, event_type, COUNT(*) FROM events
        WHERE user_id IS NOT NULL GROUP BY 1, 2"""
    ).fetchall():
        cells[(v, o)] = c
    variants = sorted({v for v, _ in cells})
    outcomes = sorted({o for _, o in cells})
    n = sum(cells.values())
    # exact integer micro-quantized per-cell terms — the entry's very
    # definition is the quantized sum, so the recompute is EXACT
    chi2_micro = 0
    for v in variants:
        r = sum(cells.get((v, o), 0) for o in outcomes)
        for o in outcomes:
            c = sum(cells.get((vv, o), 0) for vv in variants)
            obs = cells.get((v, o), 0)
            dev = obs * n - r * c
            den = n * r * c
            chi2_micro += (dev * dev * 2_000_000 + den) // (2 * den)
    row = chi2_ab_events(spark, sf_dir).collect()[0]
    assert row["n_cells"] == len(variants) * len(outcomes)
    assert row["dof"] == (len(variants) - 1) * (len(outcomes) - 1)
    assert row["chi2_micro"] == chi2_micro
    assert row["chi2_r"] == pytest.approx(chi2_micro / 1e6, rel=1e-12)


# ------------------------------------------------------------- MI


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_mutual_info_matches_reference(spark, sf_dir):
    from collections import Counter

    from de4ml_spark.queries.sketchq import mutual_info_events

    con = _con(sf_dir)
    joint = Counter()
    for x, y, c in con.sql(
        """SELECT event_type, date_part('hour', ts), COUNT(*)
        FROM events GROUP BY 1, 2"""
    ).fetchall():
        joint[(x, y)] = c
    n = sum(joint.values())
    nx = Counter()
    ny = Counter()
    for (x, y), c in joint.items():
        nx[x] += c
        ny[y] += c
    mi = sum(
        (c / n) * math.log(c * n / (nx[x] * ny[y]))
        for (x, y), c in joint.items()
    )
    row = mutual_info_events(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert row["mi_r"] == pytest.approx(mi, abs=5e-6, rel=1e-4)


# ------------------------------------------------------------- plus-4


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_plus4_ctr_bounds_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq import plus4_ctr_bounds

    con = _con(sf_dir)
    ref = {
        dec: (n, s)
        for dec, n, s in con.sql(
            """SELECT user_id % 10, COUNT(*),
                   SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            FROM events
            WHERE event_type IN ('click', 'view') AND user_id IS NOT NULL
            GROUP BY 1"""
        ).fetchall()
    }
    got = {r["decile"]: r for r in plus4_ctr_bounds(spark, sf_dir).collect()}
    assert set(got) == set(ref)
    for dec, (n, s) in ref.items():
        r = got[dec]
        assert r["n"] == n and r["s"] == s
        p = (s + 2) / (n + 4)
        sd = math.sqrt((s + 2) * (n + 2 - s) / (n + 4) ** 3)
        assert r["p_adj_r"] == pytest.approx(
            _halfup_div(s + 2, n + 4), rel=1e-12
        )
        assert r["lo"] == pytest.approx(p - 2.0 * sd, rel=1e-12)
        assert r["hi"] == pytest.approx(p + 2.0 * sd, rel=1e-12)


# ------------------------------------------------------------- KW H


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_kruskal_wallis_matches_reference(spark, sf_dir):
    from collections import Counter

    from de4ml_spark.queries.statq import kruskal_wallis_value

    con = _con(sf_dir)
    groups: dict[str, Counter] = {}
    for t, v in con.sql(
        """SELECT event_type, value FROM events
        WHERE value IS NOT NULL AND event_type IS NOT NULL"""
    ).fetchall():
        groups.setdefault(t, Counter())[_cents(v)] += 1
    pooled = Counter()
    for cnt in groups.values():
        pooled.update(cnt)
    n_tot = sum(pooled.values())
    # doubled midranks per distinct value (ties share the midrank)
    r2x = {}
    cum = 0
    for v in sorted(pooled):
        r2x[v] = 2 * cum + pooled[v] + 1
        cum += pooled[v]
    tie_sum = sum(c**3 - c for c in pooled.values())
    h12_exact = 0.0
    sum_q = 0  # the entry's DEFINITION: unit-quantized R_i^2/n_i terms
    ref_per_type = {}
    for t, cnt in groups.items():
        n_i = sum(cnt.values())
        r2x_sum = sum(c * r2x[v] for v, c in cnt.items())
        ref_per_type[t] = (n_i, r2x_sum)
        h12_exact += (r2x_sum / 2) ** 2 / n_i
        sum_q += (2 * r2x_sum * r2x_sum + 4 * n_i) // (8 * n_i)
    h_raw = 12.0 * float(sum_q) / (n_tot * (n_tot + 1)) - 3.0 * (n_tot + 1)
    h_textbook = (
        12.0 * h12_exact / (n_tot * (n_tot + 1)) - 3.0 * (n_tot + 1)
    )
    # the unit quantization moves H by at most ~12*0.5*k/(n(n+1))
    assert h_raw == pytest.approx(h_textbook, abs=1e-3)
    corr = 1.0 - float(tie_sum) / float(n_tot**3 - n_tot)
    got = {r["event_type"]: r for r in
           kruskal_wallis_value(spark, sf_dir).collect()}
    assert set(got) == set(ref_per_type)
    for t, (n_i, r2x_sum) in ref_per_type.items():
        assert got[t]["n_i"] == n_i
        assert got[t]["r2x_sum"] == r2x_sum
        assert got[t]["n_tot"] == n_tot
        assert got[t]["h_raw"] == pytest.approx(h_raw, rel=1e-6, abs=1e-6)
        assert got[t]["h_tie_r"] == pytest.approx(
            h_raw / corr, rel=1e-6, abs=1e-6
        )


# ------------------------------------------------------------- Fano


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_fano_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.tsq2 import fano_burstiness_events

    con = _con(sf_dir)
    daily: dict[str, list[int]] = {}
    for t, _, c in con.sql(
        """SELECT event_type, CAST(ts AS DATE), COUNT(*)
        FROM events GROUP BY 1, 2"""
    ).fetchall():
        daily.setdefault(t, []).append(c)
    got = {r["event_type"]: r for r in
           fano_burstiness_events(spark, sf_dir).collect()}
    assert set(got) == set(daily)
    for t, cs in daily.items():
        n, sc, scc = len(cs), sum(cs), sum(c * c for c in cs)
        assert got[t]["n"] == n
        assert got[t]["n_events"] == sc
        if n > 1 and sc > 0:
            fano = float(n) * float(n * scc - sc * sc) / float(
                (n - 1) * sc * n
            )
            assert got[t]["fano_r"] == pytest.approx(fano, rel=1e-9)


# ------------------------------------------------------------- Gini


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_gini_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.relational3 import gini_revenue_parts

    con = _con(sf_dir)
    rev: dict[int, int] = {}
    for pk, price, disc in con.sql(
        "SELECT l_partkey, l_extendedprice, l_discount FROM lineitem"
    ).fetchall():
        p = Decimal(price).quantize(Decimal("0.01"), ROUND_HALF_UP)
        d = Decimal(disc).quantize(Decimal("0.01"), ROUND_HALF_UP)
        # DECIMAL(18,2) * DECIMAL(*,2) product is exact at scale 4
        rev[pk] = rev.get(pk, 0) + int(p * (1 - d) * 10000)
    ranked = sorted(rev.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ranked)
    s = sum(v for _, v in ranked)
    wsum = sum((i + 1) * v for i, (_, v) in enumerate(ranked))
    top1 = sum(
        v for i, (_, v) in enumerate(ranked) if (i + 1) * 100 > n * 99
    )
    gini = float(2 * wsum - (n + 1) * s) / float(n * s)
    row = gini_revenue_parts(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert row["total_rev_e4"] == s
    assert row["top1_rev_e4"] == top1
    assert row["gini_r"] == pytest.approx(gini, rel=1e-9)
    assert row["top1_share_r"] == pytest.approx(top1 / s, rel=1e-12)


# ------------------------------------------------------------- Zipf


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_zipf_slope_matches_reference(spark, sf_dir):
    from collections import Counter

    from de4ml_spark.queries.textq4 import ZIPF_K, zipf_slope_docs

    con = _con(sf_dir)
    tf = Counter()
    for (text,) in con.sql("SELECT text FROM documents").fetchall():
        tf.update(text.split(" "))
    top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_K]
    xs = [math.log(i + 1) for i in range(len(top))]
    ys = [math.log(c) for _, c in top]
    n = len(top)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    row = zipf_slope_docs(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert row["zipf_slope"] == pytest.approx(slope, rel=1e-3, abs=1e-4)


# ----------------------------------------------------- survival helpers


def _spans(con) -> list[tuple[object, object]]:
    """Per-user (first_date, last_date) activity spans."""
    return con.sql(
        """SELECT MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)), user_id
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id"""
    ).fetchall()


def _risk_table(spans, group_of=None):
    """(t -> [n_risk, d_churn]) or per-group when ``group_of`` given:
    the right-censoring convention shared by the KM / NA / logrank
    entries — a user whose span reaches the horizon is censored."""
    hmax = max(d1 for _, d1, _ in spans)
    table: dict[int, list[int]] = {}
    for d0, d1, uid in spans:
        dur = (d1 - d0).days
        obs = (hmax - d0).days
        churned = 1 if d1 < hmax else 0
        g = group_of(uid) if group_of else 0
        for t in range(0, min(dur, obs) + 1):
            row = table.setdefault(t, [0, 0, 0, 0])
            row[0] += 1
            row[2] += 1 - g  # cohort-A at-risk (grp 0)
            if churned and dur == t:
                row[1] += 1
                row[3] += 1 - g
    return table


# ------------------------------------------------------- Kaplan-Meier


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_kaplan_meier_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq import kaplan_meier_retention

    con = _con(sf_dir)
    table = _risk_table(_spans(con))
    got = {r["t"]: r for r in kaplan_meier_retention(spark, sf_dir).collect()}
    assert set(got) == set(table)
    cum = 0.0
    for t in sorted(table):
        n_risk, d, _, _ = table[t]
        r = got[t]
        assert r["n_risk"] == n_risk
        assert r["d_churn"] == d
        if n_risk == d:  # terminal step: survival hits exactly 0
            assert r["negln_micro"] is None
            assert r["logsurv_r"] is None
        else:
            cum += math.log(n_risk / (n_risk - d))
            # per-step micro-quantization of the portable ln
            assert r["logsurv_r"] == pytest.approx(-cum, abs=5e-5)


# ------------------------------------------------------- Nelson-Aalen


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_nelson_aalen_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.mldataq6 import nelson_aalen_retention

    con = _con(sf_dir)
    spans = _spans(con)
    hmax = max(d1 for _, d1, _ in spans)
    weekly: dict[int, list[int]] = {}
    for d0, d1, _ in spans:
        iv = (d1 - d0).days // 7
        churned = 1 if d1 < hmax else 0
        for i in range(0, iv + 1):
            row = weekly.setdefault(i, [0, 0])
            row[0] += 1
            if churned and iv == i:
                row[1] += 1
    got = {r["i"]: r for r in nelson_aalen_retention(spark, sf_dir).collect()}
    assert set(got) == set(weekly)
    cum_n = 0
    for i in sorted(weekly):
        n_enter, d_i = weekly[i]
        cum_n += (2 * d_i * 1_000_000_000 + n_enter) // (2 * n_enter)
        r = got[i]
        assert r["n_enter"] == n_enter
        assert r["d_i"] == d_i
        assert r["na_cumhaz"] == pytest.approx(cum_n / 1e9, rel=1e-12)


# ------------------------------------------------------- log-rank


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_logrank_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq import logrank_retention_cohorts

    con = _con(sf_dir)
    table = _risk_table(
        _spans(con), group_of=lambda uid: _phash(f"lr:{uid}") % 2
    )
    n_steps = o_a = e_micro = v_micro = 0
    for t in sorted(table):
        n, d, na, da = table[t]
        if n <= 1 or d == 0:
            continue
        n_steps += 1
        o_a += da
        e_micro += (2 * d * na * 1_000_000 + n) // (2 * n)
        num = 2 * d * (n - d) * na * (n - na) * 1_000_000
        den = n * n * (n - 1)
        v_micro += (num + den) // (2 * den)
    row = logrank_retention_cohorts(spark, sf_dir).collect()[0]
    assert row["n_steps"] == n_steps
    assert row["o_a"] == o_a
    assert row["e_a_micro"] == e_micro
    assert row["var_micro"] == v_micro
    z = float(o_a * 1_000_000 - e_micro) / (1000.0 * math.sqrt(v_micro))
    assert row["z_r"] == pytest.approx(z, rel=1e-12)


# ------------------------------------------------------- Theil-Sen


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_theil_sen_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq import theil_sen_trend_events

    con = _con(sf_dir)
    daily: dict[str, dict] = {}
    for t, day, v in con.sql(
        """SELECT event_type, CAST(ts AS DATE), value FROM events"""
    ).fetchall():
        daily.setdefault(t, {}).setdefault(day, []).append(v)
    got = {r["event_type"]: r for r in
           theil_sen_trend_events(spark, sf_dir).collect()}
    for t, by_day in daily.items():
        vc = {
            d: sum(_cents(v) for v in vs if v is not None)
            for d, vs in by_day.items()
            if any(v is not None for v in vs)
        }
        days = sorted(vc)
        slopes = []
        for i in range(len(days)):
            for j in range(i + 1, len(days)):
                d1, d2 = days[i], days[j]
                slopes.append(
                    (
                        float(vc[d2] - vc[d1]) / float((d2 - d1).days),
                        d1,
                        d2,
                    )
                )
        slopes.sort()
        m = len(slopes)
        median = slopes[(m + 1) // 2 - 1][0]
        assert got[t]["n_pairs"] == m
        assert got[t]["median_slope_r"] == pytest.approx(median, rel=1e-12)


# ------------------------------------------------------- MASE


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_mase_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq import mase_seasonal_events

    con = _con(sf_dir)
    daily: dict[str, dict] = {}
    for t, day, v in con.sql(
        "SELECT event_type, CAST(ts AS DATE), value FROM events"
    ).fetchall():
        daily.setdefault(t, {}).setdefault(day, []).append(v)
    got = {r["event_type"]: r for r in
           mase_seasonal_events(spark, sf_dir).collect()}
    for t, by_day in daily.items():
        days = sorted(by_day)
        vc = {
            d: (
                sum(_cents(v) for v in by_day[d] if v is not None)
                if any(v is not None for v in by_day[d])
                else None
            )
            for d in days
        }
        n_days = err = naive = 0
        for idx in range(7, len(days)):
            day = days[idx]
            v1, d1 = vc[days[idx - 1]], days[idx - 1]
            v7, d7 = vc[days[idx - 7]], days[idx - 7]
            if (
                v1 is None
                or v7 is None
                or (day - d1).days != 1
                or (day - d7).days != 7
            ):
                continue
            n_days += 1
            v = vc[day]
            if v is not None:
                err += abs(v - v7)
                naive += abs(v - v1)
        if t not in got:
            assert n_days == 0
            continue
        r = got[t]
        assert r["n_days"] == n_days
        assert r["sum_abs_err_c"] == err
        assert r["sum_abs_naive_c"] == naive
        if naive:
            mase = float((err * 2_000_000 + naive) // (2 * naive)) / 1e6
            assert r["mase_r"] == pytest.approx(mase, rel=1e-12)


# ------------------------------------------------------- isotonic


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_isotonic_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq import ISO_BINS, isotonic_ctr_deciles

    con = _con(sf_dir)
    bins = {
        b: (n, s)
        for b, n, s in con.sql(
            f"""SELECT user_id % {ISO_BINS}, COUNT(*),
                   SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            FROM events
            WHERE event_type IN ('click', 'view') AND user_id IS NOT NULL
            GROUP BY 1"""
        ).fetchall()
    }
    order = sorted(bins)
    cn = {order[0] - 1: 0}
    cs = {order[0] - 1: 0}
    prev = order[0] - 1
    for b in order:
        cn[b] = cn[prev] + bins[b][0]
        cs[b] = cs[prev] + bins[b][1]
        prev = b

    def avg(j, k):
        j0 = order[order.index(j) - 1] if order.index(j) else order[0] - 1
        return float(cs[k] - cs[j0]) / float(cn[k] - cn[j0])

    got = {r["bin"]: r for r in isotonic_ctr_deciles(spark, sf_dir).collect()}
    assert set(got) == set(bins)
    for i in order:
        # minimax characterization: fit(i) = max_{j<=i} min_{k>=i} avg
        fit = max(
            min(avg(j, k) for k in order if k >= i)
            for j in order
            if j <= i
        )
        n, s = bins[i]
        assert got[i]["n"] == n and got[i]["s"] == s
        assert got[i]["raw_rate"] == pytest.approx(s / n, rel=1e-12)
        assert got[i]["iso_rate"] == pytest.approx(fit, rel=1e-12)
    # and the fit is actually monotone non-decreasing
    fits = [got[i]["iso_rate"] for i in order]
    assert all(a <= b + 1e-15 for a, b in zip(fits, fits[1:]))


# ------------------------------------------------------- calibration


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_calibration_bins_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.profileq2 import calibration_bins_events

    con = _con(sf_dir)
    agg: dict[int, list[int]] = {}
    for eid, et in con.sql(
        "SELECT event_id, event_type FROM events"
    ).fetchall():
        milli = _phash(str(eid), 40) % 1000
        row = agg.setdefault(milli // 100, [0, 0, 0])
        row[0] += 1
        row[1] += 1 if et == "click" else 0
        row[2] += milli
    got = {r["bin"]: r for r in
           calibration_bins_events(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for b, (n, pos, s_milli) in agg.items():
        r = got[b]
        assert r["n"] == n and r["n_pos"] == pos
        assert r["mean_pred_r"] == pytest.approx(
            _halfup_div(s_milli, n * 1000), rel=1e-12
        )
        assert r["frac_pos_r"] == pytest.approx(
            _halfup_div(pos, n), rel=1e-12
        )


# ------------------------------------------------- degree assortativity


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_degree_assortativity_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.graphq import degree_assortativity_parts

    con = _con(sf_dir)
    by_order: dict[int, set] = {}
    for ok, pk in con.sql(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall():
        by_order.setdefault(ok, set()).add(pk)
    edges = set()
    for parts in by_order.values():
        for u in parts:
            for v in parts:
                if u != v:
                    edges.add((u, v))
    deg: dict[int, int] = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    m = len(edges)
    sx = sum(deg[u] for u, _ in edges)
    sy = sum(deg[v] for _, v in edges)
    sxx = sum(deg[u] ** 2 for u, _ in edges)
    syy = sum(deg[v] ** 2 for _, v in edges)
    sxy = sum(deg[u] * deg[v] for u, v in edges)
    num = float(m * sxy - sx * sy)
    denx = float(m * sxx - sx * sx)
    deny = float(m * syy - sy * sy)
    r_ref = num / math.sqrt(denx * deny)
    row = degree_assortativity_parts(spark, sf_dir).collect()[0]
    assert row["m"] == m
    assert row["sx"] == sx
    assert row["sxy"] == sxy
    assert row["sxx"] == sxx
    assert row["assortativity_r"] == pytest.approx(r_ref, rel=1e-9)


# ----------------------------------------------------- daily helpers


def _daily_cents(con, per_type=True):
    """Per-(type,)day total value in cents via sum-then-quantize
    (SUM(DECIMAL(18,2)) * 100): each value half-up at 2dp, summed."""
    q = (
        """SELECT event_type, CAST(ts AS DATE), value FROM events"""
        if per_type
        else """SELECT 'all', CAST(ts AS DATE), value FROM events"""
    )
    out: dict = {}
    for t, day, v in con.sql(q).fetchall():
        out.setdefault(t, {}).setdefault(day, []).append(v)
    series = {}
    for t, by_day in out.items():
        series[t] = {
            d: (
                sum(_cents(v) for v in vs if v is not None)
                if any(v is not None for v in vs)
                else None
            )
            for d, vs in by_day.items()
        }
    return series


def _pearson_from_ints(n, sx, sy, sxx, syy, sxy):
    num = float(n * sxy - sx * sy)
    dx = float(n * sxx - sx * sx)
    dy = float(n * syy - sy * sy)
    if dx == 0.0 or dy == 0.0:
        return None
    return num / math.sqrt(dx * dy)


# ------------------------------------------------------------- ACF


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_acf_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.tsq2 import ACF_MAX_LAG, acf_value_events

    con = _con(sf_dir)
    series = _daily_cents(con)
    got = {
        (r["event_type"], r["lag"]): r
        for r in acf_value_events(spark, sf_dir).collect()
    }
    import datetime

    seen = set()
    for t, vc in series.items():
        for lag in range(1, ACF_MAX_LAG + 1):
            pairs = [
                (vc[d], vc[d + datetime.timedelta(days=lag)])
                for d in vc
                if d + datetime.timedelta(days=lag) in vc
                and vc[d] is not None
                and vc[d + datetime.timedelta(days=lag)] is not None
            ]
            if not pairs:
                continue
            seen.add((t, lag))
            n = len(pairs)
            sx = sum(x for x, _ in pairs)
            sy = sum(y for _, y in pairs)
            sxx = sum(x * x for x, _ in pairs)
            syy = sum(y * y for _, y in pairs)
            sxy = sum(x * y for x, y in pairs)
            r_ref = _pearson_from_ints(n, sx, sy, sxx, syy, sxy)
            row = got[(t, lag)]
            assert row["n"] == n
            if r_ref is None:
                assert row["acf_r"] is None
            else:
                assert row["acf_r"] == pytest.approx(r_ref, rel=1e-9)
    assert seen == set(got)


# ------------------------------------------------------------- Ljung-Box


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_ljung_box_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.tsq2 import (
        acf_value_events,
        ljung_box_value_events,
    )

    con = _con(sf_dir)
    n_days = dict(
        con.sql(
            """SELECT event_type, COUNT(DISTINCT CAST(ts AS DATE))
            FROM events GROUP BY 1"""
        ).fetchall()
    )
    # the ACF inputs are themselves recompute-pinned above; Q is the
    # quantized cross-lag sum of acf^2/(n-k)
    acf = {
        (r["event_type"], r["lag"]): r["acf_r"]
        for r in acf_value_events(spark, sf_dir).collect()
    }
    sums: dict[str, list[int]] = {}
    for (t, lag), r in acf.items():
        nano = (
            0
            if r is None
            else math.floor(r * r / (n_days[t] - lag) * 1e9 + 0.5)
        )
        row = sums.setdefault(t, [0, 0])
        row[0] += 1
        row[1] += nano
    got = {r["event_type"]: r for r in
           ljung_box_value_events(spark, sf_dir).collect()}
    assert set(got) == set(sums)
    for t, (n_lags, sum_nano) in sums.items():
        r = got[t]
        assert r["n_days"] == n_days[t]
        assert r["n_lags"] == n_lags
        assert r["sum_nano"] == sum_nano
        q_ref = float(n_days[t]) * float(n_days[t] + 2) * (sum_nano / 1e9)
        assert r["q_r"] == pytest.approx(q_ref, rel=1e-12)


# ------------------------------------------------------------- STL


def _stl_reference(con):
    """Integer-exact STL-lite: 7-row centered MA trend, day-of-week
    seasonal re-centered over the week, all in micro-cents."""
    series = _daily_cents(con, per_type=False)["all"]
    days = sorted(series)
    v = {d: series[d] for d in days}

    def shalf(num: int, den: int) -> int:  # signed half-up num/den
        if num >= 0:
            return (2 * num + den) // (2 * den)
        return -((2 * -num + den) // (2 * den))

    rows = {}
    for i in range(3, len(days) - 3):
        d = days[i]
        s7 = sum(v[days[i + k]] for k in range(-3, 4))
        trend = shalf(s7 * 10000, 7)
        rows[d] = [v[d], trend, v[d] * 10000 - trend]
    by_dow: dict[int, list[int]] = {}
    for d, (_, _, det) in rows.items():
        by_dow.setdefault(d.isoweekday() % 7, []).append(det)
    seas_raw = {
        dw: shalf(sum(dets), len(dets)) for dw, dets in by_dow.items()
    }
    center = shalf(sum(seas_raw.values()), len(seas_raw))
    out = {}
    for d, (vc, trend, _) in rows.items():
        seasonal = seas_raw[d.isoweekday() % 7] - center
        out[d] = (vc, trend, seasonal, vc * 10000 - trend - seasonal)
    return out


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_stl_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.tsq2 import stl_decompose_events

    con = _con(sf_dir)
    ref = _stl_reference(con)
    got = {r["day"]: r for r in stl_decompose_events(spark, sf_dir).collect()}
    assert set(got) == set(ref)
    for d, (vc, trend, seasonal, resid) in ref.items():
        r = got[d]
        assert r["v_c"] == vc
        assert r["trend_uc"] == trend
        assert r["seasonal_uc"] == seasonal
        assert r["resid_uc"] == resid
        assert r["trend_r"] == pytest.approx(trend / 1e6, rel=1e-12)


# ------------------------------------------------- seasonal strength


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_seasonal_strength_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.tsq2 import seasonal_strength_events

    con = _con(sf_dir)
    comp = list(_stl_reference(con).values())
    n = len(comp)

    def var_num_den(xs):
        s = sum(xs)
        ss = sum(x * x for x in xs)
        return float(n * ss - s * s)

    vr = var_num_den([r for _, _, _, r in comp])
    vsr = var_num_den([s + r for _, _, s, r in comp])
    vtr = var_num_den([t + r for _, t, _, r in comp])
    row = seasonal_strength_events(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert row["seasonal_strength_r"] == pytest.approx(
        max(0.0, 1.0 - vr / vsr), rel=1e-9
    )
    assert row["trend_strength_r"] == pytest.approx(
        max(0.0, 1.0 - vr / vtr), rel=1e-9
    )


# ------------------------------------------------------------- CCF


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_ccf_matches_reference(spark, sf_dir):
    import datetime

    from de4ml_spark.queries.tsq2 import CCF_MAX_LAG, ccf_view_click_events

    con = _con(sf_dir)
    series = _daily_cents(con)
    vx, vy = series.get("view", {}), series.get("click", {})
    got = {r["lag"]: r for r in ccf_view_click_events(spark, sf_dir).collect()}
    for lag in range(-CCF_MAX_LAG, CCF_MAX_LAG + 1):
        pairs = [
            (vx[d], vy[d + datetime.timedelta(days=lag)])
            for d in vx
            if d + datetime.timedelta(days=lag) in vy
            and vx[d] is not None
            and vy[d + datetime.timedelta(days=lag)] is not None
        ]
        if not pairs:
            assert lag not in got
            continue
        n = len(pairs)
        r_ref = _pearson_from_ints(
            n,
            sum(x for x, _ in pairs),
            sum(y for _, y in pairs),
            sum(x * x for x, _ in pairs),
            sum(y * y for _, y in pairs),
            sum(x * y for x, y in pairs),
        )
        assert got[lag]["n"] == n
        if r_ref is None:
            assert got[lag]["ccf_r"] is None
        else:
            assert got[lag]["ccf_r"] == pytest.approx(r_ref, rel=1e-9)


# ------------------------------------------------------------- OLS trend


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_trend_by_event_type_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.tsq2 import trend_by_event_type

    con = _con(sf_dir)
    # per-event quantize-then-sum (differs from sum-then-quantize only
    # in rounding; mirror the entry: SUM over per-event cents)
    daily: dict[str, dict] = {}
    for t, day, v in con.sql(
        "SELECT event_type, CAST(ts AS DATE), value FROM events"
    ).fetchall():
        daily.setdefault(t, {}).setdefault(day, []).append(v)
    got = {r["event_type"]: r for r in
           trend_by_event_type(spark, sf_dir).collect()}
    assert set(got) == set(daily)
    for t, by_day in daily.items():
        days = sorted(by_day)
        d_min = min(days)
        rows = [
            (
                (d - d_min).days,
                (
                    sum(_cents(v) for v in by_day[d] if v is not None)
                    if any(v is not None for v in by_day[d])
                    else None
                ),
            )
            for d in days
        ]
        n = len(rows)
        sx = sum(x for x, _ in rows)
        sxx = sum(x * x for x, _ in rows)
        live = [(x, y) for x, y in rows if y is not None]
        sy = sum(y for _, y in live)
        sxy = sum(x * y for x, y in live)
        syy = sum(y * y for _, y in live)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        r = got[t]
        assert r["n"] == n
        assert r["slope_num"] == num
        assert r["slope_den"] == den
        if den:
            assert r["slope_r"] == pytest.approx(
                float(num) / float(den), rel=1e-12
            )
            assert r["intercept_r"] == pytest.approx(
                float(sy * den - num * sx) / float(n * den), rel=1e-9
            )
            dy = float(n * syy - sy * sy)
            if dy:
                assert r["r2_r"] == pytest.approx(
                    float(num) * float(num) / (float(den) * dy), rel=1e-9
                )


# ------------------------------------------------------- rolling corr


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_rolling_corr_matches_reference(spark, sf_dir):
    import datetime

    from de4ml_spark.queries.tsq2 import (
        ROLL_CORR_DAYS,
        rolling_corr_view_click,
    )

    con = _con(sf_dir)
    counts = {
        d: (v, c)
        for d, v, c in con.sql(
            """SELECT CAST(ts AS DATE),
                   COUNT(*) FILTER (WHERE event_type = 'view'),
                   COUNT(*) FILTER (WHERE event_type = 'click')
            FROM events GROUP BY 1"""
        ).fetchall()
    }
    lo, hi = min(counts), max(counts)
    spine = [
        lo + datetime.timedelta(days=i) for i in range((hi - lo).days + 1)
    ]
    vs = [counts.get(d, (0, 0))[0] for d in spine]
    cs = [counts.get(d, (0, 0))[1] for d in spine]
    got = {r["day"]: r for r in
           rolling_corr_view_click(spark, sf_dir).collect()}
    assert set(got) == set(spine)
    for i, d in enumerate(spine):
        w = slice(max(0, i - ROLL_CORR_DAYS + 1), i + 1)
        wv, wc = vs[w], cs[w]
        n = len(wv)
        r = got[d]
        assert (r["v"], r["c"], r["n"]) == (vs[i], cs[i], n)
        num = float(
            n * sum(a * b for a, b in zip(wv, wc)) - sum(wv) * sum(wc)
        )
        den = math.sqrt(
            float(n * sum(a * a for a in wv) - sum(wv) ** 2)
            * float(n * sum(b * b for b in wc) - sum(wc) ** 2)
        )
        if den == 0.0:
            assert r["corr_r"] is None
        else:
            assert r["corr_r"] == pytest.approx(num / den, rel=1e-9)


# ------------------------------------------------------- changepoint


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_changepoint_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.tsq2 import changepoint_value_events

    con = _con(sf_dir)
    series = _daily_cents(con)
    got = {r["event_type"]: r for r in
           changepoint_value_events(spark, sf_dir).collect()}
    for t, vc in series.items():
        days = sorted(vc)
        vals = [vc[d] if vc[d] is not None else None for d in days]
        assert all(v is not None for v in vals)  # testdata has no gaps
        nt = len(vals)
        st = sum(vals)
        qt = sum(v * v for v in vals)
        best = None
        sl = ql = 0
        for i, d in enumerate(days[:-1]):
            sl += vals[i]
            ql += vals[i] * vals[i]
            nl, nr = i + 1, nt - i - 1
            sr, qr = st - sl, qt - ql
            obj_x = (nl * ql - sl * sl) * nr + (nr * qr - sr * sr) * nl
            obj_d = float(obj_x) / float(nl * nr)
            key = (obj_d, d)
            if best is None or key < best[0]:
                best = (key, d, nl, nr, sl, sr, obj_d)
        _, d, nl, nr, sl, sr, obj_d = best
        r = got[t]
        assert r["split_day"] == d
        assert (r["n_left"], r["n_right"]) == (nl, nr)
        assert r["mean_left_r"] == pytest.approx(
            _halfup_div(sl, nl, 2), rel=1e-12
        )
        assert r["mean_right_r"] == pytest.approx(
            _halfup_div(sr, nr, 2), rel=1e-12
        )
        assert r["obj_r"] == pytest.approx(obj_d, rel=1e-12)


# ------------------------------------------------------------- Markov


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_markov_accuracy_matches_reference(spark, sf_dir):
    from collections import Counter

    from de4ml_spark.queries.statq import (
        MARKOV_SPLIT_DAY,
        markov_next_event_accuracy,
    )

    con = _con(sf_dir)
    rows = con.sql(
        """SELECT user_id, event_type, epoch_ns(ts), event_id,
               date_part('day', ts)
        FROM events WHERE user_id IS NOT NULL"""
    ).fetchall()
    # Spark reads the nanos column floor-divided to micros; order
    # within (user, split) is (ts_micros, event_id)
    by_part: dict[tuple, list] = {}
    for uid, et, ns, eid, dom in rows:
        is_train = dom < MARKOV_SPLIT_DAY
        by_part.setdefault((uid, is_train), []).append(
            (ns // 1000, eid, et)
        )
    train = Counter()
    test_pairs = []
    for (_, is_train), evs in by_part.items():
        evs.sort()
        for (_, _, prev), (_, _, nxt) in zip(evs, evs[1:]):
            if is_train:
                train[(prev, nxt)] += 1
            else:
                test_pairs.append((prev, nxt))
    pred = {}
    for (prev, nxt), c in train.items():
        cur = pred.get(prev)
        if cur is None or (-c, nxt) < (-cur[1], cur[0]):
            pred[prev] = (nxt, c)
    agg: dict[str, list[int]] = {}
    for prev, nxt in test_pairs:
        row = agg.setdefault(prev, [0, 0])
        row[0] += 1
        if prev in pred and nxt == pred[prev][0]:
            row[1] += 1
    got = {r["prev"]: r for r in
           markov_next_event_accuracy(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for prev, (n_test, n_hits) in agg.items():
        r = got[prev]
        assert r["n_test"] == n_test
        assert r["n_hits"] == n_hits
        if prev in pred:
            assert r["predicted"] == pred[prev][0]
            assert r["train_cnt"] == pred[prev][1]
        else:
            assert r["predicted"] is None
        assert r["accuracy_r"] == pytest.approx(
            _halfup_div(n_hits, n_test), rel=1e-12
        )


# ------------------------------------------------- embedding covariance


def test_embedding_covariance_matches_reference(spark):
    from de4ml_spark.queries.simq import embedding_covariance

    con = _con(SF)
    vecs = [
        v for (v,) in con.sql("SELECT embedding FROM embeddings").fetchall()
    ]
    dim = len(vecs[0])
    micro = [
        [math.floor(float(x) * 1e6 + 0.5) for x in vec] for vec in vecs
    ]
    got = {(r["j"], r["k"]): r for r in
           embedding_covariance(spark, SF).collect()}
    assert len(got) == dim * (dim + 1) // 2
    n = len(micro)
    # spot-check a diagonal band plus corners (full d^2 loop in Python
    # is slow for no extra coverage)
    checks = [(j, j) for j in range(dim)] + [
        (0, dim - 1),
        (1, 5),
        (3, 17),
        (0, 1),
    ]
    for j, k in checks:
        sj = sum(m[j] for m in micro)
        sk = sum(m[k] for m in micro)
        sjk = sum(m[j] * m[k] for m in micro)
        r = got[(j, k)]
        assert r["n"] == n
        assert r["sj"] == sj
        assert r["sk"] == sk
        cov = float(n * sjk - sj * sk) / float(n * (n - 1)) / 1e12
        assert r["cov_r"] == pytest.approx(cov, rel=1e-9)


# ------------------------------------------------- grid/cluster purity


def _grid_clusters_reference(con):
    from de4ml_spark.queries.simq import _GRID_OFF, GRID_H, GRID_MINPTS

    def tdiv(a: int, b: int) -> int:  # Spark DIV truncates toward zero
        return a // b if a >= 0 else -((-a) // b)

    pts = {}
    for vid, emb in con.sql(
        "SELECT vec_id, embedding FROM embeddings"
    ).fetchall():
        cx = tdiv(math.floor(float(emb[0]) * 1e6 + 0.5), GRID_H)
        cy = tdiv(math.floor(float(emb[1]) * 1e6 + 0.5), GRID_H)
        pts[vid] = (cx, cy)
    from collections import Counter

    cells = Counter(pts.values())
    core = {
        (cx, cy): (cx + _GRID_OFF) * 100000 + (cy + _GRID_OFF)
        for (cx, cy), n in cells.items()
        if n >= GRID_MINPTS
    }
    parent = {c: c for c in core.values()}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (cx, cy), c in core.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nbr = core.get((cx + dx, cy + dy))
                if nbr is not None and nbr != c:
                    ra, rb = find(c), find(nbr)
                    if ra != rb:
                        lo, hi = min(ra, rb), max(ra, rb)
                        parent[hi] = lo
    return {
        vid: (find(core[cc]) if cc in core else None)
        for vid, cc in pts.items()
    }


def test_cluster_purity_matches_reference(spark):
    from collections import Counter

    from de4ml_spark.queries.simq import cluster_purity_embeddings

    con = _con(SF)
    assign = _grid_clusters_reference(con)
    labels = dict(
        con.sql("SELECT vec_id, label FROM embeddings").fetchall()
    )
    by_cluster: dict = {}
    for vid, cl in assign.items():
        by_cluster.setdefault(cl, Counter())[labels[vid]] += 1
    got = {r["cluster"]: r for r in
           cluster_purity_embeddings(spark, SF).collect()}
    assert set(got) == set(by_cluster)
    for cl, cnt in by_cluster.items():
        n_points = sum(cnt.values())
        maj_label, maj_n = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0])
        )
        r = got[cl]
        assert r["n_points"] == n_points
        assert r["majority_label"] == maj_label
        assert r["n_majority"] == maj_n
        if cl is None:
            assert r["purity_r"] is None
        else:
            assert r["purity_r"] == pytest.approx(
                _halfup_div(maj_n, n_points), rel=1e-12
            )


# ------------------------------------------------------------- KMV


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_kmv_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.sketchq import (
        KMV_BITS,
        KMV_K,
        kmv_distinct_users,
    )

    con = _con(sf_dir)
    by_day: dict = {}
    for day, uid in con.sql(
        "SELECT DISTINCT CAST(ts AS DATE), user_id FROM events"
    ).fetchall():
        by_day.setdefault(day, set()).add(uid)
    got = {r["day"]: r for r in kmv_distinct_users(spark, sf_dir).collect()}
    assert set(got) == set(by_day)
    for day, uids in by_day.items():
        hs = sorted({_phash(str(u), KMV_BITS) for u in uids})
        r = got[day]
        assert r["exact_distinct"] == len(uids)
        if len(hs) >= KMV_K:
            hk = hs[KMV_K - 1]
            assert r["kmv_est"] == (KMV_K - 1) * (1 << KMV_BITS) // (hk + 1)
        else:
            assert r["kmv_est"] == len(uids)


# ------------------------------------------------------------- CountMin


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_countmin_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.sketchq import (
        _CM_FAMILY,
        CM_WIDTH,
        countmin_event_types,
    )
    from de4ml_spark.operators.portable_hash import P31

    con = _con(sf_dir)
    exact = dict(
        con.sql("SELECT event_type, COUNT(*) FROM events GROUP BY 1").fetchall()
    )
    buckets: dict = {}
    for t, c in exact.items():
        x = _phash(t, 31)
        for s, (a, b) in enumerate(_CM_FAMILY):
            key = (s, ((a * x + b) % P31) % CM_WIDTH)
            buckets[key] = buckets.get(key, 0) + c
    got = {r["event_type"]: r for r in
           countmin_event_types(spark, sf_dir).collect()}
    assert set(got) == set(exact)
    for t, c in exact.items():
        x = _phash(t, 31)
        est = min(
            buckets[(s, ((a * x + b) % P31) % CM_WIDTH)]
            for s, (a, b) in enumerate(_CM_FAMILY)
        )
        assert got[t]["exact_count"] == c
        assert got[t]["cm_est"] == est
        assert est >= c  # CountMin never underestimates


# ------------------------------------------------------------- Neyman


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_neyman_allocation_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.samplingq import (
        NEYMAN_BUDGET,
        neyman_allocation_events,
    )

    con = _con(sf_dir)
    strata: dict = {}
    for t, v in con.sql(
        "SELECT event_type, value FROM events"
    ).fetchall():
        strata.setdefault(t, []).append(_cents(v) if v is not None else None)
    w_micro = {}
    ns = {}
    for t, vals in strata.items():
        n = len(vals)
        live = [v for v in vals if v is not None]
        sx = sum(live)
        sxx = sum(v * v for v in live)
        sigma = math.sqrt(float(n * sxx - sx * sx) / float(n * n))
        w_micro[t] = math.floor(n * sigma * 1e6 + 0.5)
        ns[t] = n
    tw = sum(w_micro.values())
    base = {t: NEYMAN_BUDGET * w // tw for t, w in w_micro.items()}
    rem = {t: NEYMAN_BUDGET * w % tw for t, w in w_micro.items()}
    leftover = NEYMAN_BUDGET - sum(base.values())
    order = sorted(w_micro, key=lambda t: (-rem[t], t))
    alloc = {
        t: base[t] + (1 if i < leftover else 0)
        for i, t in enumerate(order)
    }
    got = {r["event_type"]: r for r in
           neyman_allocation_events(spark, sf_dir).collect()}
    assert set(got) == set(strata)
    for t in strata:
        r = got[t]
        assert r["n"] == ns[t]
        assert r["w_micro"] == w_micro[t]
        assert r["n_alloc"] == alloc[t]
    assert sum(r["n_alloc"] for r in got.values()) == NEYMAN_BUDGET


# ------------------------------------------------------- anomalous days


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_anomalous_days_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.profileq2 import anomalous_days_events

    con = _con(sf_dir)
    daily: dict = {}
    for day, v in con.sql(
        "SELECT CAST(ts AS DATE), value FROM events"
        " WHERE event_type = 'purchase'"
    ).fetchall():
        daily.setdefault(day, []).append(v)
    td = {
        d: sum(
            (Decimal(v).quantize(Decimal("0.01"), ROUND_HALF_UP))
            for v in vs
            if v is not None
        )
        for d, vs in daily.items()
    }
    n = len(td)
    s1 = float(sum(td.values()))
    s2 = float(sum(t * t for t in td.values()))
    sd = math.sqrt((n * s2 - s1 * s1) / (n * (n - 1)))
    got = {r["day"]: r for r in
           anomalous_days_events(spark, sf_dir).collect()}
    assert set(got) == set(td)
    for d, t in td.items():
        z = (float(t) - s1 / n) / sd
        r = got[d]
        assert r["total"] == pytest.approx(float(t), rel=1e-12)
        assert r["z"] == pytest.approx(z, abs=1.01e-6)
        if abs(abs(z) - 2.0) > 1e-5:  # away from the threshold boundary
            assert r["is_anomaly"] == (abs(z) > 2)


# ------------------------------------------------------------- SPRT


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_sprt_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq import _sprt_consts, sprt_ctr_deciles

    ln43, ln98, ln19 = _sprt_consts()
    con = _con(sf_dir)
    daily: dict = {}
    for dec, day, n, x in con.sql(
        """SELECT user_id % 10, CAST(ts AS DATE), COUNT(*),
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        FROM events
        WHERE event_type IN ('click', 'view') AND user_id IS NOT NULL
        GROUP BY 1, 2"""
    ).fetchall():
        daily.setdefault(dec, []).append((day, n, x))
    got = {r["decile"]: r for r in sprt_ctr_deciles(spark, sf_dir).collect()}
    assert set(got) == set(daily)
    for dec, rows in daily.items():
        rows.sort()
        llr = 0
        decided = False
        for idx, (day, n, x) in enumerate(rows):
            llr += x * ln43 - (n - x) * ln98
            if llr >= ln19 or llr <= -ln19:
                r = got[dec]
                assert r["decision_day"] == day
                assert r["n_days_used"] == idx + 1
                assert r["llr_micro"] == llr
                assert r["decision"] == ("h1" if llr >= ln19 else "h0")
                decided = True
                break
        if not decided:
            r = got[dec]
            assert r["decision_day"] is None
            assert r["n_days_used"] == len(rows)
            assert r["llr_micro"] == llr
            assert r["decision"] == "continue"


# ------------------------------------------------------------- gapfill


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_gapfill_interp_matches_reference(spark, sf_dir):
    import datetime

    from de4ml_spark.queries.tsq2 import gapfill_interp_user_daily

    con = _con(sf_dir)
    daily: dict = {}
    for uid, day, v in con.sql(
        """SELECT user_id, CAST(ts AS DATE), value FROM events
        WHERE user_id < 40"""
    ).fetchall():
        daily.setdefault(uid, {}).setdefault(day, []).append(v)
    got = {
        (r["user_id"], r["day"]): r
        for r in gapfill_interp_user_daily(spark, sf_dir).collect()
    }
    n_expected = 0
    for uid, by_day in daily.items():
        vc = {
            d: (
                sum(_cents(v) for v in vs if v is not None)
                if any(v is not None for v in vs)
                else None
            )
            for d, vs in by_day.items()
        }
        d0, d1 = min(vc), max(vc)
        obs_days = sorted(d for d in vc if vc[d] is not None)
        span = [
            d0 + datetime.timedelta(days=i)
            for i in range((d1 - d0).days + 1)
        ]
        n_expected += len(span)
        for d in span:
            r = got[(uid, d)]
            if d in vc and vc[d] is not None:
                assert r["observed"] is True
                assert r["value_filled"] == pytest.approx(
                    vc[d] / 100.0, rel=1e-12
                )
                continue
            assert r["observed"] is False
            prev = max((p for p in obs_days if p < d), default=None)
            nxt = min((p for p in obs_days if p > d), default=None)
            if prev is None or nxt is None:
                assert r["value_filled"] is None
                continue
            pd_, nd = (prev - d0).days, (nxt - d0).days
            dd = (d - d0).days
            num = vc[prev] * (nd - pd_) + (vc[nxt] - vc[prev]) * (dd - pd_)
            den = (nd - pd_) * 100
            assert r["value_filled"] == pytest.approx(
                float((2 * num * 10**6 + den) // (2 * den)) / 10**6,
                rel=1e-12,
            )
    assert len(got) == n_expected


# ------------------------------------------------------------- LTV


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_ltv_triangle_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.tsq2 import ltv_triangle_orders

    con = _con(sf_dir)
    orders = con.sql(
        """SELECT o_custkey, date_trunc('month', CAST(o_orderdate AS DATE)),
               o_totalprice
        FROM orders"""
    ).fetchall()
    first: dict = {}
    for ck, om, _ in orders:
        if ck not in first or om < first[ck]:
            first[ck] = om
    sizes: dict = {}
    for ck, coh in first.items():
        sizes[coh] = sizes.get(coh, 0) + 1
    tri: dict = {}
    for ck, om, price in orders:
        coh = first[ck]
        age = (om.year - coh.year) * 12 + (om.month - coh.month)
        row = tri.setdefault((coh, age), [0, 0])
        row[0] += 1
        row[1] += _cents(price)
    got = {
        (r["cohort"], r["age_months"]): r
        for r in ltv_triangle_orders(spark, sf_dir).collect()
    }
    assert set(got) == set(tri)
    cum: dict = {}
    for (coh, age) in sorted(tri):
        n_orders, rev = tri[(coh, age)]
        cum[coh] = cum.get(coh, 0) + rev
        r = got[(coh, age)]
        assert r["n_orders"] == n_orders
        assert r["revenue_c"] == rev
        assert r["cum_revenue_c"] == cum[coh]
        assert r["cohort_users"] == sizes[coh]
        assert r["ltv_per_user_r"] == pytest.approx(
            _halfup_div(cum[coh], sizes[coh] * 100), rel=1e-12
        )


# ------------------------------------------------------------- triangles


def test_triangle_count_matches_reference(spark):
    from de4ml_spark.queries.graphq import triangle_count_parts

    con = _con(SF)
    by_order: dict = {}
    for ok, pk in con.sql(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall():
        by_order.setdefault(ok, set()).add(pk)
    edges = set()
    for parts in by_order.values():
        for u in parts:
            for v in parts:
                if u < v:
                    edges.add((u, v))
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    per_node: dict = {}
    total = 0
    nodes = sorted(adj)
    for u in nodes:
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    total += 1
                    for x in (u, v, w):
                        per_node[x] = per_node.get(x, 0) + 1
    got = {r["node"]: r for r in triangle_count_parts(spark, SF).collect()}
    assert set(got) == set(per_node)
    for node, t in per_node.items():
        r = got[node]
        deg = len(adj[node])
        assert r["n_triangles"] == t
        assert r["degree"] == deg
        assert r["total_triangles"] == total
        assert r["clustering_r"] == pytest.approx(
            _halfup_div(2 * t, deg * (deg - 1)), rel=1e-12
        )


# ------------------------------------------------------------- HITS


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_hits_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.graphq import (
        HITS_SCALE,
        HITS_TOPK,
        hits_bipartite_orders,
    )

    con = _con(sf_dir)
    edges = set(
        con.sql(
            """SELECT DISTINCT o.o_custkey, l.l_partkey
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey"""
        ).fetchall()
    )
    # half-step 1: authority = renormed part degree
    s1: dict = {}
    for _, p in edges:
        s1[p] = s1.get(p, 0) + HITS_SCALE
    t1 = sum(s1.values())
    a1 = {p: s * HITS_SCALE // t1 for p, s in s1.items()}
    # half-step 2: hubs from authorities
    s2: dict = {}
    for c, p in edges:
        s2[c] = s2.get(c, 0) + a1[p]
    t2 = sum(s2.values())
    h1 = {c: s * HITS_SCALE // t2 for c, s in s2.items()}
    # half-step 3: authorities from refined hubs
    s3: dict = {}
    for c, p in edges:
        s3[p] = s3.get(p, 0) + h1[c]
    t3 = sum(s3.values())
    a2 = {p: s * HITS_SCALE // t3 for p, s in s3.items()}
    top = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:HITS_TOPK]
    rows = hits_bipartite_orders(spark, sf_dir).collect()
    assert len(rows) == min(HITS_TOPK, len(a2))
    got = {r["partkey"]: r["authority_ppm"] for r in rows}
    assert got == dict(top)


# ------------------------------------------------------------- WoE / IV


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_woe_iv_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.mldataq5 import woe_iv_events

    con = _con(sf_dir)
    buckets: dict = {}
    for v, et in con.sql(
        """SELECT value, event_type FROM events
        WHERE value IS NOT NULL AND event_type IS NOT NULL"""
    ).fetchall():
        c = _cents(v)
        b = c // 5000 if c >= 0 else -((-c) // 5000)
        row = buckets.setdefault(b, [0, 0])
        if et == "purchase":
            row[0] += 1
        else:
            row[1] += 1
    k = len(buckets)
    g_raw = sum(g for g, _ in buckets.values())
    b_raw = sum(b for _, b in buckets.values())
    g_tot, b_tot = 2 * g_raw + k, 2 * b_raw + k
    got = {r["bucket"]: r for r in woe_iv_events(spark, sf_dir).collect()}
    assert set(got) == set(buckets)
    iv_ref = 0.0
    for bkt, (g, b) in buckets.items():
        g_s, b_s = 2 * g + 1, 2 * b + 1
        woe = math.log((g_s * b_tot) / (b_s * g_tot))
        r = got[bkt]
        assert (r["n_good"], r["n_bad"]) == (g, b)
        assert r["woe"] == pytest.approx(woe, rel=1e-9, abs=1e-12)
        iv_ref += (g_s / g_tot - b_s / b_tot) * woe
    assert got[min(got)]["iv_total"] == pytest.approx(
        iv_ref, rel=1e-4, abs=1e-6
    )


# ------------------------------------------------------------- kappa


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_cohens_kappa_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.mldataq5 import cohens_kappa_docs

    con = _con(sf_dir)
    n = agree = a1 = b1 = 0
    for nc, text in con.sql(
        "SELECT n_chars, text FROM documents"
    ).fetchall():
        ra = 1 if nc >= 300 else 0
        rb = 1 if len(text.split(" ")) >= 50 else 0
        n += 1
        agree += 1 if ra == rb else 0
        a1 += ra
        b1 += rb
    pe_num = a1 * b1 + (n - a1) * (n - b1)
    kappa = float(n * agree - pe_num) / float(n * n - pe_num)
    row = cohens_kappa_docs(spark, sf_dir).collect()[0]
    assert (row["n_tot"], row["agree"], row["a1"], row["b1"]) == (
        n, agree, a1, b1,
    )
    assert row["po"] == pytest.approx(agree / n, rel=1e-12)
    assert row["kappa"] == pytest.approx(kappa, rel=1e-12)


# ------------------------------------------------------------- NDCG@K


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_ndcg_matches_reference(spark, sf_dir):
    import datetime

    from de4ml_spark.queries.mldataq4 import POP_SPLIT_DEN, POP_SPLIT_NUM
    from de4ml_spark.queries.mldataq5 import (
        _NDCG_GAIN_U,
        _NDCG_IDEAL_U,
        NDCG_K,
        ndcg_at_k_orders,
    )

    con = _con(sf_dir)
    orders = con.sql(
        "SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) FROM orders"
    ).fetchall()
    li: dict = {}
    for ok, pk in con.sql(
        "SELECT l_orderkey, l_partkey FROM lineitem"
    ).fetchall():
        li.setdefault(ok, []).append(pk)
    dmin = min(d for _, _, d in orders)
    dmax = max(d for _, _, d in orders)
    split = dmin + datetime.timedelta(
        days=(dmax - dmin).days * POP_SPLIT_NUM // POP_SPLIT_DEN
    )
    from collections import Counter

    train_cnt = Counter()
    holdout: dict = {}
    for ok, ck, d in orders:
        for pk in li.get(ok, []):
            if d <= split:
                train_cnt[pk] += 1
            else:
                holdout.setdefault(ck, set()).add(pk)
    topk = sorted(train_cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:NDCG_K]
    pos = {pk: i + 1 for i, (pk, _) in enumerate(topk)}
    total_u = 0
    for ck, parts in holdout.items():
        dcg = sum(_NDCG_GAIN_U[pos[pk] - 1] for pk in parts if pk in pos)
        idcg = _NDCG_IDEAL_U[min(len(parts), NDCG_K) - 1]
        total_u += (2 * dcg * 1_000_000 + idcg) // (2 * idcg)
    row = ndcg_at_k_orders(spark, sf_dir).collect()[0]
    assert row["n_customers"] == len(holdout)
    assert row["sum_ndcg_u"] == total_u
    assert row["ndcg_r"] == pytest.approx(
        _halfup_div(total_u, len(holdout) * 1_000_000), rel=1e-12
    )


# ------------------------------------------------------------- Katz


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_katz_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.graphq import (
        KATZ_ALPHA_DIV,
        KATZ_ITERS,
        KATZ_SCALE,
        KATZ_TOPK,
        katz_centrality_parts,
    )

    con = _con(sf_dir)
    by_order: dict = {}
    for ok, pk in con.sql(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall():
        by_order.setdefault(ok, set()).add(pk)
    out_edges: dict = {}
    for parts in by_order.values():
        for u in parts:
            for v in parts:
                if u != v:
                    out_edges.setdefault(u, set()).add(v)
    katz = {n: KATZ_SCALE for n in out_edges}
    for _ in range(KATZ_ITERS):
        in_sum: dict = {}
        for u, vs in out_edges.items():
            for v in vs:
                in_sum[v] = in_sum.get(v, 0) + katz[u]
        katz = {
            n: KATZ_SCALE + in_sum.get(n, 0) // KATZ_ALPHA_DIV
            for n in katz
        }
    top = sorted(katz.items(), key=lambda kv: (-kv[1], kv[0]))[:KATZ_TOPK]
    rows = katz_centrality_parts(spark, sf_dir).collect()
    assert [(r["part_key"], r["katz"]) for r in rows] == top
    assert [r["rank"] for r in rows] == list(range(1, len(top) + 1))


# ------------------------------------------------- interarrival/burst


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_interarrival_burstiness_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq2 import interarrival_burstiness_events

    con = _con(sf_dir)
    by_type: dict = {}
    for et, ns, eid in con.sql(
        """SELECT event_type, epoch_ns(ts), event_id FROM events
        WHERE event_type IS NOT NULL"""
    ).fetchall():
        by_type.setdefault(et, []).append((ns // 1000, eid))
    got = {r["event_type"]: r for r in
           interarrival_burstiness_events(spark, sf_dir).collect()}
    assert set(got) == set(by_type)
    for et, evs in by_type.items():
        evs.sort()
        gaps = [b[0] - a[0] for a, b in zip(evs, evs[1:])]
        n = len(gaps)
        s, ss = sum(gaps), sum(g * g for g in gaps)
        mu = s / n
        sd = math.sqrt(float(n * ss - s * s) / (n * (n - 1.0)))
        r = got[et]
        assert r["n_gaps"] == n
        assert r["mean_gap_us"] == pytest.approx(mu, rel=1e-12)
        assert r["sd_gap_us"] == pytest.approx(sd, rel=1e-9)
        assert r["burstiness"] == pytest.approx(
            (sd - mu) / (sd + mu), rel=1e-9
        )


# ------------------------------------------------------- Durbin-Watson


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_durbin_watson_matches_reference(spark, sf_dir):
    import datetime

    from de4ml_spark.queries.statq2 import durbin_watson_daily_events

    con = _con(sf_dir)
    daily = dict(
        con.sql(
            "SELECT CAST(ts AS DATE), COUNT(*) FROM events GROUP BY 1"
        ).fetchall()
    )
    n = len(daily)
    s = sum(daily.values())
    # residuals of the mean model, scaled by n to stay integer
    e = {d: n * c - s for d, c in daily.items()}
    dden = sum(v * v for v in e.values())
    dnum = sum(
        (e[d + datetime.timedelta(days=1)] - e[d]) ** 2
        for d in e
        if d + datetime.timedelta(days=1) in e
    )
    row = durbin_watson_daily_events(spark, sf_dir).collect()[0]
    assert row["n_days"] == n
    assert row["durbin_watson"] == pytest.approx(
        float(dnum) / float(dden), rel=1e-12
    )


# ------------------------------------------------- Poisson bootstrap


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_poisson_bootstrap_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.samplingq import (
        _POIS_T,
        BOOT_REPS,
        poisson_bootstrap_value_mean,
    )

    con = _con(sf_dir)
    rows = con.sql(
        "SELECT event_id, value FROM events WHERE value IS NOT NULL"
    ).fetchall()
    base = [(eid, _cents(v)) for eid, v in rows]

    def weight(r: int, eid) -> int:
        h = _phash(f"{r}:{eid}")
        for k, t in enumerate(_POIS_T):
            if h < t:
                return k
        return 8

    means = []
    for r in range(BOOT_REPS):
        sw = swx = 0
        for eid, vc in base:
            w = weight(r, eid)
            sw += w
            swx += w * vc
        means.append((2 * swx * 1_000_000 + sw) // (2 * sw))
    means.sort()
    row = poisson_bootstrap_value_mean(spark, sf_dir).collect()[0]
    assert row["n_events"] == len(base)
    assert row["b_reps"] == BOOT_REPS
    assert row["mean_value_cents"] == pytest.approx(
        sum(v for _, v in base) / len(base), rel=1e-12
    )
    assert row["ci_lo_cents"] == pytest.approx(means[1] / 1e6, rel=1e-12)
    assert row["ci_hi_cents"] == pytest.approx(
        means[BOOT_REPS - 2] / 1e6, rel=1e-12
    )


# ------------------------------------------------------------- keyness


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_keyness_matches_reference(spark, sf_dir):
    from collections import Counter

    from de4ml_spark.operators.portable_hash import portable_ln_const
    from de4ml_spark.queries.textq4 import KEYNESS_K, keyness_terms_sources

    con = _con(sf_dir)
    n_docs = Counter(
        dict(
            con.sql(
                "SELECT source, COUNT(*) FROM documents GROUP BY 1"
            ).fetchall()
        )
    )
    top2 = sorted(n_docs.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    side = {top2[0][0]: 1, top2[1][0]: 2}
    a_cnt, b_cnt = Counter(), Counter()
    for source, text in con.sql(
        "SELECT source, text FROM documents"
    ).fetchall():
        if source not in side:
            continue
        (a_cnt if side[source] == 1 else b_cnt).update(text.split(" "))
    na = sum(a_cnt.values())
    nb = sum(b_cnt.values())
    g2: dict = {}
    for t in set(a_cnt) | set(b_cnt):
        a, b = a_cnt[t], b_cnt[t]
        w_a = w_b = 0
        if a > 0:
            num, den = a * (na + nb), na * (a + b)
            ln = portable_ln_const(max(num, den), min(num, den))
            sgn = 1 if num >= den else -1
            w_a = a * sgn * math.floor(ln * 1e6 + 0.5)
        if b > 0:
            num, den = b * (na + nb), nb * (a + b)
            ln = portable_ln_const(max(num, den), min(num, den))
            sgn = 1 if num >= den else -1
            w_b = b * sgn * math.floor(ln * 1e6 + 0.5)
        g2[t] = (2 * (w_a + w_b), a, b, 1 if w_a >= 0 else 0)
    top = sorted(g2.items(), key=lambda kv: (-kv[1][0], kv[0]))[:KEYNESS_K]
    rows = keyness_terms_sources(spark, sf_dir).collect()
    assert len(rows) == len(top)
    for r, (t, (g2_u, a, b, lean)) in zip(rows, top):
        assert r["term"] == t
        assert (r["cnt_a"], r["cnt_b"]) == (a, b)
        assert r["g2_keyness"] == pytest.approx(g2_u / 1e6, rel=1e-12)
        assert r["leans_a"] == lean


# ------------------------------------------------------- Mahalanobis


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_mahalanobis_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq5 import MAHAL_TOPK, mahalanobis_anomalous_days

    con = _con(sf_dir)
    daily = {
        d: (x, y)
        for d, x, y in con.sql(
            """SELECT CAST(ts AS DATE),
                   SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END),
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            FROM events GROUP BY 1"""
        ).fetchall()
    }
    n = len(daily)
    sx = sum(x for x, _ in daily.values())
    sy = sum(y for _, y in daily.values())
    z = {d: (n * x - sx, n * y - sy) for d, (x, y) in daily.items()}
    a_m = sum(zx * zx for zx, _ in z.values())
    b_m = sum(zx * zy for zx, zy in z.values())
    d_m = sum(zy * zy for _, zy in z.values())
    det2 = a_m * d_m - b_m * b_m
    scored = {
        d: d_m * zx * zx - 2 * b_m * zx * zy + a_m * zy * zy
        for d, (zx, zy) in z.items()
    }
    top = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:MAHAL_TOPK]
    got = {r["day"]: r for r in
           mahalanobis_anomalous_days(spark, sf_dir).collect()}
    assert set(got) == {d for d, _ in top}
    for d, d2_num in top:
        r = got[d]
        assert (r["clicks"], r["purchases"]) == daily[d]
        assert r["mahal_d2"] == pytest.approx(
            float(n) * float(d2_num) / float(det2), rel=1e-12
        )


# ------------------------------------------------------- Burrows delta


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_burrows_delta_matches_reference(spark, sf_dir):
    from collections import Counter

    from de4ml_spark.queries.textq4 import BURROWS_K, burrows_delta_sources

    con = _con(sf_dir)
    counts: dict = {}
    n_docs = Counter()
    for source, text in con.sql(
        "SELECT source, text FROM documents"
    ).fetchall():
        n_docs[source] += 1
        counts.setdefault(source, Counter()).update(text.split(" "))
    pooled = Counter()
    for c in counts.values():
        pooled.update(c)
    topk = [
        t
        for t, _ in sorted(
            pooled.items(), key=lambda kv: (-kv[1], kv[0])
        )[:BURROWS_K]
    ]
    totals = {s: sum(c.values()) for s, c in counts.items()}
    f9 = {
        (s, t): (2 * counts[s][t] * 10**9 + totals[s])
        // (2 * totals[s])
        for s in counts
        for t in topk
    }
    s_cnt = len(counts)
    top2 = sorted(n_docs.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    src_a, src_b = top2[0][0], top2[1][0]
    delta_u = n_terms = 0
    for t in topk:
        sf_ = sum(f9[(s, t)] for s in counts)
        sf2 = sum(f9[(s, t)] ** 2 for s in counts)
        v9 = s_cnt * sf2 - sf_ * sf_
        fa, fb = f9[(src_a, t)], f9[(src_b, t)]
        t_u = math.floor(
            1e6 * float(s_cnt) * float(abs(fa - fb)) / math.sqrt(float(v9))
            + 0.5
        )
        n_terms += 1
        delta_u += t_u
    row = burrows_delta_sources(spark, sf_dir).collect()[0]
    assert (row["src_a"], row["src_b"]) == (src_a, src_b)
    assert row["n_terms"] == n_terms
    assert row["burrows_delta"] == pytest.approx(
        float(delta_u) / (float(n_terms) * 1e6), rel=1e-12
    )


# ------------------------------------------------- Benford 2nd digit


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_benford_second_digit_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.sketchq import benford_second_digit_totalprice

    con = _con(sf_dir)
    obs = {d: 0 for d in range(0, 10)}
    for (v,) in con.sql("SELECT o_totalprice FROM orders").fetchall():
        s = str(Decimal(v).quantize(Decimal("0.01"), ROUND_HALF_UP))
        if len(s) > 1 and "0" <= s[1] <= "9":
            obs[int(s[1])] += 1
    n = sum(obs.values())
    chi2 = 0.0
    for d2 in range(0, 10):
        p = sum(
            math.log10(1 + 1 / (10 * d1 + d2)) for d1 in range(1, 10)
        )
        e = n * p
        chi2 += (obs[d2] - e) ** 2 / e
    rows = benford_second_digit_totalprice(spark, sf_dir).collect()
    assert len(rows) == 10
    got = {r["digit"]: r for r in rows}
    for d in range(0, 10):
        assert got[d]["observed"] == obs[d]
    assert rows[0]["chi2_r"] == pytest.approx(chi2, rel=1e-4, abs=1e-3)


# ------------------------------------------------- distance correlation


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_distance_correlation_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq4 import distance_correlation_lineitem

    con = _con(sf_dir)
    cells = [
        (int(q), _cents(disc), c)
        for q, disc, c in con.sql(
            """SELECT CAST(l_quantity AS BIGINT), l_discount, COUNT(*)
            FROM lineitem GROUP BY 1, 2"""
        ).fetchall()
    ]
    n = sum(c for _, _, c in cells)
    s1_xy = s1_xx = s1_yy = sx_tot = sy_tot = s3_xy = s3_xx = s3_yy = 0
    for x, y, c in cells:
        ax = by_ = axy = axx = ayy = 0
        for x2, y2, c2 in cells:
            dx, dy = abs(x - x2), abs(y - y2)
            ax += c2 * dx
            by_ += c2 * dy
            axy += c2 * dx * dy
            axx += c2 * dx * dx
            ayy += c2 * dy * dy
        s1_xy += c * axy
        s1_xx += c * axx
        s1_yy += c * ayy
        sx_tot += c * ax
        sy_tot += c * by_
        s3_xy += c * ax * by_
        s3_xx += c * ax * ax
        s3_yy += c * by_ * by_
    p2 = float(n) * float(n)
    p3 = p2 * float(n)

    def dcov2(s1, rx, ry, s3):
        return (
            float(s1) / p2
            + (float(rx) / p2) * (float(ry) / p2)
            - 2.0 * float(s3) / p3
        )

    dxy = dcov2(s1_xy, sx_tot, sy_tot, s3_xy)
    dxx = dcov2(s1_xx, sx_tot, sx_tot, s3_xx)
    dyy = dcov2(s1_yy, sy_tot, sy_tot, s3_yy)
    row = distance_correlation_lineitem(spark, sf_dir).collect()[0]
    assert row["n_rows"] == n
    assert row["dcov2"] == pytest.approx(dxy, rel=1e-9)
    assert row["dcor"] == pytest.approx(
        math.sqrt(dxy / math.sqrt(dxx * dyy)), rel=1e-9
    )


# ------------------------------------------------------------- EWMA


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_ewma_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.searchq import ewma_user_daily

    con = _con(sf_dir)
    daily: dict = {}
    for uid, day, v in con.sql(
        """SELECT user_id, CAST(ts AS DATE), value FROM events
        WHERE event_type = 'purchase'"""
    ).fetchall():
        daily.setdefault(uid, {}).setdefault(day, []).append(v)
    got = {
        (r["user_id"], r["day"]): r
        for r in ewma_user_daily(spark, sf_dir).collect()
    }
    n_rows = 0
    for uid, by_day in daily.items():
        days = sorted(by_day)
        t_cum = 0
        for i, d in enumerate(days, start=1):
            x = int(
                sum(
                    Decimal(v).quantize(Decimal("0.000001"), ROUND_HALF_UP)
                    for v in by_day[d]
                    if v is not None
                )
                * 1_000_000
            )
            t_cum += x if i == 1 else x * (1 << (i - 2))
            r = got[(uid, d)]
            n_rows += 1
            assert r["daily_total"] == pytest.approx(x / 1e6, rel=1e-12)
            assert r["ewma"] == pytest.approx(
                float(t_cum) / float(1 << (i - 1)) / 1e6, rel=1e-12
            )
    assert len(got) == n_rows


# ------------------------------------------------------------- MAD


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_mad_price_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.mldataq2 import mad_price

    con = _con(sf_dir)
    prices = sorted(
        v for (v,) in con.sql(
            "SELECT l_extendedprice FROM lineitem"
        ).fetchall()
    )

    def q50(xs):  # quantile_cont interpolated median
        n = len(xs)
        if n % 2:
            return xs[n // 2]
        return (xs[n // 2 - 1] + xs[n // 2]) / 2

    med = q50(prices)
    mad = q50(sorted(abs(p - med) for p in prices))
    row = mad_price(spark, sf_dir).collect()[0]
    assert row["n"] == len(prices)
    assert row["median_r"] == pytest.approx(med, abs=1.01e-6)
    assert row["mad_r"] == pytest.approx(mad, abs=1.01e-6)


# ------------------------------------------------------------- TWAP


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_twap_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.tsq import twap_user_value

    con = _con(sf_dir)
    by_user: dict = {}
    for uid, ns, eid, v in con.sql(
        "SELECT user_id, epoch_ns(ts), event_id, value FROM events"
    ).fetchall():
        by_user.setdefault(uid, []).append((ns // 1000, eid, v))
    got = {r["user_id"]: r for r in twap_user_value(spark, sf_dir).collect()}
    for uid, evs in by_user.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        wsum_c = 0
        span = 0
        for (t0, _, v), (t1, _, _) in zip(evs, evs[1:]):
            dur = t1 - t0
            span += dur
            if v is not None:
                wsum_c += _cents(v) * dur
        if span <= 0:
            assert uid not in got
            continue
        r = got[uid]
        assert r["n_events"] == len(evs)
        assert r["span_us"] == span
        assert r["twap_r"] == pytest.approx(
            _halfup_div(wsum_c, span * 100), rel=1e-12
        )


# ------------------------------------------------------------- OHLC


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_ohlc_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.tsq import ohlc_daily_value

    con = _con(sf_dir)
    by_day: dict = {}
    for day, ns, eid, v in con.sql(
        "SELECT CAST(ts AS DATE), epoch_ns(ts), event_id, value FROM events"
    ).fetchall():
        by_day.setdefault(day, []).append(((ns // 1000) * 10**12 + eid, v))
    got = {r["day"]: r for r in ohlc_daily_value(spark, sf_dir).collect()}
    assert set(got) == set(by_day)

    def r2(v):
        return (
            None
            if v is None
            else float(Decimal(v).quantize(Decimal("0.01"), ROUND_HALF_UP))
        )

    for day, evs in by_day.items():
        r = got[day]
        assert r["n_events"] == len(evs)
        live = [(k, v) for k, v in evs if v is not None]
        assert r["open"] == pytest.approx(
            r2(min(live)[1]), rel=1e-12
        )
        assert r["close"] == pytest.approx(r2(max(live)[1]), rel=1e-12)
        assert r["high"] == pytest.approx(
            r2(max(v for _, v in live)), rel=1e-12
        )
        assert r["low"] == pytest.approx(
            r2(min(v for _, v in live)), rel=1e-12
        )


# ------------------------------------------------------------- max gap


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_max_event_gap_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.mldataq2 import max_event_gap_users

    con = _con(sf_dir)
    by_user: dict = {}
    for uid, ns, eid in con.sql(
        "SELECT user_id, epoch_ns(ts), event_id FROM events"
    ).fetchall():
        by_user.setdefault(uid, []).append((ns // 1000, eid))
    max_gap = {}
    for uid, evs in by_user.items():
        evs.sort()
        gaps = [
            b[0] // 10**6 - a[0] // 10**6 for a, b in zip(evs, evs[1:])
        ]
        if gaps:
            max_gap[uid] = max(gaps)
    top = sorted(max_gap.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = max_event_gap_users(spark, sf_dir).collect()
    assert [(r["user_id"], r["max_gap_s"]) for r in rows] == top
    assert [r["rank"] for r in rows] == list(range(1, len(top) + 1))


# ------------------------------------------------------------- key skew


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_key_skew_matches_reference(spark, sf_dir):
    from collections import Counter

    from de4ml_spark.queries.profileq2 import key_skew_orders

    con = _con(sf_dir)
    freqs = sorted(
        Counter(
            ck for (ck,) in con.sql(
                "SELECT o_custkey FROM orders"
            ).fetchall()
        ).values()
    )
    n_rows = sum(freqs)
    idx = 0.99 * (len(freqs) - 1)
    lo, hi = int(math.floor(idx)), int(math.ceil(idx))
    p99 = freqs[lo] + (idx - lo) * (freqs[hi] - freqs[lo])
    row = key_skew_orders(spark, sf_dir).collect()[0]
    assert row["n_rows"] == n_rows
    assert row["n_keys"] == len(freqs)
    assert row["max_freq"] == max(freqs)
    assert row["top1_share"] == pytest.approx(
        _halfup_div(max(freqs), n_rows), rel=1e-12
    )
    assert row["p99_freq"] == pytest.approx(p99, abs=1.01e-6)


# ------------------------------------------------------- Pearson corr


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_corr_lineitem_matches_reference(spark, sf_dir):
    """The round-13 exactness-tier rewrite (integer-cent moments,
    NULLIF-guarded) must equal textbook Pearson r on the quantized
    columns."""
    from de4ml_spark.queries.profileq2 import corr_lineitem

    con = _con(sf_dir)
    rows = [
        (int(q), _cents(p), _cents(dc), _cents(t))
        for q, p, dc, t in con.sql(
            """SELECT l_quantity, l_extendedprice, l_discount, l_tax
            FROM lineitem"""
        ).fetchall()
    ]

    def corr(ai, bi):
        n = len(rows)
        sa = sum(r[ai] for r in rows)
        sb = sum(r[bi] for r in rows)
        saa = sum(r[ai] ** 2 for r in rows)
        sbb = sum(r[bi] ** 2 for r in rows)
        sab = sum(r[ai] * r[bi] for r in rows)
        return float(n * sab - sa * sb) / math.sqrt(
            float(n * saa - sa * sa) * float(n * sbb - sb * sb)
        )

    row = corr_lineitem(spark, sf_dir).collect()[0]
    assert row["qty_price"] == pytest.approx(corr(0, 1), rel=1e-9)
    assert row["qty_disc"] == pytest.approx(corr(0, 2), rel=1e-9)
    assert row["price_tax"] == pytest.approx(corr(1, 3), rel=1e-9)


# ------------------------------------------- weighted reservoir (A-ES)


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_weighted_reservoir_matches_reference(spark, sf_dir):
    """Efraimidis-Spirakis A-ES without replacement, recomputed from the
    definition: u = (h+1)/2^40 from the md5 portable hash, key =
    ln(u)/w = -ln(2^40/(h+1))/w (micro-quantized ln), sample = top-64
    by key. The ln rides math.log here (the repo side uses the portable
    polynomial, ~2 ulp apart) — set membership is robust to that at
    these corpus sizes; key values compare approx."""
    from de4ml_spark.queries.samplingq import AES_K, weighted_reservoir_docs

    con = _con(sf_dir)
    keys = {}
    weights = {}
    for doc_id, text in con.sql(
        "SELECT doc_id, text FROM documents"
    ).fetchall():
        w = len(text.split(" "))
        if w <= 0:
            continue
        hp = _phash(f"{doc_id}aes", 40) + 1
        lnr_micro = math.floor(math.log((1 << 40) / hp) * 1e6 + 0.5)
        keys[doc_id] = -float(lnr_micro) / w
        weights[doc_id] = w
    expect = sorted(keys, key=lambda d: (-keys[d], d))[:AES_K]

    rows = weighted_reservoir_docs(spark, sf_dir).collect()
    assert len(rows) == AES_K
    got = {r["doc_id"]: r for r in rows}
    assert set(got) == set(expect)
    for i, d in enumerate(expect):
        assert got[d]["rank"] == i + 1
        assert got[d]["w"] == weights[d]
        assert got[d]["aes_key"] == pytest.approx(
            keys[d], abs=5e-6, rel=1e-6
        )


# -------------------------------------------- label centroid distances


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_label_centroid_distances_matches_reference(spark, sf_dir):
    """Integer-micro centroid recompute from the definition: each
    float32 component -> floor(v*1e6 + 0.5) micro int, per-(label, dim)
    half-up mean, pairwise squared-diff integer sums, one sqrt."""
    from collections import defaultdict

    from de4ml_spark.queries.simq import label_centroid_distances

    con = _con(sf_dir)
    sums: dict = defaultdict(lambda: defaultdict(int))
    counts: dict = defaultdict(int)
    for label, emb in con.sql(
        "SELECT label, embedding FROM embeddings"
    ).fetchall():
        counts[label] += 1
        for dim, v in enumerate(emb, start=1):
            sums[label][dim] += math.floor(float(v) * 1e6 + 0.5)
    def tdiv(a: int, b: int) -> int:
        # Spark DIV / DuckDB // truncate toward zero; Python // floors
        return abs(a) // b * (1 if a >= 0 else -1)

    cent = {
        lab: {
            dim: tdiv(2 * s + counts[lab], 2 * counts[lab])
            for dim, s in dims.items()
        }
        for lab, dims in sums.items()
    }
    labs = sorted(cent)
    expect = {}
    for i, a in enumerate(labs):
        for b in labs[i + 1 :]:
            sq = sum(
                (cent[a][d] - cent[b][d]) ** 2 for d in cent[a]
            )
            expect[(a, b)] = sq
    rows = label_centroid_distances(spark, sf_dir).collect()
    assert len(rows) == len(expect)
    for r in rows:
        key = (r["label_a"], r["label_b"])
        assert r["sq_micro"] == expect[key]
        assert r["n_a"] == counts[r["label_a"]]
        assert r["n_b"] == counts[r["label_b"]]
        assert r["dist_r"] == pytest.approx(
            math.sqrt(expect[key]) / 1e6, rel=1e-12
        )


# -------------------------------------------- lineitem measure stats


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_lineitem_measure_stats_matches_reference(spark, sf_dir):
    """UNPIVOT + robust stats recomputed from the definition: exact
    percentile_cont(0.5) interpolation on sorted doubles, min/max, and
    the half-up integer-micro mean (sum of 6dp-quantized values)."""
    from de4ml_spark.queries.relational3 import lineitem_measure_stats

    con = _con(sf_dir)
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    data = con.sql(f"SELECT {', '.join(cols)} FROM lineitem").fetchall()
    rows = {r["measure"]: r for r in
            lineitem_measure_stats(spark, sf_dir).collect()}
    assert set(rows) == set(cols)
    for ci, c in enumerate(cols):
        vals = sorted(float(r[ci]) for r in data)
        n = len(vals)
        # percentile_cont(0.5): linear interpolation at rank (n-1)/2
        lo_i = (n - 1) // 2
        if n % 2 == 1:
            med = vals[lo_i]
        else:
            med = vals[lo_i] + 0.5 * (vals[lo_i + 1] - vals[lo_i])
        s_micro = sum(
            int(Decimal(str(v)).quantize(
                Decimal("0.000001"), ROUND_HALF_UP) * 10**6)
            for v in vals
        )
        mean = float((2 * s_micro + n) // (2 * n)) / 1e6
        r = rows[c]
        assert r["n"] == n
        assert r["median"] == pytest.approx(round(med, 6), abs=1e-9)
        assert r["lo"] == round(vals[0], 6)
        assert r["hi"] == round(vals[-1], 6)
        assert r["mean"] == pytest.approx(mean, abs=1e-12)


# -------------------------------------------- unpivot part metrics


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_unpivot_part_metrics_matches_reference(spark, sf_dir):
    """Wide-to-long stack + per-(brand, metric) stats recomputed from
    the definition on 2dp-quantized decimals."""
    from collections import defaultdict

    from de4ml_spark.queries.mldataq3 import unpivot_part_metrics

    con = _con(sf_dir)
    groups: dict = defaultdict(list)
    for brand, size, price in con.sql(
        "SELECT p_brand, p_size, p_retailprice FROM part"
    ).fetchall():
        groups[(brand, "size")].append(
            Decimal(int(size)).quantize(Decimal("0.01"))
        )
        groups[(brand, "retailprice")].append(
            Decimal(str(price)).quantize(Decimal("0.01"), ROUND_HALF_UP)
        )
    rows = unpivot_part_metrics(spark, sf_dir).collect()
    assert len(rows) == len(groups)
    for r in rows:
        vals = groups[(r["p_brand"], r["metric"])]
        assert r["n"] == len(vals)
        assert r["min_val"] == float(min(vals))
        assert r["max_val"] == float(max(vals))
        assert r["sum_val"] == float(sum(vals))
