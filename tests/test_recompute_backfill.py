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
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
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
