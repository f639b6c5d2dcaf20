"""Round-9 catalog entries: algorithmic invariants BEYOND the DuckDB
value-hash gate (which proves cross-engine equality, not correctness) —
each statistic is recomputed driver-side in pure Python from the raw
sf0.001 rows and compared within float tolerance, plus structural
invariants (monotone survival, decile partition, closure bounds).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _events():
    con = duckdb.connect()
    return con.sql(
        f"""SELECT event_type, user_id, ts, event_id,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND event_type IS NOT NULL"""
    ).fetchall()


def test_welch_matches_python_recompute(spark):
    from de4ml_spark.queries.statq2 import welch_ttest_value

    rows = _events()
    by_type = defaultdict(list)
    for et, *_rest, v in rows:
        by_type[et].append(v / 100.0)
    got = {
        (r["type_a"], r["type_b"]): r
        for r in welch_ttest_value(spark, SF).collect()
    }
    for (a, b), r in got.items():
        xa, xb = by_type[a], by_type[b]
        ma = sum(xa) / len(xa)
        mb = sum(xb) / len(xb)
        va = sum((x - ma) ** 2 for x in xa) / (len(xa) - 1)
        vb = sum((x - mb) ** 2 for x in xb) / (len(xb) - 1)
        t = (ma - mb) / math.sqrt(va / len(xa) + vb / len(xb))
        assert r["n_a"] == len(xa) and r["n_b"] == len(xb)
        assert abs(r["mean_a"] - ma) < 1e-9
        assert abs(r["t_welch"] - t) < 1e-6


def test_anova_matches_python_recompute(spark):
    from de4ml_spark.queries.statq2 import anova_value_types

    rows = _events()
    by_type = defaultdict(list)
    for et, *_rest, v in rows:
        by_type[et].append(v)  # cents
    allv = [v for xs in by_type.values() for v in xs]
    gm = sum(allv) / len(allv)
    ssb = sum(
        len(xs) * (sum(xs) / len(xs) - gm) ** 2
        for xs in by_type.values()
    )
    ssw = sum(
        (v - sum(xs) / len(xs)) ** 2
        for xs in by_type.values()
        for v in xs
    )
    k, n = len(by_type), len(allv)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    row = anova_value_types(spark, SF).collect()[0]
    assert row["k_groups"] == k and row["n_tot"] == n
    assert abs(row["f_stat"] - f_ref) / max(f_ref, 1e-12) < 1e-6


def test_auc_is_normalized_rank_sum(spark):
    from de4ml_spark.queries.statq2 import auc_roc_events

    rows = _events()
    pos = sorted(v for et, *_r, v in rows if et == "purchase")
    neg = sorted(v for et, *_r, v in rows if et != "purchase")
    wins = ties = 0
    import bisect

    for p in pos:
        lo = bisect.bisect_left(neg, p)
        hi = bisect.bisect_right(neg, p)
        wins += lo
        ties += hi - lo
    auc_ref = (wins + 0.5 * ties) / (len(pos) * len(neg))
    row = auc_roc_events(spark, SF).collect()[0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert abs(row["auc"] - auc_ref) < 1e-12
    assert abs(row["gini"] - (2 * auc_ref - 1)) < 1e-12


def test_spearman_matches_python_midranks(spark):
    from de4ml_spark.queries.statq2 import spearman_quantity_price

    con = duckdb.connect()
    pts = con.sql(
        f"""SELECT CAST(CAST(l_quantity AS DECIMAL(18,2))*100 AS BIGINT),
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall()

    def midranks(vals):
        c = Counter(vals)
        out, cum = {}, 0
        for v in sorted(c):
            out[v] = cum + (c[v] + 1) / 2
            cum += c[v]
        return out

    rx = midranks([x for x, _ in pts])
    ry = midranks([y for _, y in pts])
    xs = [rx[x] for x, _ in pts]
    ys = [ry[y] for _, y in pts]
    n = len(pts)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in xs) * sum((b - my) ** 2 for b in ys)
    )
    row = spearman_quantity_price(spark, SF).collect()[0]
    assert row["n_tot"] == n
    assert abs(row["spearman_rho"] - num / den) < 1e-9


def test_kendall_matches_bruteforce(spark):
    from de4ml_spark.queries.statq2 import kendall_tau_events

    con = duckdb.connect()
    pts = con.sql(
        f"""SELECT CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)//5000,
            CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                 AS BIGINT)
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND event_type IS NOT NULL"""
    ).fetchall()
    c = d = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            s = (pts[i][0] - pts[j][0]) * (pts[i][1] - pts[j][1])
            c += s > 0
            d += s < 0
    n = len(pts)
    tx = Counter(x for x, _ in pts)
    ty = Counter(y for _, y in pts)
    n0 = n * (n - 1) / 2
    n1 = sum(t * (t - 1) / 2 for t in tx.values())
    n2 = sum(t * (t - 1) / 2 for t in ty.values())
    tau_ref = (c - d) / math.sqrt((n0 - n1) * (n0 - n2))
    row = kendall_tau_events(spark, SF).collect()[0]
    assert row["c_mass"] == c and row["d_mass"] == d
    assert abs(row["kendall_tau_b"] - tau_ref) < 1e-9


def test_lift_deciles_partition_and_gain(spark):
    from de4ml_spark.queries.mldataq5 import lift_deciles_events

    rows = lift_deciles_events(spark, SF).collect()
    assert sorted(r["decile"] for r in rows) == list(range(1, 11))
    n_tot = sum(r["n_d"] for r in rows)
    conv_tot = sum(r["conv_d"] for r in rows)
    assert n_tot == len(_events())
    last = max(rows, key=lambda r: r["decile"])
    assert abs(last["cum_gain"] - 1.0) < 1e-12
    base = conv_tot / n_tot
    for r in rows:
        assert abs(r["lift"] - (r["conv_d"] / r["n_d"]) / base) < 1e-9


def test_runs_test_matches_python(spark):
    from de4ml_spark.queries.statq2 import runs_test_value

    rows = sorted(_events(), key=lambda r: (r[2], r[3]))
    vals = [r[4] for r in rows]
    sv = sorted(vals)
    n = len(sv)
    med2 = sv[(n + 1) // 2 - 1] + sv[(n + 2) // 2 - 1]
    signs = [1 if 2 * v > med2 else 0 for v in vals if 2 * v != med2]
    runs_ref = 1 + sum(
        1 for a, b in zip(signs, signs[1:]) if a != b
    )
    n1, n2 = sum(signs), len(signs) - sum(signs)
    row = runs_test_value(spark, SF).collect()[0]
    assert (row["n1"], row["n2"], row["runs"]) == (n1, n2, runs_ref)
    mu = 1 + 2 * n1 * n2 / (n1 + n2)
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert abs(row["z_runs"] - (runs_ref - mu) / math.sqrt(var)) < 1e-9


def test_life_table_monotone(spark):
    from de4ml_spark.queries.statq2 import life_table_retention

    rows = sorted(
        life_table_retention(spark, SF).collect(), key=lambda r: r["i"]
    )
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_enter"] <= prev["n_enter"]
        if prev["logsurv_r"] is not None and cur["logsurv_r"] is not None:
            assert cur["logsurv_r"] <= prev["logsurv_r"] + 1e-12
    # interval accounting: everyone who entered i+1 survived interval i
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_enter"] == prev["n_enter"] - prev["d_i"] - prev["w_i"]


def test_khop_bounds_and_bfs_spotcheck(spark):
    from de4ml_spark.queries.graphq import khop_reach_parts

    got = {
        r["node"]: (r["n_1hop"], r["n_2hop"])
        for r in khop_reach_parts(spark, SF).collect()
    }
    con = duckdb.connect()
    edges = con.sql(
        f"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM '{SF}/lineitem.parquet')
            SELECT DISTINCT a.l_partkey, b.l_partkey
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey <> b.l_partkey"""
    ).fetchall()
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
    for node in list(got)[:20]:
        one = adj[node]
        two = set(one)
        for v in one:
            two |= adj[v]
        two.discard(node)
        assert got[node] == (len(one), len(two))
    for n1, n2 in got.values():
        assert n2 >= n1


def test_perm_entropy_bounded_and_patterns_valid(spark):
    from de4ml_spark.queries.statq2 import permutation_entropy_events

    rows = permutation_entropy_events(spark, SF).collect()
    assert 1 <= len(rows) <= 6
    h = rows[0]["perm_entropy"]
    assert 0.0 <= h <= math.log(6) + 1e-9
    # the two intransitive comparison combos (a>b>c with a<=c, and
    # a<=b<=c with a>c) cannot occur
    assert all(r["pattern"] in (0, 2, 3, 4, 5, 7) for r in rows)
    assert sum(r["n_p"] for r in rows) == rows[0]["n_triples"]


def test_power_law_alpha_matches_python(spark):
    from de4ml_spark.queries.graphq import power_law_alpha_parts

    con = duckdb.connect()
    degs = [
        d
        for (d,) in con.sql(
            f"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                            FROM '{SF}/lineitem.parquet'),
            e AS (SELECT DISTINCT a.l_partkey u, b.l_partkey v
                  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey)
            SELECT COUNT(*) FROM (
              SELECT u AS n FROM e UNION ALL SELECT v FROM e
            ) GROUP BY n"""
        ).fetchall()
    ]
    dmin = min(degs)
    alpha_ref = 1 + len(degs) / sum(math.log(d / dmin) for d in degs)
    row = power_law_alpha_parts(spark, SF).collect()[0]
    assert row["n_nodes"] == len(degs) and row["d_min"] == dmin
    assert abs(row["alpha_mle"] - alpha_ref) < 1e-4


def test_rake_phrases_exclude_stopwords(spark):
    from de4ml_spark.operators.text import STOPWORDS
    from de4ml_spark.queries.textq3 import rake_keywords_docs

    rows = rake_keywords_docs(spark, SF).collect()
    assert 0 < len(rows) <= 25
    for r in rows:
        assert r["rake_score"] > 0
        assert not set(r["phrase"].split()) & set(STOPWORDS)
    scores = [r["rake_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_brier_identity_and_ranges(spark):
    from de4ml_spark.queries.mldataq5 import brier_decomposition_events

    row = brier_decomposition_events(spark, SF).collect()[0]
    assert 0 <= row["uncertainty"] <= 0.25 + 1e-12
    assert row["reliability"] >= -1e-9
    assert row["resolution"] >= -1e-9
    assert abs(
        row["brier"]
        - (row["reliability"] - row["resolution"] + row["uncertainty"])
    ) < 1e-12


def test_psi_zero_on_identical_split(spark):
    """PSI of a distribution against itself is ~0 (smoothing keeps it
    finite); the catalog entry's value must be small and non-negative
    for the gently drifting synthetic log."""
    from de4ml_spark.queries.mldataq5 import psi_value_drift

    row = psi_value_drift(spark, SF).collect()[0]
    assert row["psi"] >= -1e-9
    assert row["psi"] < 1.0  # sanity ceiling for the synthetic log
    assert row["n_ref"] + row["n_cur"] == len(
        duckdb.connect()
        .sql(
            f"SELECT 1 FROM '{SF}/events.parquet' WHERE value IS NOT NULL"
        )
        .fetchall()
    )


def test_rolling_median_matches_python_for_one_user(spark):
    from de4ml_spark.queries.tsq2 import rolling_median_user_value

    rows = _events()
    uid = rows[0][1]
    seq = sorted(
        (r for r in rows if r[1] == uid), key=lambda r: (r[2], r[3])
    )
    got = {
        r["event_id"]: r["med7_c"]
        for r in rolling_median_user_value(spark, SF)
        .filter(f"user_id = {uid}")
        .collect()
    }
    for i, r in enumerate(seq):
        frame = sorted(v for *_x, v in seq[max(0, i - 6) : i + 1])
        n = len(frame)
        ref = (frame[(n + 1) // 2 - 1] + frame[(n + 2) // 2 - 1]) / 2.0
        assert got[r[3]] == ref


def test_grubbs_matches_python(spark):
    from de4ml_spark.queries.statq2 import grubbs_value_events

    vals = [(r[3], r[4]) for r in _events()]  # (event_id, cents)
    xs = [v for _, v in vals]
    n = len(xs)
    mean = sum(xs) / n
    s = math.sqrt(sum((x - mean) ** 2 for x in xs) / (n - 1))
    g_ref, id_ref = max(
        ((abs(x - mean) / s, -eid) for eid, x in vals)
    )
    row = grubbs_value_events(spark, SF).collect()[0]
    assert row["n_tot"] == n
    assert row["outlier_event_id"] == -id_ref
    assert abs(row["grubbs_g"] - g_ref) < 1e-9


def test_mcnemar_and_cochran_q_match_python(spark):
    from de4ml_spark.queries.statq2 import cochran_q_docs, mcnemar_docs

    con = duckdb.connect()
    flags = con.sql(
        f"""SELECT n_chars >= 300,
                   len(string_split(text, ' ')) >= 50,
                   n_chars >= 4 * len(string_split(text, ' '))
            FROM '{SF}/documents.parquet'"""
    ).fetchall()
    b = sum(1 for a, bb, _ in flags if a and not bb)
    c = sum(1 for a, bb, _ in flags if not a and bb)
    row = mcnemar_docs(spark, SF).collect()[0]
    assert (row["b_only_a"], row["c_only_b"]) == (b, c)
    assert abs(row["chi2_mcnemar"] - (b - c) ** 2 / (b + c)) < 1e-9

    k = 3
    cs = [sum(f[j] for f in flags) for j in range(k)]
    rs = [sum(f) for f in flags]
    t = sum(rs)
    q_ref = (
        (k - 1) * (k * sum(x * x for x in cs) - t * t)
        / (k * t - sum(r * r for r in rs))
    )
    rowq = cochran_q_docs(spark, SF).collect()[0]
    assert [rowq["c1"], rowq["c2"], rowq["c3"]] == cs
    assert abs(rowq["cochran_q"] - q_ref) < 1e-9


def test_cochran_armitage_matches_python(spark):
    from de4ml_spark.queries.statq2 import cochran_armitage_trend

    per = defaultdict(lambda: [0, 0])
    for et, *_r, v in _events():
        s = v // 5000
        per[s][0] += 1
        per[s][1] += et == "purchase"
    n_tot = sum(n for n, _ in per.values())
    g_tot = sum(g for _, g in per.values())
    sg = sum(s * g for s, (_, g) in per.items())
    sn = sum(s * n for s, (n, _) in per.items())
    ssn = sum(s * s * n for s, (n, _) in per.items())
    num = n_tot * (n_tot * sg - g_tot * sn) ** 2
    den = g_tot * (n_tot - g_tot) * (n_tot * ssn - sn * sn) / n_tot
    row = cochran_armitage_trend(spark, SF).collect()[0]
    assert (row["n_tot"], row["g_tot"]) == (n_tot, g_tot)
    assert abs(row["chi2_trend"] - num / den) / (num / den) < 1e-9


def test_friedman_matches_python(spark):
    from de4ml_spark.queries.statq2 import friedman_daily_value

    cells = defaultdict(dict)
    for et, _uid, ts, _eid, v in _events():
        cells[ts.date()].setdefault(et, []).append(v)
    k = len({et for d in cells.values() for et in d})
    full = {d: m for d, m in cells.items() if len(m) == k}
    rsum = Counter()
    for d, m in full.items():
        means = sorted(
            (sum(xs) / len(xs), et) for et, xs in m.items()
        )
        for r, (_mean, et) in enumerate(means, 1):
            rsum[et] += r
    n = len(full)
    chi_ref = 12 / (n * k * (k + 1)) * sum(
        r * r for r in rsum.values()
    ) - 3 * n * (k + 1)
    row = friedman_daily_value(spark, SF).collect()[0]
    assert (row["n_days"], row["k_types"]) == (n, k)
    assert abs(row["chi2_friedman"] - chi_ref) < 1e-6


def test_jonckheere_matches_bruteforce(spark):
    from de4ml_spark.queries.statq2 import jonckheere_value

    groups = defaultdict(list)
    for et, *_r, v in _events():
        groups[et].append(v)
    names = sorted(groups)
    jt2 = 0
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            for x in groups[names[i]]:
                for y in groups[names[j]]:
                    jt2 += 2 * (x < y) + (x == y)
    row = jonckheere_value(spark, SF).collect()[0]
    assert row["jt2"] == jt2
    n = sum(len(g) for g in groups.values())
    e2 = (n * n - sum(len(g) ** 2 for g in groups.values())) // 2
    assert row["e2"] == e2
    # tie-corrected variance (Hollander-Wolfe), recomputed independently
    ni = [len(g) for g in groups.values()]
    tj = list(Counter(v for g in groups.values() for v in g).values())
    a = (
        n * (n - 1) * (2 * n + 5)
        - sum(x * (x - 1) * (2 * x + 5) for x in ni)
        - sum(x * (x - 1) * (2 * x + 5) for x in tj)
    )
    b = (
        sum(x * (x - 1) * (x - 2) for x in ni)
        * sum(x * (x - 1) * (x - 2) for x in tj)
    )
    c = sum(x * (x - 1) for x in ni) * sum(x * (x - 1) for x in tj)
    var = (
        a / 72
        + b / (36 * n * (n - 1) * (n - 2))
        + c / (8 * n * (n - 1))
    )
    z = ((jt2 - e2) / 2) / math.sqrt(var)
    assert abs(row["z_jt"] - z) < 1e-9


def test_goertzel_matches_python(spark):
    from de4ml_spark.queries.tsq2 import goertzel_weekly_events

    daily = Counter()
    for et, _uid, ts, *_r in _events():
        daily[(et, ts.date())] += 1
    ref = {}
    for et in {k[0] for k in daily}:
        sc = ss = 0.0
        for (e, d), c in daily.items():
            if e != et:
                continue
            th = 2 * math.pi * (d.toordinal() - 719163) % 7  # noqa
            k7 = (d.toordinal() - 719163) % 7
            ang = 2 * math.pi * k7 / 7
            sc += c * math.cos(ang)
            ss += c * math.sin(ang)
        ref[et] = sc * sc + ss * ss
    for r in goertzel_weekly_events(spark, SF).collect():
        # quantization at 1e-6 per day-term: |err| bounded well under
        # 1e-3 relative for these magnitudes
        assert abs(r["weekly_power"] - ref[r["event_type"]]) < max(
            1e-6, 1e-6 * abs(ref[r["event_type"]])
        ) + 1e-3


def test_hurst_matches_python(spark):
    from de4ml_spark.queries.tsq2 import hurst_value_events

    seqs = defaultdict(list)
    for et, _uid, ts, eid, v in sorted(
        _events(), key=lambda r: (r[2], r[3])
    ):
        seqs[et].append(v)
    ref = {}
    for et, xs in seqs.items():
        ys = {}
        for n in (8, 16, 32, 64):
            lns = []
            for b0 in range(0, len(xs) - n + 1, n):
                blk = xs[b0 : b0 + n]
                s = sum(blk)
                pre = 0
                devs = []
                for j, x in enumerate(blk):
                    pre += x
                    devs.append(n * pre - (j + 1) * s)
                r_scaled = max(devs) - min(devs)
                vnum = n * sum(x * x for x in blk) - s * s
                if r_scaled > 0 and vnum > 0:
                    lns.append(
                        math.log(r_scaled) - math.log(vnum) / 2
                    )
            if lns:
                ys[n] = sum(lns) / len(lns)
        if len(ys) == 4:
            ref[et] = (
                -1.5 * ys[8] - 0.5 * ys[16] + 0.5 * ys[32] + 1.5 * ys[64]
            ) / (5 * math.log(2))
    for r in hurst_value_events(spark, SF).collect():
        if r["hurst"] is not None and r["event_type"] in ref:
            assert abs(r["hurst"] - ref[r["event_type"]]) < 1e-5


def test_cramers_v_matches_python(spark):
    from de4ml_spark.queries.statq2 import cramers_v_events

    cells = Counter()
    for et, _uid, ts, *_r in _events():
        cells[(et, (ts.date().toordinal() - 719163) % 7)] += 1
    n = sum(cells.values())
    rows = Counter()
    cols = Counter()
    for (et, dw), o in cells.items():
        rows[et] += o
        cols[dw] += o
    chi2 = (
        n * sum(o * o / (rows[et] * cols[dw])
                for (et, dw), o in cells.items())
        - n
    )
    v_ref = math.sqrt(
        chi2 / (n * min(len(rows) - 1, len(cols) - 1))
    )
    row = cramers_v_events(spark, SF).collect()[0]
    assert (row["n_rows"], row["n_cols"], row["n_tot"]) == (
        len(rows), len(cols), n,
    )
    # the entry quantizes each o²/(r·c) term at pico precision
    assert abs(row["chi2"] - chi2) < 1e-3
    assert abs(row["cramers_v"] - v_ref) < 1e-6


def test_brown_forsythe_matches_python(spark):
    from de4ml_spark.queries.statq2 import brown_forsythe_value

    by_type = defaultdict(list)
    for et, *_r, v in _events():
        by_type[et].append(v)
    zs = {}
    for et, xs in by_type.items():
        s = sorted(xs)
        n = len(s)
        med2 = s[(n + 1) // 2 - 1] + s[(n + 2) // 2 - 1]
        zs[et] = [abs(2 * x - med2) for x in xs]
    allz = [z for v in zs.values() for z in v]
    gm = sum(allz) / len(allz)
    ssb = sum(
        len(v) * (sum(v) / len(v) - gm) ** 2 for v in zs.values()
    )
    ssw = sum(
        (z - sum(v) / len(v)) ** 2 for v in zs.values() for z in v
    )
    k, n = len(zs), len(allz)
    w_ref = (ssb / (k - 1)) / (ssw / (n - k))
    row = brown_forsythe_value(spark, SF).collect()[0]
    assert (row["k_groups"], row["n_tot"]) == (k, n)
    assert abs(row["w_stat"] - w_ref) / w_ref < 1e-6


def test_cliffs_delta_matches_bruteforce(spark):
    from de4ml_spark.queries.statq2 import cliffs_delta_value

    by_type = defaultdict(list)
    for et, *_r, v in _events():
        by_type[et].append(v)
    got = {
        (r["type_a"], r["type_b"]): r
        for r in cliffs_delta_value(spark, SF).collect()
    }
    for (a, b), r in got.items():
        xa, xb = sorted(by_type[a]), by_type[b]
        import bisect

        num = 0
        for y in xb:
            num += (len(xa) - bisect.bisect_right(xa, y)) - (
                bisect.bisect_left(xa, y)
            )
        # num counts (a > b) − (a < b)
        d_ref = num / (len(xa) * len(xb))
        assert abs(r["cliffs_delta"] - d_ref) < 1e-12


def test_pr_auc_matches_python_block_convention(spark):
    from de4ml_spark.queries.statq2 import pr_auc_events

    hist = defaultdict(lambda: [0, 0])
    for et, *_r, v in _events():
        hist[v][et == "purchase"] += 1
    tp = fp = 0
    ap = 0.0
    n_pos = sum(p for _q, p in hist.values())
    for v in sorted(hist, reverse=True):
        q, p = hist[v]
        tp += p
        fp += q
        ap += p / n_pos * (tp / (tp + fp))
    row = pr_auc_events(spark, SF).collect()[0]
    assert row["n_pos"] == n_pos
    # per-block micro quantization: |err| <= #blocks * 1e-6 / n_pos
    assert abs(row["average_precision"] - ap) < 1e-4


def test_js_divergence_matches_python(spark):
    from de4ml_spark.queries.mldataq5 import js_divergence_sources

    con = duckdb.connect()
    pts = con.sql(
        f"SELECT source, n_chars // 50 FROM '{SF}/documents.parquet'"
    ).fetchall()
    pool = Counter(b for _s, b in pts)
    n_pool = sum(pool.values())
    per = defaultdict(Counter)
    for s, b in pts:
        per[s][b] += 1
    for r in js_divergence_sources(spark, SF).collect():
        src = r["source"]
        ns = sum(per[src].values())
        js = 0.0
        for b, d in pool.items():
            c = per[src].get(b, 0)
            p = c / ns
            q = d / n_pool
            m = (p + q) / 2
            if p > 0:
                js += 0.5 * p * math.log(p / m)
            js += 0.5 * q * math.log(q / m)
        assert abs(r["js_divergence"] - js) < 1e-4


def test_woe_iv_and_psi_match_python(spark):
    from de4ml_spark.queries.mldataq5 import (
        psi_value_drift,
        woe_iv_events,
    )

    per = defaultdict(lambda: [0, 0])
    for et, _u, ts, _e, v in _events():
        per[v // 5000][et == "purchase"] += 1
    k = len(per)
    g_raw = sum(g for _b, g in per.values())
    b_raw = sum(b for b, _g in per.values())
    gt, bt = 2 * g_raw + k, 2 * b_raw + k
    iv = 0.0
    woe_ref = {}
    for bk, (bad, good) in per.items():
        gs, bs = 2 * good + 1, 2 * bad + 1
        w = math.log((gs * bt) / (bs * gt))
        woe_ref[bk] = w
        iv += (gs / gt - bs / bt) * w
    rows = woe_iv_events(spark, SF).collect()
    for r in rows:
        assert abs(r["woe"] - woe_ref[r["bucket"]]) < 1e-6
        assert abs(r["iv_total"] - iv) < 1e-4

    split = defaultdict(lambda: [0, 0])
    for _et, _u, ts, _e, v in _eventsv():
        split[v // 5000][ts < _PSI_TS] += 1
    kk = len(split)
    a_raw = sum(a for _b, a in split.values())
    c_raw = sum(b for b, _a in split.values())
    at, ct = 2 * a_raw + kk, 2 * c_raw + kk
    psi = 0.0
    for bk, (cur, ref) in split.items():
        p = (2 * ref + 1) / at
        q = (2 * cur + 1) / ct
        psi += (p - q) * math.log(p / q)
    row = psi_value_drift(spark, SF).collect()[0]
    assert abs(row["psi"] - psi) < 1e-6


import datetime

_PSI_TS = datetime.datetime(2024, 1, 16)


def _eventsv():
    con = duckdb.connect()
    return con.sql(
        f"""SELECT event_type, user_id, ts, event_id,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c
            FROM '{SF}/events.parquet' WHERE value IS NOT NULL"""
    ).fetchall()


def test_life_table_logsurv_matches_python(spark):
    from de4ml_spark.queries.statq2 import life_table_retention

    con = duckdb.connect()
    spans = con.sql(
        f"""SELECT MIN(CAST(ts AS DATE)) d0, MAX(CAST(ts AS DATE)) d1
            FROM '{SF}/events.parquet' WHERE user_id IS NOT NULL
            GROUP BY user_id"""
    ).fetchall()
    hmax = max(d1 for _d0, d1 in spans)
    users = [
        ((d1 - d0).days // 7, d1 < hmax) for d0, d1 in spans
    ]
    rows = sorted(
        life_table_retention(spark, SF).collect(), key=lambda r: r["i"]
    )
    cum = 0.0
    for r in rows:
        i = r["i"]
        n_enter = sum(1 for iv, _c in users if iv >= i)
        d_i = sum(1 for iv, c in users if iv == i and c)
        w_i = sum(1 for iv, c in users if iv == i and not c)
        assert (r["n_enter"], r["d_i"], r["w_i"]) == (n_enter, d_i, w_i)
        n2 = 2 * n_enter - w_i
        if n2 > 2 * d_i:
            cum += math.log(n2 / (n2 - 2 * d_i))
            if r["logsurv_r"] is not None:
                assert abs(r["logsurv_r"] + cum) < 1e-5


def test_rich_club_matches_python(spark):
    from de4ml_spark.queries.graphq import rich_club_parts

    con = duckdb.connect()
    edges = con.sql(
        f"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM '{SF}/lineitem.parquet')
            SELECT DISTINCT a.l_partkey, b.l_partkey
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey"""
    ).fetchall()
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    for r in rich_club_parts(spark, SF).collect():
        k = r["k"]
        rich = {n for n, d in deg.items() if d > k}
        ek = sum(1 for u, v in edges if u in rich and v in rich)
        assert (r["n_k"], r["e_k"]) == (len(rich), ek)
        if len(rich) >= 2:
            phi = 2 * ek / (len(rich) * (len(rich) - 1))
            assert abs(r["phi"] - phi) < 1e-12
        else:
            assert r["phi"] is None


def test_simpson_matches_python(spark):
    from de4ml_spark.queries.textq3 import simpson_diversity_sources

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    vocab = defaultdict(Counter)
    for s, t in docs:
        vocab[s].update(t.split(" "))
    for r in simpson_diversity_sources(spark, SF).collect():
        c = vocab[r["source"]]
        t = sum(c.values())
        lam = sum(x * (x - 1) for x in c.values()) / (t * (t - 1))
        assert r["t_tokens"] == t
        assert abs(r["simpson_lambda"] - lam) < 1e-12
        assert abs(r["simpson_diversity"] - (1 - lam)) < 1e-12


def test_silhouette_matches_python(spark):
    from de4ml_spark.queries.simq import silhouette_embeddings

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, label, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    pts = {
        vid: (lab, [math.floor(x * 1e6 + 0.5) for x in vec])
        for vid, lab, vec in rows
    }
    sums = defaultdict(lambda: [0] * 64)
    cnt = Counter()
    for lab, vec in pts.values():
        cnt[lab] += 1
        for i, x in enumerate(vec):
            sums[lab][i] += x
    # both engines' integer division TRUNCATES toward zero (DuckDB's
    # // included — measured -11//6 = -1), unlike Python's floor //
    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    cent = {
        lab: [tdiv(2 * s + cnt[lab], 2 * cnt[lab]) for s in sums[lab]]
        for lab in sums
    }
    per_label = defaultdict(list)
    for lab, vec in pts.values():
        d = {
            cl: sum((a - b) ** 2 for a, b in zip(vec, c))
            for cl, c in cent.items()
        }
        a_sq = d[lab]
        b_sq = min(v for cl, v in d.items() if cl != lab)
        s = (math.sqrt(b_sq) - math.sqrt(a_sq)) / math.sqrt(
            max(a_sq, b_sq)
        )
        per_label[lab].append(math.floor(s * 1e6 + 0.5))
    for r in silhouette_embeddings(spark, SF).collect():
        ss = per_label[r["label"]]
        assert r["n_vecs"] == len(ss)
        assert abs(
            r["mean_silhouette"] - sum(ss) / (len(ss) * 1e6)
        ) < 1e-12


def test_ndcg_matches_python(spark):
    from de4ml_spark.queries.mldataq5 import (
        NDCG_K,
        ndcg_at_k_orders,
    )

    con = duckdb.connect()
    orders = con.sql(
        f"""SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE)
            FROM '{SF}/orders.parquet'"""
    ).fetchall()
    li = con.sql(
        f"SELECT l_orderkey, l_partkey FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    days = [d for *_r, d in orders]
    span = (max(days) - min(days)).days
    split = min(days) + __import__("datetime").timedelta(
        days=span * 3 // 4
    )
    train_ok = {ok for ok, _c, d in orders if d <= split}
    test_by_cust = defaultdict(set)
    cust = {ok: c for ok, c, _d in orders}
    pop = Counter()
    for ok, pk in li:
        if ok in train_ok:
            pop[pk] += 1
        elif ok in cust:
            test_by_cust[cust[ok]].add(pk)
    top = sorted(pop.items(), key=lambda kv: (-kv[1], kv[0]))[:NDCG_K]
    pos_of = {pk: i + 1 for i, (pk, _c) in enumerate(top)}
    gain = [
        math.floor(1e6 / math.log2(p + 1) + 0.5)
        for p in range(1, NDCG_K + 1)
    ]
    ideal = [sum(gain[: i + 1]) for i in range(NDCG_K)]

    def tdiv_halfup(a, b):
        return (2 * a + b) // (2 * b)

    total_u = 0
    n_cust = 0
    for c, held in test_by_cust.items():
        if not held:
            continue
        n_cust += 1
        dcg_u = sum(gain[pos_of[pk] - 1] for pk in held if pk in pos_of)
        idcg_u = ideal[min(len(held), NDCG_K) - 1]
        total_u += tdiv_halfup(dcg_u * 1_000_000, idcg_u)
    row = ndcg_at_k_orders(spark, SF).collect()[0]
    assert row["n_customers"] == n_cust
    assert row["sum_ndcg_u"] == total_u


def test_ece_matches_python(spark):
    from de4ml_spark.operators.portable_hash import phash_duck_sql
    from de4ml_spark.queries.profileq2 import ece_events

    con = duckdb.connect()
    scored = con.sql(
        f"""SELECT {phash_duck_sql("CAST(event_id AS VARCHAR)", 40)}
                   % 1000,
                   event_type = 'click'
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    bins = defaultdict(lambda: [0, 0, 0])
    for s, pos in scored:
        b = bins[s // 100]
        b[0] += 1
        b[1] += bool(pos)
        b[2] += s
    n_tot = sum(b[0] for b in bins.values())
    ece = sum(
        abs(sm - 1000 * np) for _n, np, sm in bins.values()
    ) / (1000 * n_tot)
    mce = max(
        abs(sm / (1000 * n) - np / n) for n, np, sm in bins.values()
    )
    row = ece_events(spark, SF).collect()[0]
    assert row["n_tot"] == n_tot
    assert abs(row["ece"] - ece) < 1e-12
    assert abs(row["mce"] - mce) < 1e-3  # milli-quantized max


def test_gumbel_matches_python(spark):
    from de4ml_spark.queries.tsq2 import gumbel_weekly_maxima

    daily = Counter()
    for _et, _u, ts, _e, v in _eventsv():
        daily[ts.date()] += v
    weekly = defaultdict(int)
    for d, c in daily.items():
        wk = (d.toordinal() - 719163) // 7
        weekly[wk] = max(weekly[wk], c)
    xs = list(weekly.values())
    n = len(xs)
    m = sum(xs) / n / 100.0
    s = math.sqrt(
        (n * sum(x * x for x in xs) - sum(xs) ** 2)
        / (n * (n - 1))
    ) / 100.0
    beta = math.sqrt(6) / math.pi * s
    mu = m - 0.5772156649015329 * beta
    rl = mu - beta * math.log(-math.log(1 - 1 / 52))
    row = gumbel_weekly_maxima(spark, SF).collect()[0]
    assert row["n_w"] == n
    assert abs(row["mean_weekly_max"] - m) < 1e-9
    assert abs(row["sd_weekly_max"] - s) < 1e-6
    assert abs(row["return_level_52w"] - rl) < 1e-6


def _part_revenue_e4():
    con = duckdb.connect()
    return dict(
        con.sql(
            f"""SELECT l_partkey,
                CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2))))
                     AS DECIMAL(38,4)) * 10000 AS BIGINT)
                FROM '{SF}/lineitem.parquet' GROUP BY 1"""
        ).fetchall()
    )


def test_theil_matches_python(spark):
    from de4ml_spark.queries.relational3 import theil_index_parts

    revs = list(_part_revenue_e4().values())
    n = len(revs)
    x_tot = sum(revs)
    t_ref = sum(
        (x / x_tot) * math.log(x * n / x_tot) for x in revs if x > 0
    )
    row = theil_index_parts(spark, SF).collect()[0]
    assert (row["n_parts"], row["x_tot"]) == (n, x_tot)
    assert abs(row["theil_t"] - t_ref) < 1e-5


def test_hhi_matches_python(spark):
    from de4ml_spark.queries.relational3 import hhi_supplier_revenue

    con = duckdb.connect()
    revs = [
        r
        for (r,) in con.sql(
            f"""SELECT CAST(CAST(SUM(CAST(l_extendedprice
                 AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2))))
                 AS DECIMAL(38,4)) * 10000 AS BIGINT)
                FROM '{SF}/lineitem.parquet' GROUP BY l_suppkey"""
        ).fetchall()
    ]
    s = sum(revs)
    hhi = sum(x * x for x in revs) / (s * s)
    row = hhi_supplier_revenue(spark, SF).collect()[0]
    assert row["n_suppliers"] == len(revs)
    assert abs(row["hhi"] - hhi) < 1e-12
    assert abs(row["effective_suppliers"] - 1 / hhi) < 1e-9


def test_katz_matches_python(spark):
    from de4ml_spark.queries.graphq import (
        KATZ_ALPHA_DIV,
        KATZ_ITERS,
        KATZ_SCALE,
        katz_centrality_parts,
    )

    con = duckdb.connect()
    edges = con.sql(
        f"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM '{SF}/lineitem.parquet')
            SELECT DISTINCT a.l_partkey, b.l_partkey
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey <> b.l_partkey"""
    ).fetchall()
    inn = defaultdict(list)
    nodes = set()
    for u, v in edges:
        inn[v].append(u)
        nodes.add(u)
        nodes.add(v)

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    s = {n: KATZ_SCALE for n in nodes}
    for _ in range(KATZ_ITERS):
        s = {
            n: KATZ_SCALE
            + tdiv(sum(s[u] for u in inn[n]), KATZ_ALPHA_DIV)
            for n in nodes
        }
    top = sorted(s.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = sorted(
        katz_centrality_parts(spark, SF).collect(),
        key=lambda r: r["rank"],
    )
    for r, (node, score) in zip(got, top):
        assert (r["part_key"], r["katz"]) == (node, score)


def test_term_burstiness_matches_python(spark):
    from de4ml_spark.queries.textq3 import term_burstiness_docs

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    n_docs = len(docs)
    per = defaultdict(Counter)
    for did, t in docs:
        for w in t.split(" "):
            per[w][did] += 1
    for r in term_burstiness_docs(spark, SF).collect():
        tfs = per[r["term"]]
        s = sum(tfs.values())
        ss = sum(v * v for v in tfs.values())
        d_ref = (n_docs * ss - s * s) / (n_docs * s)
        assert r["total_tf"] == s
        assert r["n_occ_docs"] == len(tfs)
        assert abs(r["dispersion"] - d_ref) < 1e-9


def test_interarrival_burstiness_matches_python(spark):
    from de4ml_spark.queries.statq2 import (
        interarrival_burstiness_events,
    )

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)), event_id
            FROM '{SF}/events.parquet' WHERE event_type IS NOT NULL
            ORDER BY event_type, 2, 3"""
    ).fetchall()
    seqs = defaultdict(list)
    for et, t, _e in rows:
        seqs[et].append(t)
    for r in interarrival_burstiness_events(spark, SF).collect():
        ts = seqs[r["event_type"]]
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        n = len(gaps)
        mu = sum(gaps) / n
        sd = math.sqrt(
            (n * sum(g * g for g in gaps) - sum(gaps) ** 2)
            / (n * (n - 1))
        )
        assert r["n_gaps"] == n
        assert abs(r["mean_gap_us"] - mu) < 1e-6
        assert abs(r["burstiness"] - (sd - mu) / (sd + mu)) < 1e-9


def test_mann_kendall_matches_python(spark):
    from de4ml_spark.queries.statq2 import mann_kendall_daily_events

    daily = Counter()
    for _et, _u, ts, *_r in _eventsv():
        daily[ts.date()] += 1
    # _eventsv filters NULL values; MK counts ALL events per day
    con = duckdb.connect()
    daily = dict(
        con.sql(
            f"""SELECT CAST(ts AS DATE), CAST(COUNT(*) AS BIGINT)
            FROM '{SF}/events.parquet' GROUP BY 1"""
        ).fetchall()
    )
    days = sorted(daily)
    cs = [daily[d] for d in days]
    s = sum(
        (cs[j] > cs[i]) - (cs[j] < cs[i])
        for i in range(len(cs))
        for j in range(i + 1, len(cs))
    )
    n = len(cs)
    ties = Counter(cs)
    var = (
        n * (n - 1) * (2 * n + 5)
        - sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    ) / 18
    z = (s - (1 if s > 0 else -1 if s < 0 else 0)) / math.sqrt(var)
    row = mann_kendall_daily_events(spark, SF).collect()[0]
    assert (row["n_days"], row["s_stat"]) == (n, s)
    assert abs(row["z_mk"] - z) < 1e-9


def test_turning_points_matches_python(spark):
    from de4ml_spark.queries.statq2 import turning_points_value

    rows = sorted(_events(), key=lambda r: (r[2], r[3]))
    vs = [r[4] for r in rows]
    tp = sum(
        1
        for i in range(1, len(vs) - 1)
        if (vs[i] > vs[i - 1] and vs[i] > vs[i + 1])
        or (vs[i] < vs[i - 1] and vs[i] < vs[i + 1])
    )
    n = len(vs)
    z = (tp - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90)
    row = turning_points_value(spark, SF).collect()[0]
    assert (row["n_tot"], row["n_turning"]) == (n, tp)
    assert abs(row["z_turning"] - z) < 1e-9


def test_bartlett_matches_python(spark):
    from de4ml_spark.queries.statq2 import bartlett_value_types

    by_type = defaultdict(list)
    for et, *_r, v in _events():
        by_type[et].append(v)
    k = len(by_type)
    n_tot = sum(len(xs) for xs in by_type.values())
    # replicate the entry's quantized pipeline exactly: per-group
    # ln s_i^2 and the pooled term are micro-floor(x+0.5) integers
    wsum_u = 0
    h_sum_u = 0
    sp2_num = 0
    for xs in by_type.values():
        n = len(xs)
        s = sum(xs)
        ss = sum(x * x for x in xs)
        vnum = n * ss - s * s
        ln_si_u = math.floor(
            (math.log(vnum) - math.log(n * (n - 1))) * 1e6 + 0.5
        )
        wsum_u += (n - 1) * ln_si_u
        h_sum_u += (2 * 1_000_000 + (n - 1)) // (2 * (n - 1))
        sp2_num += (2 * vnum + n) // (2 * n)
    ln_sp_u = math.floor(
        (math.log(sp2_num) - math.log(n_tot - k)) * 1e6 + 0.5
    )
    chi_num = ((n_tot - k) * ln_sp_u - wsum_u) / 1e6
    c_corr = 1 + (h_sum_u / 1e6 - 1 / (n_tot - k)) / (3 * (k - 1))
    row = bartlett_value_types(spark, SF).collect()[0]
    assert (row["k_groups"], row["n_tot"]) == (k, n_tot)
    # math.log vs portable ln: ≤1 micro-unit per quantized term
    assert row["chi2_bartlett"] == pytest.approx(
        chi_num / c_corr, abs=2e-4
    )


def test_jarque_bera_matches_python(spark):
    from de4ml_spark.queries.statq2 import jarque_bera_value

    vs = [v for *_r, v in _eventsv()]
    n = len(vs)
    m = sum(vs) / n
    m2 = sum((x - m) ** 2 for x in vs) / n
    m3 = sum((x - m) ** 3 for x in vs) / n
    m4 = sum((x - m) ** 4 for x in vs) / n
    skew = m3 / m2**1.5
    kurt = m4 / m2**2
    jb = n / 6 * (skew**2 + (kurt - 3) ** 2 / 4)
    row = jarque_bera_value(spark, SF).collect()[0]
    assert row["n_tot"] == n
    assert abs(row["skewness"] - skew) < 1e-9
    assert abs(row["kurtosis"] - kurt) < 1e-9
    assert abs(row["jarque_bera"] - jb) / jb < 1e-9


def test_durbin_watson_matches_python(spark):
    from de4ml_spark.queries.statq2 import (
        durbin_watson_daily_events,
    )

    con = duckdb.connect()
    daily = dict(
        con.sql(
            f"""SELECT CAST(ts AS DATE), CAST(COUNT(*) AS BIGINT)
            FROM '{SF}/events.parquet' GROUP BY 1"""
        ).fetchall()
    )
    days = sorted(daily)
    m = sum(daily.values()) / len(days)
    es = [daily[d] - m for d in days]
    import datetime as _dt

    num = sum(
        (daily[d + _dt.timedelta(days=1)] - daily[d]) ** 2
        for d in days
        if d + _dt.timedelta(days=1) in daily
    )
    den = sum(e * e for e in es)
    row = durbin_watson_daily_events(spark, SF).collect()[0]
    assert row["n_days"] == len(days)
    assert abs(row["durbin_watson"] - num / den) < 1e-9


def test_g_test_matches_python(spark):
    from de4ml_spark.queries.statq2 import g_test_events

    cells = Counter()
    con = duckdb.connect()
    for et, dw, o in con.sql(
        f"""SELECT event_type,
            date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7,
            COUNT(*)
            FROM '{SF}/events.parquet'
            WHERE event_type IS NOT NULL GROUP BY 1, 2"""
    ).fetchall():
        cells[(et, dw)] = o
    n = sum(cells.values())
    rows = Counter()
    cols = Counter()
    for (et, dw), o in cells.items():
        rows[et] += o
        cols[dw] += o
    g = 2 * sum(
        o * math.log(o * n / (rows[et] * cols[dw]))
        for (et, dw), o in cells.items()
    )
    row = g_test_events(spark, SF).collect()[0]
    assert row["n_tot"] == n
    # per-cell micro quantization of the weighted ln
    assert abs(row["g_stat"] - g) < 1e-2


def test_wilcoxon_matches_python(spark):
    from de4ml_spark.queries.statq2 import wilcoxon_signed_daily

    con = duckdb.connect()
    daily = con.sql(
        f"""SELECT CAST(ts AS DATE),
            SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            - SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            FROM '{SF}/events.parquet'
            WHERE event_type IN ('view', 'click') GROUP BY 1"""
    ).fetchall()
    ds = [d for _day, d in daily if d != 0]
    n = len(ds)
    order = sorted(abs(d) for d in ds)
    midrank = {}
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and order[j] == order[i]:
            j += 1
        for v in {order[i]}:
            midrank[v] = (i + 1 + j) / 2
        i = j
    w_plus = sum(midrank[abs(d)] for d in ds if d > 0)
    ties = Counter(abs(d) for d in ds)
    var = n * (n + 1) * (2 * n + 1) / 24 - sum(
        t**3 - t for t in ties.values()
    ) / 48
    z = (w_plus - n * (n + 1) / 4) / math.sqrt(var)
    row = wilcoxon_signed_daily(spark, SF).collect()[0]
    assert row["n_nz"] == n
    assert row["w_plus_x2"] == round(2 * w_plus)
    assert abs(row["z_wilcoxon"] - z) < 1e-9
