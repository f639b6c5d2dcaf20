"""Round-9b catalog entries: pure-Python recomputation from the raw
sf0.001 rows — the guard the cross-engine value-hash gate cannot
provide (a shared-formula error passes the hash on both engines; see
the welch/grubbs round-9 incidents).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

SF = "/root/testdata/sf0.001"


def _events():
    con = duckdb.connect()
    return con.sql(
        f"""SELECT event_type, user_id, ts, event_id,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND event_type IS NOT NULL"""
    ).fetchall()


def _daily_counts():
    con = duckdb.connect()
    return dict(
        con.sql(
            f"""SELECT CAST(ts AS DATE) AS day, COUNT(*)
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"""
        ).fetchall()
    )


def test_ks_two_sample_matches_python(spark):
    from de4ml_spark.queries.statq3 import ks_two_sample_value

    a = sorted(v for et, *_r, v in _events() if et == "click")
    b = sorted(v for et, *_r, v in _events() if et == "purchase")
    row = ks_two_sample_value(spark, SF).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    # brute-force ECDF over the pooled support
    support = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    dnum = 0
    for v in support:
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        dnum = max(dnum, abs(ca * nb - cb * na))
    assert row["d_num"] == dnum
    d = dnum / (na * nb)
    assert abs(row["ks_d"] - d) < 1e-12
    assert abs(row["ks_scaled"] - d * math.sqrt(na * nb / (na + nb))) < 1e-9


def test_mood_median_matches_python(spark):
    from de4ml_spark.queries.statq3 import mood_median_value

    rows = _events()
    allv = sorted(v for *_r, v in rows)
    n = len(allv)
    # lower median: smallest v with 2*cum >= n
    cum = 0
    med = None
    counts = Counter(allv)
    for v in sorted(counts):
        cum += counts[v]
        if 2 * cum >= n:
            med = v
            break
    row = mood_median_value(spark, SF).collect()[0]
    assert row["grand_median_c"] == med
    # 2xk table, ties lump below (above = v > med)
    table = defaultdict(lambda: [0, 0])
    for et, *_r, v in rows:
        table[et][1 if v > med else 0] += 1
    k = len(table)
    assert row["k_types"] == k and row["n_tot"] == n
    col = [sum(t[j] for t in table.values()) for j in (0, 1)]
    chi2 = 0.0
    for t in table.values():
        r = t[0] + t[1]
        for j in (0, 1):
            e = r * col[j] / n
            chi2 += (t[j] - e) ** 2 / e
    assert abs(row["chi2_mood"] - chi2) < 1e-5


def test_pettitt_matches_python(spark):
    from de4ml_spark.queries.statq3 import pettitt_change_daily

    daily = _daily_counts()
    days = sorted(daily)
    c = [daily[d] for d in days]
    n = len(c)
    # midranks over the whole series
    ranks = []
    for x in c:
        below = sum(1 for y in c if y < x)
        ties = sum(1 for y in c if y == x)
        ranks.append(below + (ties + 1) / 2)
    best_k, best_t = -1, None
    for t in range(1, n):
        u = 2 * sum(ranks[:t]) - t * (n + 1)
        if abs(u) > best_k:
            best_k, best_t = abs(u), t
    row = pettitt_change_daily(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert row["k_pettitt"] == best_k
    assert row["t_star"] == best_t
    assert row["change_day"] == str(days[best_t - 1])
    lam = 6 * best_k**2 / (n**3 + n**2)
    assert abs(row["pettitt_lambda"] - lam) < 1e-9


def test_cusum_buishand_matches_python(spark):
    from de4ml_spark.queries.statq3 import cusum_change_daily

    daily = _daily_counts()
    c = [daily[d] for d in sorted(daily)]
    n = len(c)
    mean = sum(c) / n
    s = [0.0]
    for x in c:
        s.append(s[-1] + (x - mean))
    partial = s[1:]
    var = sum((x - mean) ** 2 for x in c) / (n - 1)
    std = math.sqrt(var)
    row = cusum_change_daily(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert abs(row["q_over_sqrt_n"]
               - max(abs(x) for x in partial) / std / math.sqrt(n)) < 1e-6
    assert abs(row["r_over_sqrt_n"]
               - (max(partial) - min(partial)) / std / math.sqrt(n)) < 1e-6


def test_theil_sen_matches_python(spark):
    from de4ml_spark.queries.statq3 import theil_sen_daily

    daily = _daily_counts()
    days = sorted(daily)
    t0 = days[0]
    pts = [((d - t0).days, daily[d]) for d in days]
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            (ti, ci), (tj, cj) = pts[i], pts[j]
            slopes.append((cj - ci) / (tj - ti))
    slopes.sort()
    m = len(slopes)
    if m % 2 == 1:
        med = slopes[m // 2]
    else:
        med = (slopes[m // 2 - 1] + slopes[m // 2]) / 2
    row = theil_sen_daily(spark, SF).collect()[0]
    assert row["n_pairs"] == m
    # micro-quantization of each slope: |err| <= 0.5e-6 per middle
    assert abs(row["sen_slope_per_day"] - med) < 1e-5


def _daily_by_type(tp):
    con = duckdb.connect()
    return dict(
        con.sql(
            f"""SELECT CAST(ts AS DATE) AS day, COUNT(*)
            FROM '{SF}/events.parquet'
            WHERE event_type = '{tp}' GROUP BY 1 ORDER BY 1"""
        ).fetchall()
    )


def _pearson(xs, ys):
    n = len(xs)
    mx = sum(xs) / n
    my = sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    dx = sum((x - mx) ** 2 for x in xs)
    dy = sum((y - my) ** 2 for y in ys)
    return num / math.sqrt(dx * dy)


def test_ccf_matches_python(spark):
    from de4ml_spark.queries.statq3 import ccf_daily_lags

    clicks = _daily_by_type("click")
    purch = _daily_by_type("purchase")
    rows = {r["lag"]: r for r in ccf_daily_lags(spark, SF).collect()}
    assert set(rows) == set(range(8))
    from datetime import timedelta

    for lag in range(8):
        pairs = [
            (clicks[d], purch[d + timedelta(days=lag)])
            for d in clicks
            if d + timedelta(days=lag) in purch
        ]
        assert rows[lag]["n_l"] == len(pairs)
        r = _pearson([p[0] for p in pairs], [p[1] for p in pairs])
        assert abs(rows[lag]["r_ccf"] - r) < 1e-9


def test_pacf_matches_python(spark):
    from de4ml_spark.queries.statq3 import pacf_daily

    daily = _daily_counts()
    c = [daily[d] for d in sorted(daily)]
    n = len(c)
    mean = sum(c) / n
    den = sum((x - mean) ** 2 for x in c)
    r = [
        sum((c[t] - mean) * (c[t + k] - mean) for t in range(n - k))
        / den
        for k in (1, 2, 3)
    ]
    r1, r2, r3 = r
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = r1 * (1 - phi22)
    pacf3 = (r3 - phi21 * r2 - phi22 * r1) / (
        1 - phi21 * r1 - phi22 * r2
    )
    row = pacf_daily(spark, SF).collect()[0]
    assert abs(row["r1"] - r1) < 1e-9
    assert abs(row["r3"] - r3) < 1e-9
    assert abs(row["pacf1"] - r1) < 1e-9
    assert abs(row["pacf2"] - phi22) < 1e-9
    assert abs(row["pacf3"] - pacf3) < 1e-8


def test_poincare_matches_python(spark):
    from de4ml_spark.queries.statq3 import poincare_sd_daily

    daily = _daily_counts()
    days = sorted(daily)
    c = [daily[d] for d in days]
    diffs = [
        daily[days[i + 1]] - daily[days[i]]
        for i in range(len(days) - 1)
        if (days[i + 1] - days[i]).days == 1
    ]
    n = len(c)
    vx = sum((x - sum(c) / n) ** 2 for x in c) / n
    md = sum(diffs) / len(diffs)
    vd = sum((d - md) ** 2 for d in diffs) / len(diffs)
    row = poincare_sd_daily(spark, SF).collect()[0]
    assert row["n_x"] == n and row["n_d"] == len(diffs)
    assert abs(row["sd1"] - math.sqrt(vd / 2)) < 1e-9
    assert abs(row["sd2"] - math.sqrt(2 * vx - vd / 2)) < 1e-9


def test_haar_matches_python(spark):
    from de4ml_spark.queries.statq3 import haar_energy_daily

    daily = _daily_counts()
    v = [daily[d] for d in sorted(daily)]
    energies = {}
    cur = v
    for lvl in (1, 2, 3):
        m = len(cur) // 2
        det = [cur[2 * k + 1] - cur[2 * k] for k in range(m)]
        nxt = [cur[2 * k + 1] + cur[2 * k] for k in range(m)]
        energies[lvl] = (m, sum(d * d for d in det))
        cur = nxt
    tot = sum(e for _m, e in energies.values())
    rows = {r["level"]: r for r in haar_energy_daily(spark, SF).collect()}
    for lvl in (1, 2, 3):
        m, e = energies[lvl]
        assert rows[lvl]["n_detail"] == m
        assert abs(rows[lvl]["energy_d"] - e) < 1e-6
        assert abs(rows[lvl]["energy_share"] - e / tot) < 1e-12


def test_sample_entropy_matches_python(spark):
    from de4ml_spark.queries.statq3 import sample_entropy_daily

    daily = _daily_counts()
    days = sorted(daily)
    # templates over calendar-adjacent triples
    from datetime import timedelta

    tpl = []
    for d in days:
        if d + timedelta(days=1) in daily and d + timedelta(days=2) in daily:
            tpl.append(
                (daily[d], daily[d + timedelta(days=1)],
                 daily[d + timedelta(days=2)])
            )
    c = [daily[d] for d in days]
    n = len(c)
    mean = sum(c) / n
    r = 0.2 * math.sqrt(sum((x - mean) ** 2 for x in c) / n)
    b_cnt = a_cnt = 0
    for i in range(len(tpl)):
        for j in range(i + 1, len(tpl)):
            a, b = tpl[i], tpl[j]
            if abs(b[0] - a[0]) <= r and abs(b[1] - a[1]) <= r:
                b_cnt += 1
                if abs(b[2] - a[2]) <= r:
                    a_cnt += 1
    row = sample_entropy_daily(spark, SF).collect()[0]
    assert row["b_count"] == b_cnt
    assert row["a_count"] == a_cnt
    if a_cnt >= 1 and b_cnt >= 1:
        assert abs(row["sampen"] - math.log(b_cnt / a_cnt)) < 1e-9
    else:
        assert row["sampen"] is None


def test_bartels_matches_python(spark):
    from de4ml_spark.queries.statq3 import bartels_rank_daily

    daily = _daily_counts()
    days = sorted(daily)
    c = [daily[d] for d in days]
    n = len(c)
    ranks = []
    for x in c:
        below = sum(1 for y in c if y < x)
        ties = sum(1 for y in c if y == x)
        ranks.append(below + (ties + 1) / 2)
    # adjacency by CALENDAR day (gaps skip), as implemented
    num = sum(
        (ranks[i] - ranks[i + 1]) ** 2
        for i in range(n - 1)
        if (days[i + 1] - days[i]).days == 1
    )
    rbar = (n + 1) / 2
    den = sum((r - rbar) ** 2 for r in ranks)
    rvn = num / den
    var = (
        4 * (n - 2) * (5 * n * n - 2 * n - 9)
        / (5 * n * (n + 1) * (n - 1) ** 2)
    )
    z = (rvn - 2) / math.sqrt(var)
    row = bartels_rank_daily(spark, SF).collect()[0]
    assert abs(row["rvn"] - rvn) < 1e-12
    assert abs(row["z_bartels"] - z) < 1e-9


def test_cox_stuart_matches_python(spark):
    from de4ml_spark.queries.statq3 import cox_stuart_daily

    daily = _daily_counts()
    c = [daily[d] for d in sorted(daily)]
    n = len(c)
    h = n // 2
    # classic convention: odd n drops the middle observation
    shift = h + (n % 2)
    sp = sm = 0
    for i in range(h):
        x, y = c[i], c[i + shift]
        if y > x:
            sp += 1
        elif y < x:
            sm += 1
    row = cox_stuart_daily(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert row["s_plus"] == sp and row["s_minus"] == sm
    m = sp + sm
    if sp >= sm:
        z = (sp - m / 2 - 0.5) / math.sqrt(m / 4)
    else:
        z = (sp - m / 2 + 0.5) / math.sqrt(m / 4)
    assert abs(row["z_cox_stuart"] - z) < 1e-9


def _user_spans():
    con = duckdb.connect()
    return con.sql(
        f"""SELECT user_id, MIN(CAST(ts AS DATE)) AS d0,
            MAX(CAST(ts AS DATE)) AS d1
            FROM '{SF}/events.parquet'
            WHERE user_id IS NOT NULL GROUP BY 1"""
    ).fetchall()


def test_logrank_matches_python(spark):
    from de4ml_spark.queries.mldataq6 import logrank_test_retention

    spans = _user_spans()
    hmax = max(r[2] for r in spans)
    users = [
        ((r[2] - r[1]).days // 7, 1 if r[2] < hmax else 0,
         1 if r[0] % 2 == 0 else 0)
        for r in spans
    ]
    max_iv = max(u[0] for u in users)
    sum_oe = sum_v = 0.0
    n_int = d_tot = 0
    for i in range(max_iv + 1):
        at_risk = [u for u in users if u[0] >= i]
        n_a = sum(1 for u in at_risk if u[2] == 1)
        n_b = len(at_risk) - n_a
        d_i = sum(1 for u in at_risk if u[1] == 1 and u[0] == i)
        d_a = sum(
            1 for u in at_risk if u[1] == 1 and u[0] == i and u[2] == 1
        )
        n = n_a + n_b
        if d_i > 0:
            n_int += 1
            d_tot += d_i
            sum_oe += d_a - d_i * n_a / n
            sum_v += (
                d_i * (n_a / n) * (n_b / n)
                * ((n - d_i) / max(n - 1, 1))
            )
    row = logrank_test_retention(spark, SF).collect()[0]
    assert row["n_intervals"] == n_int and row["d_total"] == d_tot
    assert abs(row["oe_a"] - sum_oe) < 1e-4
    assert abs(row["z_logrank"] - sum_oe / math.sqrt(sum_v)) < 1e-4


def test_nelson_aalen_matches_python(spark):
    from de4ml_spark.queries.mldataq6 import nelson_aalen_retention

    spans = _user_spans()
    hmax = max(r[2] for r in spans)
    users = [
        ((r[2] - r[1]).days // 7, 1 if r[2] < hmax else 0)
        for r in spans
    ]
    max_iv = max(u[0] for u in users)
    rows = {
        r["i"]: r for r in nelson_aalen_retention(spark, SF).collect()
    }
    h = 0.0
    for i in range(max_iv + 1):
        at_risk = [u for u in users if u[0] >= i]
        d_i = sum(1 for u in at_risk if u[1] == 1 and u[0] == i)
        h += d_i / len(at_risk)
        assert rows[i]["n_enter"] == len(at_risk)
        assert rows[i]["d_i"] == d_i
        assert abs(rows[i]["na_cumhaz"] - h) < 1e-6


def test_odds_ratio_matches_python(spark):
    from de4ml_spark.queries.mldataq6 import odds_ratio_docs

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT lang, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    a = sum(1 for l, n in docs if l == "en" and n >= 300)
    b = sum(1 for l, n in docs if l == "en" and n < 300)
    c = sum(1 for l, n in docs if l != "en" and n >= 300)
    d = sum(1 for l, n in docs if l != "en" and n < 300)
    row = odds_ratio_docs(spark, SF).collect()[0]
    assert (row["a"], row["b"], row["c"], row["d"]) == (a, b, c, d)
    if min(a, b, c, d) >= 1:
        assert abs(row["odds_ratio"] - (a * d) / (b * c)) < 1e-9
        se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
        assert abs(row["log_or_se"] - se) < 1e-12
    q = (a * d - b * c) / (a * d + b * c)
    assert abs(row["yule_q"] - q) < 1e-12
    phi = (a * d - b * c) / math.sqrt(
        (a + b) * (c + d) * (a + c) * (b + d)
    )
    assert abs(row["phi"] - phi) < 1e-12


def _pop_split():
    """Python recompute of the popularity split: (ranked topk, holdout)."""
    con = duckdb.connect()
    orders = con.sql(
        f"""SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE)
        FROM '{SF}/orders.parquet'"""
    ).fetchall()
    li = con.sql(
        f"SELECT l_orderkey, l_partkey FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    dmin = min(r[2] for r in orders)
    dmax = max(r[2] for r in orders)
    from datetime import timedelta

    split = dmin + timedelta(days=(dmax - dmin).days * 3 // 4)
    train_ok = {r[0] for r in orders if r[2] <= split}
    cust = {r[0]: r[1] for r in orders}
    cnt = Counter(p for o, p in li if o in train_ok)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rank_of = {p: i + 1 for i, (p, _c) in enumerate(ranked)}
    holdout = defaultdict(set)
    test_ok = {r[0] for r in orders if r[2] > split}
    for o, p in li:
        if o in test_ok:
            holdout[cust[o]].add(p)
    return rank_of, holdout


def test_mrr_matches_python(spark):
    from de4ml_spark.queries.mldataq6 import mrr_popularity_orders

    rank_of, holdout = _pop_split()
    rrs = []
    nhit = 0
    for _cust, parts in holdout.items():
        ranks = [rank_of[p] for p in parts if p in rank_of]
        if ranks:
            rrs.append(1 / min(ranks))
            nhit += 1
        else:
            rrs.append(0.0)
    row = mrr_popularity_orders(spark, SF).collect()[0]
    assert row["n_customers"] == len(holdout)
    assert row["n_with_hit"] == nhit
    assert abs(row["mrr"] - sum(rrs) / len(rrs)) < 1e-8


def test_map_matches_python(spark):
    from de4ml_spark.queries.mldataq6 import map_at_k_orders

    rank_of, holdout = _pop_split()
    aps = []
    for _cust, parts in holdout.items():
        hit_ranks = sorted(rank_of[p] for p in parts if p in rank_of)
        s = sum((i + 1) / r for i, r in enumerate(hit_ranks))
        aps.append(s / min(20, len(parts)))
    row = map_at_k_orders(spark, SF).collect()[0]
    assert row["n_customers"] == len(holdout)
    assert abs(row["map_at_k"] - sum(aps) / len(aps)) < 1e-7


def test_association_rules_match_python(spark):
    from de4ml_spark.queries.mldataq6 import association_rules_parts

    con = duckdb.connect()
    li = con.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    baskets = defaultdict(set)
    for o, p in li:
        baskets[o].add(p)
    n_orders = len(baskets)
    marg = Counter(p for ps in baskets.values() for p in ps)
    co = Counter()
    for ps in baskets.values():
        sp = sorted(ps)
        for i in range(len(sp)):
            for j in range(i + 1, len(sp)):
                co[(sp[i], sp[j])] += 1
    rules = [
        (a, b, c, marg[a], marg[b],
         c * n_orders / (marg[a] * marg[b]))
        for (a, b), c in co.items()
        if c >= 2
    ]
    rules.sort(key=lambda r: (-r[5], r[0], r[1]))
    got = association_rules_parts(spark, SF).collect()
    assert len(got) == min(20, len(rules))
    for row, exp in zip(got, rules):
        assert (row["part_a"], row["part_b"], row["c_ab"]) == exp[:3]
        assert abs(row["lift"] - exp[5]) < 1e-9
        assert abs(row["confidence"] - exp[2] / exp[3]) < 1e-12
        assert abs(row["support"] - exp[2] / n_orders) < 1e-12


def test_lin_ccc_matches_python(spark):
    from de4ml_spark.queries.mldataq6 import lin_ccc_orders

    con = duckdb.connect()
    pairs = con.sql(
        f"""SELECT CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                AS BIGINT),
               y.s
        FROM '{SF}/orders.parquet' o
        JOIN (SELECT l_orderkey,
                     CAST(SUM(CAST(CAST(l_extendedprice
                       AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
                       AS s
              FROM '{SF}/lineitem.parquet' GROUP BY 1) y
          ON o.o_orderkey = y.l_orderkey"""
    ).fetchall()
    xs = [float(r[0]) for r in pairs]
    ys = [float(r[1]) for r in pairs]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / n
    sx2 = sum((x - mx) ** 2 for x in xs) / n
    sy2 = sum((y - my) ** 2 for y in ys) / n
    ccc = 2 * sxy / (sx2 + sy2 + (mx - my) ** 2)
    r = sxy / math.sqrt(sx2 * sy2)
    row = lin_ccc_orders(spark, SF).collect()[0]
    assert row["n"] == n
    assert abs(row["pearson_r"] - r) < 1e-9
    assert abs(row["lin_ccc"] - ccc) < 1e-9


def test_partial_corr_matches_python(spark):
    from de4ml_spark.queries.mldataq6 import partial_corr_lineitem

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT CAST(l_quantity AS BIGINT),
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                 AS BIGINT),
               CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM '{SF}/lineitem.parquet'"""
    ).fetchall()
    xs = [float(r[0]) for r in rows]
    ys = [float(r[1]) for r in rows]
    zs = [float(r[2]) for r in rows]
    rxy = _pearson(xs, ys)
    rxz = _pearson(xs, zs)
    ryz = _pearson(ys, zs)
    pr = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz**2) * (1 - ryz**2)
    )
    row = partial_corr_lineitem(spark, SF).collect()[0]
    assert abs(row["r_xy"] - rxy) < 1e-9
    assert abs(row["r_xz"] - rxz) < 1e-9
    assert abs(row["r_yz"] - ryz) < 1e-9
    assert abs(row["partial_r"] - pr) < 1e-9


def _docs():
    con = duckdb.connect()
    return con.sql(
        f"SELECT source, text, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()


def test_yule_k_and_ttr_match_python(spark):
    from de4ml_spark.queries.textq4 import ttr_hapax_docs, yule_k_docs

    by_src = defaultdict(list)
    for src, text, _n in _docs():
        by_src[src].extend(text.split(" "))
    yk = {r["source"]: r for r in yule_k_docs(spark, SF).collect()}
    tt = {r["source"]: r for r in ttr_hapax_docs(spark, SF).collect()}
    for src, toks in by_src.items():
        n = len(toks)
        freq = Counter(toks)
        v = len(freq)
        hapax = sum(1 for f in freq.values() if f == 1)
        s_f2v = sum(f * f for f in freq.values())
        k = 1e4 * (s_f2v - n) / (n * n)
        assert yk[src]["n_tok"] == n and yk[src]["n_types"] == v
        assert abs(yk[src]["yule_k"] - k) < 1e-6
        assert tt[src]["n_hapax"] == hapax
        assert abs(tt[src]["ttr"] - v / n) < 1e-12
        assert abs(tt[src]["hapax_share"] - hapax / v) < 1e-12


def test_zipf_slope_matches_python(spark):
    from de4ml_spark.queries.textq4 import zipf_slope_docs

    toks = []
    for _src, text, _n in _docs():
        toks.extend(text.split(" "))
    freq = Counter(toks)
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    xs = [math.log(i + 1) for i in range(len(top))]
    ys = [math.log(c) for _t, c in top]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    row = zipf_slope_docs(spark, SF).collect()[0]
    assert row["n"] == n
    # micro-quantized portable-ln inputs: slope agrees to ~1e-5
    assert abs(row["zipf_slope"] - slope) < 1e-4


def test_flesch_matches_python(spark):
    import re

    from de4ml_spark.queries.textq4 import flesch_reading_docs

    agg = defaultdict(lambda: [0, 0, 0, 0])
    for src, text, _n in _docs():
        w = len(text.split(" "))
        s = max(len(re.findall(r"[.!?]+", text)), 1)
        y = len(re.findall(r"[aeiouyAEIOUY]+", text))
        a = agg[src]
        a[0] += 1
        a[1] += w
        a[2] += s
        a[3] += y
    rows = {
        r["source"]: r for r in flesch_reading_docs(spark, SF).collect()
    }
    for src, (nd, w, s, y) in agg.items():
        r = rows[src]
        assert (r["n_docs"], r["n_words"], r["n_sentences"],
                r["n_syllables"]) == (nd, w, s, y)
        fre = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        assert abs(r["flesch"] - fre) < 1e-9


def test_hellinger_matches_python(spark):
    from de4ml_spark.queries.textq4 import hellinger_sources

    per = defaultdict(Counter)
    pool = Counter()
    for src, _text, n in _docs():
        b = n // 50
        per[src][b] += 1
        pool[b] += 1
    n_pool = sum(pool.values())
    rows = {
        r["source"]: r for r in hellinger_sources(spark, SF).collect()
    }
    for src, cnts in per.items():
        n_src = sum(cnts.values())
        bc = sum(
            math.sqrt((c / n_src) * (pool[b] / n_pool))
            for b, c in cnts.items()
        )
        h = math.sqrt(max(1 - bc, 0.0))
        assert rows[src]["n_src"] == n_src
        assert abs(rows[src]["hellinger"] - h) < 1e-5


def test_lognormal_fit_matches_python(spark):
    from de4ml_spark.queries.statq3 import lognormal_fit_price

    con = duckdb.connect()
    cents = [
        int(r[0])
        for r in con.sql(
            f"""SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * 100 AS BIGINT)
            FROM '{SF}/lineitem.parquet'"""
        ).fetchall()
        if int(r[0]) >= 1
    ]
    lns = [math.log(c) for c in cents]
    n = len(lns)
    mu = sum(lns) / n
    var = sum((x - mu) ** 2 for x in lns) / (n - 1)
    sx = sum(cents)
    sxx = sum(c * c for c in cents)
    ln_ratio = math.log(n * sxx / (sx * sx))
    row = lognormal_fit_price(spark, SF).collect()[0]
    assert row["n"] == n
    assert abs(row["mu_hat_dollars"] - (mu - math.log(100))) < 1e-5
    assert abs(row["sigma2_hat"] - var) < 1e-4
    assert abs(row["ln_moment_ratio"] - ln_ratio) < 1e-9
    assert abs(
        row["lognormal_gap"] - (ln_ratio - var)
    ) < 1e-4


def test_ww_runs_matches_python(spark):
    from de4ml_spark.queries.statq3 import ww_runs_two_sample

    rows = _events()
    pooled = sorted(
        [(v, 0) for et, *_r, v in rows if et == "click"]
        + [(v, 1) for et, *_r, v in rows if et == "purchase"]
    )  # tie order: click (0) before purchase (1) — the convention
    n_a = sum(1 for _v, g in pooled if g == 0)
    n_b = len(pooled) - n_a
    runs = 1 + sum(
        1
        for i in range(1, len(pooled))
        if pooled[i][1] != pooled[i - 1][1]
    )
    mu = 2 * n_a * n_b / (n_a + n_b) + 1
    var = (
        2 * n_a * n_b * (2 * n_a * n_b - n_a - n_b)
        / ((n_a + n_b) ** 2 * (n_a + n_b - 1))
    )
    z = (runs - mu) / math.sqrt(var)
    row = ww_runs_two_sample(spark, SF).collect()[0]
    assert row["n_a"] == n_a and row["n_b"] == n_b
    assert row["n_runs"] == runs
    assert abs(row["z_ww_runs"] - z) < 1e-9


def test_hodges_lehmann_matches_python(spark):
    from de4ml_spark.queries.statq3 import hodges_lehmann_daily

    clicks = list(_daily_by_type("click").values())
    purch = list(_daily_by_type("purchase").values())
    diffs = sorted(b - a for a in clicks for b in purch)
    m = len(diffs)
    if m % 2 == 1:
        med = diffs[m // 2]
    else:
        med = (diffs[m // 2 - 1] + diffs[m // 2]) / 2
    row = hodges_lehmann_daily(spark, SF).collect()[0]
    assert row["n_pairs"] == m
    assert abs(row["hl_shift"] - med) < 1e-12


def test_page_trend_matches_python(spark):
    from de4ml_spark.queries.statq4 import page_trend_daily

    con = duckdb.connect()
    raw = con.sql(
        f"""SELECT CAST(ts AS DATE), event_type, COUNT(*)
        FROM '{SF}/events.parquet'
        WHERE event_type IS NOT NULL GROUP BY 1, 2"""
    ).fetchall()
    days = sorted({r[0] for r in raw})
    types = sorted({r[1] for r in raw})
    cnt = {(r[0], r[1]): r[2] for r in raw}
    k = len(types)
    n = len(days)
    l_stat = 0.0
    for d in days:
        vals = [cnt.get((d, t), 0) for t in types]
        for j, t in enumerate(types, start=1):
            x = cnt.get((d, t), 0)
            below = sum(1 for y in vals if y < x)
            ties = sum(1 for y in vals if y == x)
            l_stat += j * (below + (ties + 1) / 2)
    z = (12 * l_stat - 3 * n * k * (k + 1) ** 2) / math.sqrt(
        n * k * k * (k + 1) * (k * k - 1)
    )
    row = page_trend_daily(spark, SF).collect()[0]
    assert row["n_blocks"] == n and row["k_treat"] == k
    assert row["l2_stat"] == int(2 * l_stat)
    assert abs(row["z_page"] - z) < 1e-9


def test_gamma_somers_matches_python(spark):
    from de4ml_spark.queries.statq4 import gamma_somers_lineitem

    con = duckdb.connect()
    cells = con.sql(
        f"""SELECT CAST(l_quantity AS BIGINT),
               CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT),
               COUNT(*)
        FROM '{SF}/lineitem.parquet' GROUP BY 1, 2"""
    ).fetchall()
    c_mass = d_mass = ty = 0
    for x1, y1, n1 in cells:
        for x2, y2, n2 in cells:
            if x2 > x1:
                if y2 > y1:
                    c_mass += n1 * n2
                elif y2 < y1:
                    d_mass += n1 * n2
                else:
                    ty += n1 * n2
    row = gamma_somers_lineitem(spark, SF).collect()[0]
    assert row["c_pairs"] == c_mass
    assert row["d_pairs"] == d_mass
    assert row["ty_pairs"] == ty
    assert abs(row["gamma"] - (c_mass - d_mass) / (c_mass + d_mass)) < 1e-12
    assert abs(
        row["somers_dyx"]
        - (c_mass - d_mass) / (c_mass + d_mass + ty)
    ) < 1e-12


def test_weighted_kappa_matches_python(spark):
    from de4ml_spark.queries.mldataq6 import weighted_kappa_docs

    table = Counter()
    for _src, text, n in _docs():
        ra = min(n // 150, 3)
        rb = min(len(text.split(" ")) // 25, 3)
        table[(ra, rb)] += 1
    ntot = sum(table.values())
    rows_m = Counter()
    cols_m = Counter()
    for (ra, rb), o in table.items():
        rows_m[ra] += o
        cols_m[rb] += o
    sum_wo = sum((ra - rb) ** 2 * o for (ra, rb), o in table.items())
    sum_we = sum(
        (i - j) ** 2 * rows_m[i] * cols_m[j]
        for i in rows_m
        for j in cols_m
    )
    kappa = 1 - ntot * sum_wo / sum_we
    row = weighted_kappa_docs(spark, SF).collect()[0]
    assert row["n_docs"] == ntot and row["sum_wo"] == sum_wo
    assert abs(row["weighted_kappa"] - kappa) < 1e-9


def test_mantel_haenszel_matches_python(spark):
    from de4ml_spark.queries.mldataq6 import mantel_haenszel_docs

    strata = defaultdict(lambda: [0, 0, 0, 0])
    con = duckdb.connect()
    for src, lang, n in con.sql(
        f"SELECT source, lang, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall():
        s = strata[src]
        if lang == "en":
            s[0 if n >= 300 else 1] += 1
        else:
            s[2 if n >= 300 else 3] += 1
    num = den = sum_a = sum_e = sum_v = 0.0
    k = 0
    for a, b, c, d in strata.values():
        n = a + b + c + d
        if n <= 1:
            continue
        k += 1
        num += a * d / n
        den += b * c / n
        sum_a += a
        sum_e += (a + b) * (a + c) / n
        sum_v += (
            (a + b) * (c + d) * (a + c) * (b + d)
            / (n * n * (n - 1))
        )
    row = mantel_haenszel_docs(spark, SF).collect()[0]
    assert row["n_strata"] == k
    assert abs(row["or_mh"] - num / den) < 1e-4
    chi2 = (abs(sum_a - sum_e) - 0.5) ** 2 / sum_v
    assert abs(row["chi2_cmh"] - chi2) < 1e-3


def test_ols_daily_trend_matches_python(spark):
    from de4ml_spark.queries.statq4 import ols_daily_trend

    daily = _daily_counts()
    days = sorted(daily)
    t0 = days[0]
    ts = [(d - t0).days for d in days]
    ys = [daily[d] for d in days]
    n = len(ts)
    mt, my = sum(ts) / n, sum(ys) / n
    sxx = sum((t - mt) ** 2 for t in ts)
    sxy = sum((t - mt) * (y - my) for t, y in zip(ts, ys))
    syy = sum((y - my) ** 2 for y in ys)
    slope = sxy / sxx
    intercept = my - slope * mt
    r2 = sxy * sxy / (sxx * syy)
    se2 = (syy - slope * sxy) / ((n - 2) * sxx)
    t_stat = slope / math.sqrt(se2)
    row = ols_daily_trend(spark, SF).collect()[0]
    assert row["n"] == n
    assert abs(row["slope"] - slope) < 1e-9
    assert abs(row["intercept"] - intercept) < 1e-9
    assert abs(row["r2_fit"] - r2) < 1e-12
    assert abs(row["t_slope"] - t_stat) < 1e-9


def test_breusch_pagan_matches_python(spark):
    from de4ml_spark.queries.statq4 import breusch_pagan_daily

    daily = _daily_counts()
    days = sorted(daily)
    t0 = days[0]
    ts = [(d - t0).days for d in days]
    ys = [daily[d] for d in days]
    n = len(ts)
    mt, my = sum(ts) / n, sum(ys) / n
    sxx = sum((t - mt) ** 2 for t in ts)
    sxy = sum((t - mt) * (y - my) for t, y in zip(ts, ys))
    slope = sxy / sxx
    intercept = my - slope * mt
    # replicate the milli-quantization: e_u = halfup(1000·E, nD)
    dd = n * sum(t * t for t in ts) - sum(ts) ** 2
    nb = n * sum(t * y for t, y in zip(ts, ys)) - sum(ts) * sum(ys)
    sy, st = sum(ys), sum(ts)
    g = []
    for t, y in zip(ts, ys):
        e_wide = dd * (n * y - sy) - nb * (n * t - st)
        nd = n * dd
        if e_wide >= 0:
            e_u = (2 * 1000 * e_wide + nd) // (2 * nd)
        else:
            e_u = -((2 * 1000 * (-e_wide) + nd) // (2 * nd))
        # sanity: quantized residual ≈ true residual
        assert abs(e_u / 1000 - (y - intercept - slope * t)) < 2e-3
        g.append(e_u * e_u)
    r = _pearson([float(t) for t in ts], [float(x) for x in g])
    lm = n * r * r
    row = breusch_pagan_daily(spark, SF).collect()[0]
    assert row["n"] == n
    assert abs(row["r2_aux"] - r * r) < 1e-9
    assert abs(row["lm_breusch_pagan"] - lm) < 1e-7


def test_kendalls_w_matches_python(spark):
    from de4ml_spark.queries.statq4 import kendalls_w_daily

    con = duckdb.connect()
    raw = con.sql(
        f"""SELECT CAST(ts AS DATE), event_type, COUNT(*)
        FROM '{SF}/events.parquet'
        WHERE event_type IS NOT NULL GROUP BY 1, 2"""
    ).fetchall()
    days = sorted({r[0] for r in raw})
    types = sorted({r[1] for r in raw})
    cnt = {(r[0], r[1]): r[2] for r in raw}
    k = len(days)
    n = len(types)
    rsum = dict.fromkeys(types, 0.0)
    sum_t = 0
    for d in days:
        vals = [cnt.get((d, t), 0) for t in types]
        for t in types:
            x = cnt.get((d, t), 0)
            below = sum(1 for y in vals if y < x)
            ties = sum(1 for y in vals if y == x)
            rsum[t] += below + (ties + 1) / 2
        for v, c in Counter(vals).items():
            sum_t += c**3 - c
    rbar = k * (n + 1) / 2
    s = sum((rsum[t] - rbar) ** 2 for t in types)
    w = 12 * s / (k * k * (n**3 - n) - k * sum_t)
    row = kendalls_w_daily(spark, SF).collect()[0]
    assert row["k_days"] == k and row["n_types"] == n
    assert abs(row["kendalls_w"] - w) < 1e-9


def test_hoeffding_d_matches_python(spark):
    from de4ml_spark.queries.statq4 import hoeffding_d_lineitem

    con = duckdb.connect()
    pts = con.sql(
        f"""SELECT CAST(l_quantity AS BIGINT),
            CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM '{SF}/lineitem.parquet'"""
    ).fetchall()
    n = len(pts)
    cells = Counter(pts)
    items = list(cells.items())
    # independent path: direct per-cell double loop (the plan uses
    # CASE-mass cum algebra over one cross join)
    d1 = d2 = d3 = 0
    for (x, y), c in items:
        xless = xtie = yless = ytie = ll = tl = lt = 0
        for (x2, y2), c2 in items:
            if x2 < x:
                xless += c2
                if y2 < y:
                    ll += c2
                elif y2 == y:
                    lt += c2
            elif x2 == x:
                xtie += c2
                if y2 < y:
                    tl += c2
            if y2 < y:
                yless += c2
            elif y2 == y:
                ytie += c2
        r = xless + (xtie + 1) / 2
        s = yless + (ytie + 1) / 2
        q = 1 + ll + tl / 2 + lt / 2 + (c - 1) / 4
        d1 += c * (q - 1) * (q - 2)
        d2 += c * (r - 1) * (r - 2) * (s - 1) * (s - 2)
        d3 += c * (r - 2) * (s - 2) * (q - 1)
    d_stat = (
        30
        * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3)
        / (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    )
    row = hoeffding_d_lineitem(spark, SF).collect()[0]
    assert row["n_rows"] == n
    assert abs(row["hoeffding_d"] - d_stat) < 1e-9 * max(
        1.0, abs(d_stat)
    )


def test_distance_correlation_matches_python(spark):
    from de4ml_spark.queries.statq4 import (
        distance_correlation_lineitem,
    )

    con = duckdb.connect()
    pts = con.sql(
        f"""SELECT CAST(l_quantity AS BIGINT),
            CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM '{SF}/lineitem.parquet'"""
    ).fetchall()
    n = len(pts)
    cells = Counter(pts)
    items = list(cells.items())

    # V-statistic sums via the cell table (independent double loop)
    s1_xy = s1_xx = s1_yy = 0
    ax = {}
    by = {}
    for (x, y), c in items:
        a = sum(c2 * abs(x - x2) for (x2, y2), c2 in items)
        b = sum(c2 * abs(y - y2) for (x2, y2), c2 in items)
        ax[(x, y)] = a
        by[(x, y)] = b
        s1_xy += c * sum(
            c2 * abs(x - x2) * abs(y - y2)
            for (x2, y2), c2 in items
        )
        s1_xx += c * sum(
            c2 * abs(x - x2) ** 2 for (x2, y2), c2 in items
        )
        s1_yy += c * sum(
            c2 * abs(y - y2) ** 2 for (x2, y2), c2 in items
        )
    sx = sum(c * ax[k] for k, c in cells.items())
    sy = sum(c * by[k] for k, c in cells.items())

    def dcov2(s1, ra, rb, s3):
        return s1 / n**2 + (ra / n**2) * (rb / n**2) - 2 * s3 / n**3

    s3_xy = sum(c * ax[k] * by[k] for k, c in cells.items())
    s3_xx = sum(c * ax[k] * ax[k] for k, c in cells.items())
    s3_yy = sum(c * by[k] * by[k] for k, c in cells.items())
    dxy = dcov2(s1_xy, sx, sy, s3_xy)
    dxx = dcov2(s1_xx, sx, sx, s3_xx)
    dyy = dcov2(s1_yy, sy, sy, s3_yy)
    dcor = math.sqrt(dxy / math.sqrt(dxx * dyy))
    row = distance_correlation_lineitem(spark, SF).collect()[0]
    assert row["n_rows"] == n
    assert abs(row["dcov2"] - dxy) < 1e-6 * max(1.0, abs(dxy))
    assert abs(row["dcor"] - dcor) < 1e-9 * max(1.0, dcor)
    assert 0.0 <= row["dcor"] <= 1.0
