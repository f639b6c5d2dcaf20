"""Round-9c catalog entries: pure-Python recomputation from the raw
sf0.001 rows — the guard the cross-engine value-hash gate cannot
provide (a shared-formula error passes the hash on both engines; see
the welch/grubbs round-9 incidents).
"""

from __future__ import annotations

import math

import duckdb

SF = "/root/testdata/sf0.001"


def _values_by_type(*types):
    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT event_type,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND event_type IN {types!r}"""
    ).fetchall()
    return {t: sorted(v for et, v in rows if et == t) for t in types}


def _daily_counts_9c():
    con = duckdb.connect()
    return dict(
        con.sql(
            f"""SELECT CAST(ts AS DATE) AS day, COUNT(*)
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"""
        ).fetchall()
    )


def _day_type_counts():
    con = duckdb.connect()
    raw = con.sql(
        f"""SELECT CAST(ts AS DATE), event_type, COUNT(*)
        FROM '{SF}/events.parquet'
        WHERE event_type IS NOT NULL GROUP BY 1, 2"""
    ).fetchall()
    days = sorted({r[0] for r in raw})
    types = sorted({r[1] for r in raw})
    cnt = {(r[0], r[1]): r[2] for r in raw}
    return days, types, cnt


def test_kuiper_matches_python(spark):
    from de4ml_spark.queries.statq5 import kuiper_two_sample_value

    s = _values_by_type("click", "purchase")
    a, b = s["click"], s["purchase"]
    na, nb = len(a), len(b)
    support = sorted(set(a) | set(b))
    dplus = dminus = 0
    for v in support:
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        dplus = max(dplus, ca * nb - cb * na)
        dminus = max(dminus, cb * na - ca * nb)
    row = kuiper_two_sample_value(spark, SF).collect()[0]
    assert row["n_a"] == na and row["n_b"] == nb
    assert row["vplus_num"] == dplus
    assert row["vminus_num"] == dminus
    v_stat = (dplus + dminus) / (na * nb)
    assert abs(row["kuiper_v"] - v_stat) < 1e-12
    assert (
        abs(row["kuiper_scaled"] - v_stat * math.sqrt(na * nb / (na + nb)))
        < 1e-9
    )
    # Kuiper dominates KS: V >= D
    d = max(dplus, dminus) / (na * nb)
    assert row["kuiper_v"] >= d


def test_cvm_matches_python(spark):
    from de4ml_spark.queries.statq5 import cvm_two_sample_value

    s = _values_by_type("click", "purchase")
    a, b = s["click"], s["purchase"]
    na, nb = len(a), len(b)
    n_tot = na + nb
    support = sorted(set(a) | set(b))
    from collections import Counter

    ca_c, cb_c = Counter(a), Counter(b)
    t_num = 0
    cum_a = cum_b = 0
    for v in support:
        cum_a += ca_c.get(v, 0)
        cum_b += cb_c.get(v, 0)
        c_v = ca_c.get(v, 0) + cb_c.get(v, 0)
        t_num += c_v * (cum_a * nb - cum_b * na) ** 2
    t_stat = t_num / (n_tot * n_tot * na * nb)
    row = cvm_two_sample_value(spark, SF).collect()[0]
    assert row["n_a"] == na and row["n_b"] == nb
    assert abs(row["cvm_t"] - t_stat) < 1e-9
    # sanity: the integral form is bounded by (nm/N)·sup² fan-out
    assert 0 <= row["cvm_t"]


def test_cronbach_alpha_matches_python(spark):
    from de4ml_spark.queries.statq5 import cronbach_alpha_daily

    days, types, cnt = _day_type_counts()
    n, k = len(days), len(types)

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs)

    item_vars = sum(
        var([cnt.get((d, t), 0) for d in days]) for t in types
    )
    total_var = var(
        [sum(cnt.get((d, t), 0) for t in types) for d in days]
    )
    alpha = k / (k - 1) * (1 - item_vars / total_var)
    row = cronbach_alpha_daily(spark, SF).collect()[0]
    assert row["k_types"] == k and row["n_days"] == n
    assert abs(row["cronbach_alpha"] - alpha) < 1e-9


def test_icc_matches_python(spark):
    from de4ml_spark.queries.statq5 import icc_daily_types

    days, types, cnt = _day_type_counts()
    n, k = len(days), len(types)
    grid = {
        (d, t): cnt.get((d, t), 0) for d in days for t in types
    }
    grand = sum(grid.values()) / (n * k)
    row_means = {
        d: sum(grid[(d, t)] for t in types) / k for d in days
    }
    col_means = {
        t: sum(grid[(d, t)] for d in days) / n for t in types
    }
    ss_rows = k * sum((row_means[d] - grand) ** 2 for d in days)
    ss_cols = n * sum((col_means[t] - grand) ** 2 for t in types)
    ss_tot = sum((v - grand) ** 2 for v in grid.values())
    ss_err = ss_tot - ss_rows - ss_cols
    msr = ss_rows / (n - 1)
    msc = ss_cols / (k - 1)
    mse = ss_err / ((n - 1) * (k - 1))
    icc = (msr - mse) / (
        msr + (k - 1) * mse + k * (msc - mse) / n
    )
    row = icc_daily_types(spark, SF).collect()[0]
    assert row["n_days"] == n and row["k_types"] == k
    assert abs(row["icc_2_1"] - icc) < 1e-9


def test_energy_distance_matches_python(spark):
    from de4ml_spark.queries.statq5 import energy_distance_value

    s = _values_by_type("click", "purchase")
    a, b = s["click"], s["purchase"]
    na, nb = len(a), len(b)

    def pairsum(xs, ys):
        return sum(abs(x - y) for x in xs for y in ys)

    mu_ab = pairsum(a, b) / (na * nb)
    mu_aa = pairsum(a, a) / (na * na)
    mu_bb = pairsum(b, b) / (nb * nb)
    e2 = 2 * mu_ab - mu_aa - mu_bb
    row = energy_distance_value(spark, SF).collect()[0]
    assert row["n_a"] == na and row["n_b"] == nb
    assert abs(row["energy_sq_cents"] - e2) < 1e-6 * max(1.0, e2)
    assert abs(row["energy_dist_cents"] - math.sqrt(e2)) < 1e-6


def test_seasonal_forecast_matches_python(spark):
    from de4ml_spark.queries.statq5 import seasonal_forecast_daily

    daily = _daily_counts_9c()
    idx = {
        (d - min(daily)).days: daily[d] for d in daily
    }
    d1 = [
        abs(idx[t] - idx[t - 1]) for t in idx if t - 1 in idx
    ]
    pairs7 = [(idx[t], idx[t - 7]) for t in sorted(idx) if t - 7 in idx]
    sad7 = sum(abs(y - h) for y, h in pairs7)
    sse7 = sum((y - h) ** 2 for y, h in pairs7)
    bias7 = sum(y - h for y, h in pairs7)
    m7 = len(pairs7)
    m1 = len(d1)
    mase = (sad7 / m7) / (sum(d1) / m1)
    u1 = math.sqrt(sse7 / m7) / (
        math.sqrt(sum(y * y for y, _ in pairs7) / m7)
        + math.sqrt(sum(h * h for _, h in pairs7) / m7)
    )
    row = seasonal_forecast_daily(spark, SF).collect()[0]
    assert row["m1"] == m1 and row["m7"] == m7
    assert abs(row["mase_seasonal"] - mase) < 1e-9
    assert abs(row["theil_u1"] - u1) < 1e-9
    assert abs(row["mean_error"] - bias7 / m7) < 1e-9


def test_chow_break_matches_python(spark):
    from de4ml_spark.queries.statq5 import chow_break_daily

    daily = _daily_counts_9c()
    days = sorted(daily)
    t0 = (min(days) - min(days)).days
    ts_all = [(d - min(days)).days for d in days]
    ys_all = [daily[d] for d in days]
    # split BEFORE re-zeroing, matching the plan: t_mid over raw t
    t_raw = [
        (d - __import__("datetime").date(1970, 1, 1)).days for d in days
    ]
    t_mid = (min(t_raw) + max(t_raw)) // 2

    def rss(ts, ys):
        n = len(ts)
        mt, my = sum(ts) / n, sum(ys) / n
        sxx = sum((t - mt) ** 2 for t in ts)
        sxy = sum((t - mt) * (y - my) for t, y in zip(ts, ys))
        syy = sum((y - my) ** 2 for y in ys)
        return syy - sxy * sxy / sxx

    seg1 = [(t, y) for t, tr, y in zip(ts_all, t_raw, ys_all) if tr <= t_mid]
    seg2 = [(t, y) for t, tr, y in zip(ts_all, t_raw, ys_all) if tr > t_mid]
    r1 = rss([t for t, _ in seg1], [y for _, y in seg1])
    r2 = rss([t for t, _ in seg2], [y for _, y in seg2])
    rp = rss(ts_all, ys_all)
    n = len(ts_all)
    f_stat = ((rp - r1 - r2) / 2) / ((r1 + r2) / (n - 4))
    row = chow_break_daily(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert row["n1"] == len(seg1) and row["n2"] == len(seg2)
    assert abs(row["rss_pooled"] - rp) < 1e-6 * max(1.0, rp)
    assert abs(row["rss_split"] - (r1 + r2)) < 1e-6 * max(1.0, r1 + r2)
    assert abs(row["chow_f"] - f_stat) < 1e-6 * max(1.0, abs(f_stat))


def test_fuzzy_name_pairs_matches_python(spark):
    from de4ml_spark.queries.dedupq import fuzzy_name_pairs_parts

    con = duckdb.connect()
    parts = con.sql(
        f"""SELECT p_partkey, p_brand, p_name
        FROM '{SF}/part.parquet' ORDER BY p_partkey"""
    ).fetchall()

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (cs != ct),
                    )
                )
            prev = cur
        return prev[-1]

    from collections import defaultdict

    by_brand = defaultdict(list)
    for pk, brand, name in parts:
        by_brand[brand].append((pk, name))
    expect = {}
    for brand, items in by_brand.items():
        n_pairs = dup = near = 0
        min_pos = None
        s_lev = 0
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                d = lev(items[i][1], items[j][1])
                n_pairs += 1
                s_lev += d
                dup += d == 0
                near += 1 <= d <= 4
                if d > 0 and (min_pos is None or d < min_pos):
                    min_pos = d
        expect[brand] = (
            len(items), n_pairs, dup, near, min_pos, s_lev,
        )
    rows = fuzzy_name_pairs_parts(spark, SF).collect()
    assert len(rows) == len(expect)
    for r in rows:
        e = expect[r["p_brand"]]
        got = (
            r["n_parts"], r["n_pairs"], r["dup_name_pairs"],
            r["near_pairs"], r["min_pos_lev"], r["sum_lev"],
        )
        assert got == e, (r["p_brand"], got, e)


def test_theil_l_matches_python(spark):
    from de4ml_spark.queries.relational3 import theil_l_parts

    con = duckdb.connect()
    revs = [
        r[0]
        for r in con.sql(
            f"""SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2))))
                 AS DECIMAL(38,4)) * 10000 AS BIGINT)
            FROM '{SF}/lineitem.parquet' GROUP BY l_partkey"""
        ).fetchall()
    ]
    xs = [r for r in revs if r > 0]
    n = len(xs)
    mean = sum(xs) / n
    theil_l = sum(math.log(mean / x) for x in xs) / n
    row = theil_l_parts(spark, SF).collect()[0]
    assert row["n_parts"] == len(revs)
    # micro-quantized portable-ln: 5e-7 per term worst case
    assert abs(row["theil_l"] - theil_l) < 1e-5


def test_brand_modularity_matches_python(spark):
    from de4ml_spark.queries.graphq import brand_modularity_parts

    con = duckdb.connect()
    edges = con.sql(
        f"""SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM '{SF}/lineitem.parquet' a
        JOIN '{SF}/lineitem.parquet' b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey"""
    ).fetchall()
    brand = dict(
        con.sql(
            f"SELECT p_partkey, p_brand FROM '{SF}/part.parquet'"
        ).fetchall()
    )
    m = len(edges)
    from collections import Counter

    e_in = Counter()
    d_tot = Counter()
    for u, v in edges:
        bu, bv = brand[u], brand[v]
        d_tot[bu] += 1
        d_tot[bv] += 1
        if bu == bv:
            e_in[bu] += 1
    rows = brand_modularity_parts(spark, SF).collect()
    assert len(rows) == len(d_tot)
    q_total = 0.0
    for r in rows:
        b = r["p_brand"]
        assert r["e_in"] == e_in.get(b, 0)
        assert r["d_tot"] == d_tot[b]
        expect = e_in.get(b, 0) / m - (d_tot[b] / (2 * m)) ** 2
        assert abs(r["q_contrib"] - expect) < 1e-12
        q_total += r["q_contrib"]
    # sanity: modularity of any partition is in [-0.5, 1]
    assert -0.5 <= q_total <= 1.0


def test_quade_matches_python(spark):
    from de4ml_spark.queries.statq5 import quade_daily_value

    days, types, cnt = _day_type_counts()
    n, k = len(days), len(types)

    def midranks(vals):
        out = []
        for x in vals:
            below = sum(1 for y in vals if y < x)
            ties = sum(1 for y in vals if y == x)
            out.append(below + (ties + 1) / 2)
        return out

    ranges = [
        max(cnt.get((d, t), 0) for t in types)
        - min(cnt.get((d, t), 0) for t in types)
        for d in days
    ]
    q = midranks(ranges)
    a_stat = 0.0
    s_j = dict.fromkeys(types, 0.0)
    for di, d in enumerate(days):
        r = midranks([cnt.get((d, t), 0) for t in types])
        for ti, t in enumerate(types):
            s_cell = q[di] * (r[ti] - (k + 1) / 2)
            a_stat += s_cell * s_cell
            s_j[t] += s_cell
    b_stat = sum(v * v for v in s_j.values()) / n
    f_stat = (n - 1) * b_stat / (a_stat - b_stat)
    row = quade_daily_value(spark, SF).collect()[0]
    assert row["n_days"] == n and row["k_types"] == k
    assert abs(row["quade_f"] - f_stat) < 1e-9


def test_markov_entropy_matches_python(spark):
    from de4ml_spark.queries.statq5 import markov_entropy_rate

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT user_id, event_type, ts, event_id
        FROM '{SF}/events.parquet'
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        ORDER BY user_id, ts, event_id"""
    ).fetchall()
    from collections import Counter, defaultdict

    seqs = defaultdict(list)
    for uid, et, ts, eid in rows:
        seqs[uid].append(et)
    c = Counter()
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            c[(a, b)] += 1
    r = Counter()
    for (a, _b), v in c.items():
        r[a] += v
    total = sum(c.values())
    h = sum(v * math.log(r[a] / v) for (a, _b), v in c.items()) / total
    row = markov_entropy_rate(spark, SF).collect()[0]
    assert row["n_transitions"] == total
    assert row["n_states"] == len(r)
    assert abs(row["entropy_rate_nats"] - h) < 1e-5


def test_ansari_bradley_matches_python(spark):
    from de4ml_spark.queries.statq5 import ansari_bradley_value

    s = _values_by_type("click", "purchase")
    a, b = s["click"], s["purchase"]
    pooled = sorted(a + b)
    n_tot = len(pooled)
    # midrank min(p, N+1-p) scores per value (float, independent path)
    from collections import Counter

    pos = {}
    p = 1
    for v, c_v in sorted(Counter(pooled).items()):
        scores = [min(q, n_tot + 1 - q) for q in range(p, p + c_v)]
        pos[v] = sum(scores) / c_v
        p += c_v
    ab = sum(pos[x] for x in a)
    s_all = [pos[v] for v in pooled]
    e_ab = len(a) * sum(s_all) / n_tot
    var = (
        len(a)
        * len(b)
        * (n_tot * sum(x * x for x in s_all) - sum(s_all) ** 2)
        / (n_tot * n_tot * (n_tot - 1))
    )
    z = (ab - e_ab) / math.sqrt(var)
    row = ansari_bradley_value(spark, SF).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    # micro-quantized group means: <= 5e-7 per distinct value
    assert abs(row["ab_stat"] - ab) < 1e-3
    assert abs(row["z_ansari"] - z) < 1e-5


def test_fligner_policello_matches_python(spark):
    from de4ml_spark.queries.statq5 import fligner_policello_value

    s = _values_by_type("click", "purchase")
    a, b = s["click"], s["purchase"]

    def placements(xs, ys):
        ys_sorted = sorted(ys)
        import bisect

        out = []
        for x in xs:
            lo = bisect.bisect_left(ys_sorted, x)
            hi = bisect.bisect_right(ys_sorted, x)
            out.append(lo + (hi - lo) / 2)
        return out

    p = placements(a, b)
    q = placements(b, a)
    pbar, qbar = sum(p) / len(p), sum(q) / len(q)
    v_a = sum((x - pbar) ** 2 for x in p)
    v_b = sum((x - qbar) ** 2 for x in q)
    # Fligner-Policello 1981: U~ = (ΣQ − ΣP) / (2·√(V_a + V_b + P̄·Q̄))
    u = (sum(q) - sum(p)) / (2 * math.sqrt(v_a + v_b + pbar * qbar))
    row = fligner_policello_value(spark, SF).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert row["sp2"] == int(round(2 * sum(p)))
    assert row["sq2"] == int(round(2 * sum(q)))
    assert abs(row["u_fligner_policello"] - u) < 1e-9


def test_anderson_darling_matches_python(spark):
    from de4ml_spark.queries.statq5 import anderson_darling_value

    s = _values_by_type("click", "purchase")
    a, b = s["click"], s["purchase"]
    n_tot = len(a) + len(b)
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    support = sorted(set(a) | set(b))
    # Scholz-Stephens A2akN (midpoint / midrank version), float path
    t_i = {"a": 0.0, "b": 0.0}
    cum_a = cum_b = 0
    for v in support:
        la, lb = ca.get(v, 0), cb.get(v, 0)
        l_j = la + lb
        cum_a += la
        cum_b += lb
        b_mid = (cum_a + cum_b) - l_j / 2
        den = b_mid * (n_tot - b_mid) - n_tot * l_j / 4
        for key, n_i, cum_i, l_i in (
            ("a", len(a), cum_a, la),
            ("b", len(b), cum_b, lb),
        ):
            m_mid = cum_i - l_i / 2
            t_i[key] += (
                l_j
                * (n_tot * m_mid - n_i * b_mid) ** 2
                / den
            )
    a2 = (
        (n_tot - 1)
        / n_tot**2
        * (t_i["a"] / len(a) + t_i["b"] / len(b))
    )
    row = anderson_darling_value(spark, SF).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["ad_a2"] - a2) < 1e-6


def test_granger_matches_numpy(spark):
    from de4ml_spark.queries.statq5 import granger_clicks_purchases

    import numpy as np

    con = duckdb.connect()
    daily = con.sql(
        f"""SELECT CAST(ts AS DATE) AS day,
            SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
            SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    by_day = {d: (x, y) for d, x, y in daily}
    import datetime

    rows = []
    for d, (x, y) in by_day.items():
        prev = d - datetime.timedelta(days=1)
        if prev in by_day:
            px, py = by_day[prev]
            rows.append((y, py, px))
    arr = np.array(rows, dtype=float)
    n = len(rows)
    yv = arr[:, 0]
    xu = np.column_stack([np.ones(n), arr[:, 1], arr[:, 2]])
    xr = np.column_stack([np.ones(n), arr[:, 1]])
    # independent fit: numpy least squares, not the Cramer closed form
    ru = yv - xu @ np.linalg.lstsq(xu, yv, rcond=None)[0]
    rr = yv - xr @ np.linalg.lstsq(xr, yv, rcond=None)[0]
    rss_u = float(ru @ ru)
    rss_r = float(rr @ rr)
    f_stat = (rss_r - rss_u) / (rss_u / (n - 3))
    row = granger_clicks_purchases(spark, SF).collect()[0]
    assert row["n_obs"] == n
    assert abs(row["rss_unrestricted"] - rss_u) < 1e-6 * max(1.0, rss_u)
    assert abs(row["rss_restricted"] - rss_r) < 1e-6 * max(1.0, rss_r)
    assert abs(row["granger_f"] - f_stat) < 1e-6 * max(1.0, abs(f_stat))


def test_blomqvist_beta_matches_python(spark):
    from de4ml_spark.queries.statq5 import blomqvist_beta_lineitem

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT CAST(l_quantity AS BIGINT),
            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM '{SF}/lineitem.parquet'"""
    ).fetchall()
    qs = sorted(q for q, _ in rows)
    ps = sorted(p for _, p in rows)
    n = len(rows)
    med_q = qs[(n + 1) // 2 - 1]  # lower median, position ceil(n/2)
    med_p = ps[(n + 1) // 2 - 1]
    used = [(q, p) for q, p in rows if q != med_q and p != med_p]
    c_pp = sum(1 for q, p in used if q > med_q and p > med_p)
    c_mm = sum(1 for q, p in used if q < med_q and p < med_p)
    beta = (c_pp + c_mm - (len(used) - c_pp - c_mm)) / len(used)
    row = blomqvist_beta_lineitem(spark, SF).collect()[0]
    assert row["n_used"] == len(used)
    assert row["c_pp"] == c_pp and row["c_mm"] == c_mm
    assert abs(row["blomqvist_beta"] - beta) < 1e-12


def test_gk_lambda_matches_python(spark):
    from de4ml_spark.queries.statq5 import gk_lambda_dow_type

    con = duckdb.connect()
    raw = con.sql(
        f"""SELECT CAST(ts AS DATE), event_type, COUNT(*)
        FROM '{SF}/events.parquet'
        WHERE event_type IS NOT NULL GROUP BY 1, 2"""
    ).fetchall()
    from collections import Counter

    cells = Counter()
    for day, et, c in raw:
        cells[(day.isoweekday() % 7, et)] += c  # 0=Sunday partition
    row_max = Counter()
    col = Counter()
    for (dow, et), c in cells.items():
        row_max[dow] = max(row_max[dow], c)
        col[et] += c
    n = sum(cells.values())
    lam = (sum(row_max.values()) - max(col.values())) / (
        n - max(col.values())
    )
    row = gk_lambda_dow_type(spark, SF).collect()[0]
    assert row["n_events"] == n
    assert row["sum_row_max"] == sum(row_max.values())
    assert row["col_max"] == max(col.values())
    assert abs(row["gk_lambda"] - lam) < 1e-12


def test_heaps_law_matches_python(spark):
    from de4ml_spark.queries.textq4 import heaps_law_sources

    con = duckdb.connect()
    per = con.sql(
        f"""SELECT source, COUNT(*) AS n_tok, COUNT(DISTINCT t) AS vocab
        FROM (SELECT source, unnest(string_split(text, ' ')) AS t
              FROM '{SF}/documents.parquet')
        GROUP BY 1"""
    ).fetchall()
    xs = [math.log(n) for _, n, _v in per]
    ys = [math.log(v) for _, _n, v in per]
    n = len(per)
    mx, my = sum(xs) / n, sum(ys) / n
    beta = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    ln_k = my - beta * mx
    row = heaps_law_sources(spark, SF).collect()[0]
    assert row["n_sources"] == n
    # micro-quantized ln inputs: slope error bounded by grid/spread
    assert abs(row["heaps_beta"] - beta) < 1e-4
    assert abs(row["heaps_ln_k"] - ln_k) < 1e-3
    assert 0.0 < row["heaps_beta"] < 1.5


def test_newey_west_matches_python(spark):
    from de4ml_spark.queries.statq5 import NW_LAGS, newey_west_daily

    daily = _daily_counts_9c()
    idx = {(d - min(daily)).days: daily[d] for d in daily}
    n = len(idx)
    mean = sum(idx.values()) / n
    lrv_num = 0.0
    gamma = {}
    for k in range(NW_LAGS + 1):
        gamma[k] = sum(
            (idx[t] - mean) * (idx[t + k] - mean)
            for t in idx
            if t + k in idx
        )
    lp1 = NW_LAGS + 1
    lrv_num = lp1 * gamma[0] + 2 * sum(
        (lp1 - k) * gamma[k] for k in range(1, lp1)
    )
    lrv = lrv_num / (lp1 * n)
    row = newey_west_daily(spark, SF).collect()[0]
    assert row["n_days"] == n
    assert abs(row["nw_lrv"] - lrv) < 1e-6 * max(1.0, abs(lrv))
    infl = lrv_num / (lp1 * gamma[0])
    assert abs(row["inflation_vs_gamma0"] - infl) < 1e-9


def test_runs_updown_matches_python(spark):
    from de4ml_spark.queries.statq5 import runs_updown_daily

    daily = _daily_counts_9c()
    ys = [daily[d] for d in sorted(daily)]
    signs = []
    for a, b in zip(ys, ys[1:]):
        if b != a:
            signs.append(1 if b > a else -1)
    m = len(signs)
    runs = 1 + sum(
        1 for a, b in zip(signs, signs[1:]) if a != b
    )
    z = (runs - (2 * m - 1) / 3) / math.sqrt((16 * m - 29) / 90)
    row = runs_updown_daily(spark, SF).collect()[0]
    assert row["m_diffs"] == m
    assert row["n_runs"] == runs
    assert abs(row["z_runs_updown"] - z) < 1e-12


def test_brand_assortativity_matches_python(spark):
    from de4ml_spark.queries.graphq import brand_assortativity_parts

    con = duckdb.connect()
    edges = con.sql(
        f"""SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM '{SF}/lineitem.parquet' a
        JOIN '{SF}/lineitem.parquet' b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey"""
    ).fetchall()
    brand = dict(
        con.sql(
            f"SELECT p_partkey, p_brand FROM '{SF}/part.parquet'"
        ).fetchall()
    )
    from collections import Counter

    m = len(edges)
    t_same = sum(1 for u, v in edges if brand[u] == brand[v])
    a_i = Counter()
    for u, v in edges:
        a_i[brand[u]] += 1
        a_i[brand[v]] += 1
    # Newman categorical assortativity on edge fractions e_ij over 2m
    tr = t_same / m  # Tr e: both half-edge orientations same-brand
    sa2 = sum((x / (2 * m)) ** 2 for x in a_i.values())
    r = (tr - sa2) / (1 - sa2)
    row = brand_assortativity_parts(spark, SF).collect()[0]
    assert row["m_edges"] == m and row["t_same"] == t_same
    assert abs(row["r_categorical"] - r) < 1e-9


def _emb_micro():
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    return [
        [math.floor(float(x) * 1e6 + 0.5) for x in emb]
        for (emb,) in rows
    ]


def test_participation_ratio_matches_numpy(spark):
    from de4ml_spark.queries.simq import participation_ratio_embeddings

    import numpy as np

    m = np.array(_emb_micro(), dtype=float)
    c = np.cov(m, rowvar=False)  # independent path: numpy covariance
    tr = float(np.trace(c))
    frob = float((c * c).sum())
    pr = tr * tr / frob
    row = participation_ratio_embeddings(spark, SF).collect()[0]
    assert row["n_vecs"] == m.shape[0]
    assert row["d_dims"] == m.shape[1]
    # cell-level halfup quantization to integer micro^2 units
    assert abs(row["participation_ratio"] - pr) < 1e-4 * pr
    assert 1.0 <= row["participation_ratio"] <= m.shape[1]


def test_mean_pairwise_dot_matches_python(spark):
    from de4ml_spark.queries.simq import mean_pairwise_dot_embeddings

    vecs = _emb_micro()
    n = len(vecs)
    d = len(vecs[0])
    cent = [sum(v[j] for v in vecs) for j in range(d)]
    cent_sq = sum(c * c for c in cent)
    s_norm = sum(sum(x * x for x in v) for v in vecs)
    mpd = (cent_sq - s_norm) / (n * (n - 1)) / 1e12
    mns = s_norm / n / 1e12
    row = mean_pairwise_dot_embeddings(spark, SF).collect()[0]
    assert row["n_vecs"] == n
    assert abs(row["mean_pairwise_dot"] - mpd) < 1e-9 * max(
        1.0, abs(mpd)
    )
    assert abs(row["mean_norm_sq"] - mns) < 1e-9 * mns
    assert abs(
        row["anisotropy_ratio"] - mpd / mns
    ) < 1e-9 * max(1.0, abs(mpd / mns))


def test_ams_f2_sketch_matches_python(spark):
    from de4ml_spark.queries.sketchq import AMS_ROWS, ams_f2_sketch_events

    import hashlib

    con = duckdb.connect()
    freqs = dict(
        con.sql(
            f"""SELECT user_id, COUNT(*) FROM '{SF}/events.parquet'
            WHERE user_id IS NOT NULL GROUP BY 1"""
        ).fetchall()
    )
    f2_true = sum(f * f for f in freqs.values())

    def sign(j, uid):
        h = hashlib.md5(f"{j}:{uid}".encode()).digest()
        # portable hash: little-endian int of the LAST 8 bytes, bit 0
        return 1 if (h[8] & 1) else -1

    s_sq = 0
    for j in range(AMS_ROWS):
        s_j = sum(sign(j, uid) * f for uid, f in freqs.items())
        s_sq += s_j * s_j
    est = s_sq / AMS_ROWS
    row = ams_f2_sketch_events(spark, SF).collect()[0]
    assert row["k_rows"] == AMS_ROWS
    assert row["n_users"] == len(freqs)
    assert row["f2_true_d"] == float(f2_true)
    assert abs(row["f2_est"] - est) < 1e-9 * max(1.0, est)
    assert abs(row["rel_err"] - (est - f2_true) / f2_true) < 1e-12
    # ballpark only: a K=16 AMS mean has std ~sqrt(2/16)*F2, so
    # |rel_err| ~ 0.35 sigma-units; 1.5 is a ~4-sigma smoke bound
    assert abs(row["rel_err"]) < 1.5


def test_weibull_fit_matches_python(spark):
    from de4ml_spark.queries.statq5 import weibull_fit_user_lifetimes

    con = duckdb.connect()
    durs = [
        d
        for (d,) in con.sql(
            f"""SELECT date_diff('day', MIN(CAST(ts AS DATE)),
                       MAX(CAST(ts AS DATE)))
            FROM '{SF}/events.parquet'
            WHERE user_id IS NOT NULL GROUP BY user_id"""
        ).fetchall()
        if d >= 1
    ]
    from collections import Counter

    hist = sorted(Counter(durs).items())
    n = len(durs)
    pts = []
    cum = 0
    for dur, c in hist:
        cum += c
        one_minus_f = (2 * (n - cum) + c) / (2 * n)
        u = -math.log(one_minus_f)
        if math.floor(u * 1e6 + 0.5) < 1:
            continue
        pts.append((math.log(dur), math.log(u)))
    m = len(pts)
    mx = sum(x for x, _ in pts) / m
    my = sum(y for _, y in pts) / m
    sxx = sum((x - mx) ** 2 for x, _ in pts)
    sxy = sum((x - mx) * (y - my) for x, y in pts)
    shape = sxy / sxx
    intercept = my - shape * mx
    ln_scale = -intercept / shape
    row = weibull_fit_user_lifetimes(spark, SF).collect()[0]
    assert row["n_points"] == m
    # double micro-quantized ln inputs
    assert abs(row["weibull_shape"] - shape) < 1e-3
    assert abs(row["weibull_ln_scale"] - ln_scale) < 1e-3
    assert row["weibull_shape"] > 0


def test_bowker_symmetry_matches_python(spark):
    from de4ml_spark.queries.statq5 import bowker_symmetry_transitions

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT user_id, event_type, ts, event_id
        FROM '{SF}/events.parquet'
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        ORDER BY user_id, ts, event_id"""
    ).fetchall()
    from collections import Counter, defaultdict

    seqs = defaultdict(list)
    for uid, et, ts, eid in rows:
        seqs[uid].append(et)
    c = Counter()
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            c[(a, b)] += 1
    types = sorted({t for pair in c for t in pair})
    chi2 = 0.0
    df = 0
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            cij, cji = c.get((a, b), 0), c.get((b, a), 0)
            if cij + cji == 0:
                continue
            df += 1
            chi2 += (cij - cji) ** 2 / (cij + cji)
    row = bowker_symmetry_transitions(spark, SF).collect()[0]
    assert row["n_transitions"] == sum(c.values())
    assert row["df_pairs"] == df
    # per-pair micro quantization
    assert abs(row["chi2_bowker"] - chi2) < 1e-4


def test_gwet_ac1_matches_python(spark):
    from de4ml_spark.queries.statq5 import gwet_ac1_docs

    con = duckdb.connect()
    flags = con.sql(
        f"""SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END,
            CASE WHEN len(string_split(text, ' ')) >= 50
                 THEN 1 ELSE 0 END
        FROM '{SF}/documents.parquet'"""
    ).fetchall()
    n = len(flags)
    agree = sum(1 for a, b in flags if a == b)
    p_a = agree / n
    pi = (sum(a for a, _ in flags) + sum(b for _, b in flags)) / (2 * n)
    p_e = 2 * pi * (1 - pi)
    ac1 = (p_a - p_e) / (1 - p_e)
    row = gwet_ac1_docs(spark, SF).collect()[0]
    assert row["n_tot"] == n and row["agree"] == agree
    assert abs(row["gwet_ac1"] - ac1) < 1e-12


def test_moran_geary_matches_python(spark):
    from de4ml_spark.queries.graphq import moran_geary_parts

    con = duckdb.connect()
    edges = con.sql(
        f"""SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM '{SF}/lineitem.parquet' a
        JOIN '{SF}/lineitem.parquet' b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey"""
    ).fetchall()
    rev = dict(
        con.sql(
            f"""SELECT l_partkey,
                CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2))))
                 AS DECIMAL(38,4)) * 10000 AS BIGINT)
            FROM '{SF}/lineitem.parquet' GROUP BY 1"""
        ).fetchall()
    )
    node_set = sorted({u for u, _ in edges} | {v for _, v in edges})
    xs = {p: rev[p] for p in node_set}
    n = len(node_set)
    m = len(edges)
    mean = sum(xs.values()) / n
    den = sum((x - mean) ** 2 for x in xs.values())
    s_zz = sum((xs[u] - mean) * (xs[v] - mean) for u, v in edges)
    s_dz = sum((xs[u] - xs[v]) ** 2 for u, v in edges)
    moran = (n / (2 * m)) * (2 * s_zz) / den
    geary = ((n - 1) * s_dz) / (2 * m * den)
    row = moran_geary_parts(spark, SF).collect()[0]
    assert row["n_nodes"] == n and row["m_edges"] == m
    assert abs(row["moran_i"] - moran) < 1e-9 * max(1.0, abs(moran))
    assert abs(row["geary_c"] - geary) < 1e-9 * max(1.0, geary)


def test_poisson_bootstrap_matches_python(spark):
    from de4ml_spark.queries.samplingq import (
        BOOT_REPS,
        _POIS_T,
        poisson_bootstrap_value_mean,
    )

    import hashlib

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT event_id,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM '{SF}/events.parquet' WHERE value IS NOT NULL"""
    ).fetchall()

    def u59(r, eid):
        h = hashlib.md5(f"{r}:{eid}".encode()).digest()
        # little-endian int of the last 8 bytes, low 59 bits
        return int.from_bytes(h[8:16], "little") & ((1 << 59) - 1)

    def w(r, eid):
        u = u59(r, eid)
        for k, t in enumerate(_POIS_T):
            if u < t:
                return k
        return 8

    means = []
    for r in range(BOOT_REPS):
        sw = swx = 0
        for eid, v in rows:
            wt = w(r, eid)
            sw += wt
            swx += wt * v
        # halfup micro
        means.append((2 * swx * 1_000_000 + sw) // (2 * sw))
    means.sort()
    row = poisson_bootstrap_value_mean(spark, SF).collect()[0]
    assert row["n_events"] == len(rows)
    assert row["b_reps"] == BOOT_REPS
    assert row["ci_lo_cents"] == means[1] / 1e6
    assert row["ci_hi_cents"] == means[BOOT_REPS - 2] / 1e6
    mean = sum(v for _, v in rows) / len(rows)
    assert abs(row["mean_value_cents"] - mean) < 1e-9
    # CI should bracket the point estimate
    assert row["ci_lo_cents"] <= mean <= row["ci_hi_cents"]


def test_two_way_anova_matches_python(spark):
    from de4ml_spark.queries.statq5 import two_way_anova_daily

    days, types, cnt = _day_type_counts()
    n, k = len(days), len(types)
    grid = {(d, t): cnt.get((d, t), 0) for d in days for t in types}
    grand = sum(grid.values()) / (n * k)
    ss_rows = k * sum(
        (sum(grid[(d, t)] for t in types) / k - grand) ** 2
        for d in days
    )
    ss_cols = n * sum(
        (sum(grid[(d, t)] for d in days) / n - grand) ** 2
        for t in types
    )
    ss_tot = sum((v - grand) ** 2 for v in grid.values())
    ss_err = ss_tot - ss_rows - ss_cols
    f_days = (ss_rows / (n - 1)) / (ss_err / ((n - 1) * (k - 1)))
    f_types = (ss_cols / (k - 1)) / (ss_err / ((n - 1) * (k - 1)))
    row = two_way_anova_daily(spark, SF).collect()[0]
    assert row["n_days"] == n and row["k_types"] == k
    assert abs(row["f_days"] - f_days) < 1e-9 * max(1.0, f_days)
    assert abs(row["f_types"] - f_types) < 1e-9 * max(1.0, f_types)


def test_trimmed_mean_matches_python(spark):
    from de4ml_spark.queries.statq5 import trimmed_mean_value_types

    s = _values_by_type("signup", "click", "error", "view",
                        "purchase")
    rows = {
        r["event_type"]: r
        for r in trimmed_mean_value_types(spark, SF).collect()
    }
    for et, vals in s.items():
        if not vals:
            continue
        n = len(vals)
        k = n // 10
        kept = vals[k : n - k]
        r = rows[et]
        assert r["n_total"] == n
        assert r["n_kept"] == len(kept)
        expect = sum(kept) / len(kept)
        assert abs(r["trimmed_mean_cents"] - expect) < 1e-9 * expect


def test_chapman_overlap_matches_python(spark):
    from de4ml_spark.queries.textq4 import chapman_overlap_sources

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    from collections import Counter
    import hashlib

    by_src = Counter(s for s, _ in docs)
    top2 = sorted(by_src.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    (sa, _), (sb, _) = top2
    fa = {hashlib.md5(t.encode()).hexdigest() for s, t in docs if s == sa}
    fb = {hashlib.md5(t.encode()).hexdigest() for s, t in docs if s == sb}
    n1, n2, m = len(fa), len(fb), len(fa & fb)
    n_hat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    row = chapman_overlap_sources(spark, SF).collect()[0]
    assert (row["src_a"], row["src_b"]) == (sa, sb)
    assert (row["n1"], row["n2"], row["m_common"]) == (n1, n2, m)
    assert abs(row["chapman_n_hat"] - n_hat) < 1e-9 * max(1.0, n_hat)


def test_vocab_jaccard_matches_python(spark):
    from de4ml_spark.queries.textq4 import vocab_jaccard_sources

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    from collections import defaultdict

    vocab = defaultdict(set)
    for s, t in docs:
        vocab[s].update(t.split(" "))
    srcs = sorted(vocab)
    rows = {
        (r["src_a"], r["src_b"]): r
        for r in vocab_jaccard_sources(spark, SF).collect()
    }
    n_pairs = 0
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                assert (a, b) not in rows
                continue
            n_pairs += 1
            union = len(vocab[a] | vocab[b])
            r = rows[(a, b)]
            assert r["inter_v"] == inter and r["union_v"] == union
            assert abs(r["vocab_jaccard"] - inter / union) < 1e-12
    assert len(rows) == n_pairs


def test_brunner_munzel_matches_python(spark):
    from de4ml_spark.queries.statq5 import brunner_munzel_value

    s = _values_by_type("click", "purchase")
    a, b = s["click"], s["purchase"]
    m, n = len(a), len(b)
    pooled = sorted(a + b)

    def midranks(sample, within):
        import bisect

        out = []
        wsorted = sorted(within)
        for x in sample:
            pl = bisect.bisect_left(pooled, x)
            pr_ = bisect.bisect_right(pooled, x)
            r_pooled = pl + (pr_ - pl + 1) / 2
            wl = bisect.bisect_left(wsorted, x)
            wr = bisect.bisect_right(wsorted, x)
            r_within = wl + (wr - wl + 1) / 2
            out.append(r_pooled - r_within)
        return out

    d_a = midranks(a, a)
    d_b = midranks(b, b)

    def svar(xs):
        mu = sum(xs) / len(xs)
        return sum((x - mu) ** 2 for x in xs) / (len(xs) - 1)

    r1m = sum(d_a) / m + (m + 1) / 2
    r2m = sum(d_b) / n + (n + 1) / 2
    v1, v2 = svar(d_a), svar(d_b)
    # lawstat form: W = m*n*(r2m - r1m)/((m+n)*sqrt(m*v1 + n*v2))
    w = m * n * (r2m - r1m) / ((m + n) * math.sqrt(m * v1 + n * v2))
    row = brunner_munzel_value(spark, SF).collect()[0]
    assert row["n_a"] == m and row["n_b"] == n
    assert abs(row["w_brunner_munzel"] - w) < 1e-9 * max(1.0, abs(w))


def test_dunn_posthoc_matches_python(spark):
    from de4ml_spark.queries.statq5 import dunn_posthoc_value_types

    s = _values_by_type(
        "signup", "click", "error", "view", "purchase"
    )
    pooled = sorted(v for vals in s.values() for v in vals)
    n_tot = len(pooled)
    import bisect
    from collections import Counter

    def midrank_sum(vals):
        out = 0.0
        for x in vals:
            lo = bisect.bisect_left(pooled, x)
            hi = bisect.bisect_right(pooled, x)
            out += lo + (hi - lo + 1) / 2
        return out

    rbar = {t: midrank_sum(v) / len(v) for t, v in s.items() if v}
    tie_t = sum(c**3 - c for c in Counter(pooled).values())
    var_base = n_tot * (n_tot + 1) / 12 - tie_t / (12 * (n_tot - 1))
    rows = {
        (r["type_a"], r["type_b"]): r
        for r in dunn_posthoc_value_types(spark, SF).collect()
    }
    types = sorted(rbar)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            z = (rbar[ta] - rbar[tb]) / math.sqrt(
                var_base * (1 / len(s[ta]) + 1 / len(s[tb]))
            )
            r = rows[(ta, tb)]
            assert r["n_a"] == len(s[ta]) and r["n_b"] == len(s[tb])
            assert abs(r["z_dunn"] - z) < 1e-9 * max(1.0, abs(z))


def test_seasonal_mann_kendall_matches_python(spark):
    from de4ml_spark.queries.statq5 import seasonal_mann_kendall_daily

    daily = _daily_counts_9c()
    from collections import Counter, defaultdict

    seasons = defaultdict(list)
    for d in sorted(daily):
        seasons[d.isoweekday()].append(daily[d])
    s_stat = 0
    var18 = 0
    n_days = 0
    for vals in seasons.values():
        n = len(vals)
        n_days += n
        for i in range(n):
            for j in range(i + 1, n):
                s_stat += (vals[j] > vals[i]) - (vals[j] < vals[i])
        tsum = sum(
            t * (t - 1) * (2 * t + 5)
            for t in Counter(vals).values()
        )
        var18 += n * (n - 1) * (2 * n + 5) - tsum
    var = var18 / 18
    if s_stat > 0:
        z = (s_stat - 1) / math.sqrt(var)
    elif s_stat < 0:
        z = (s_stat + 1) / math.sqrt(var)
    else:
        z = 0.0
    row = seasonal_mann_kendall_daily(spark, SF).collect()[0]
    assert row["n_days"] == n_days
    assert row["s_stat"] == s_stat
    assert abs(row["z_seasonal_mk"] - z) < 1e-12


def test_cucconi_matches_python(spark):
    from de4ml_spark.queries.statq5 import cucconi_value

    s = _values_by_type("click", "purchase")
    a, b = s["click"], s["purchase"]
    m, n = len(a), len(b)
    nn = m + n
    pooled = sorted(a + b)
    import bisect

    def midrank(x):
        lo = bisect.bisect_left(pooled, x)
        hi = bisect.bisect_right(pooled, x)
        return lo + (hi - lo + 1) / 2

    ranks_b = [midrank(x) for x in b]
    sr2 = sum(r * r for r in ranks_b)
    sc2 = sum((nn + 1 - r) ** 2 for r in ranks_b)
    den = math.sqrt(m * n * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5)
    u = (6 * sr2 - n * (nn + 1) * (2 * nn + 1)) / den
    v = (6 * sc2 - n * (nn + 1) * (2 * nn + 1)) / den
    rho = 2 * (nn * nn - 4) / ((2 * nn + 1) * (8 * nn + 11)) - 1
    c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    row = cucconi_value(spark, SF).collect()[0]
    assert row["n_a"] == m and row["n_b"] == n
    assert abs(row["u_loc"] - u) < 1e-9 * max(1.0, abs(u))
    assert abs(row["v_scale"] - v) < 1e-9 * max(1.0, abs(v))
    assert abs(row["cucconi_c"] - c) < 1e-9 * max(1.0, abs(c))
    assert row["cucconi_c"] >= 0


def test_uncertainty_coeff_matches_python(spark):
    from de4ml_spark.queries.statq5 import uncertainty_coeff_dow_type

    con = duckdb.connect()
    raw = con.sql(
        f"""SELECT CAST(ts AS DATE), event_type, COUNT(*)
        FROM '{SF}/events.parquet'
        WHERE event_type IS NOT NULL GROUP BY 1, 2"""
    ).fetchall()
    from collections import Counter

    cells = Counter()
    for day, et, c in raw:
        cells[(day.isoweekday() % 7, et)] += c
    n = sum(cells.values())
    cx = Counter()
    cy = Counter()
    for (dow, et), c in cells.items():
        cx[et] += c
        cy[dow] += c
    mi = sum(
        c / n * math.log(n * c / (cx[et] * cy[dow]))
        for (dow, et), c in cells.items()
    )
    hx = sum(c / n * math.log(n / c) for c in cx.values())
    row = uncertainty_coeff_dow_type(spark, SF).collect()[0]
    assert row["n_events"] == n
    assert abs(row["mutual_info_nats"] - mi) < 1e-5
    assert abs(row["uncertainty_coefficient"] - mi / hx) < 1e-4


def test_youden_threshold_matches_python(spark):
    from de4ml_spark.queries.statq5 import youden_threshold_value

    s = _values_by_type("click", "purchase")
    a, b = s["click"], s["purchase"]
    na, nb = len(a), len(b)
    support = sorted(set(a) | set(b))
    best = None
    for v in support:
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        j_num = abs(ca * nb - cb * na)
        key = (j_num, -v)
        if best is None or key > best[0]:
            best = (key, v, nb - cb, na - ca)
    (j_num, _), thr, tp, fp = best
    row = youden_threshold_value(spark, SF).collect()[0]
    assert row["threshold_cents"] == thr
    assert row["n_a"] == na and row["n_b"] == nb
    assert row["tp"] == tp and row["fp"] == fp
    assert abs(row["youden_j"] - j_num / (na * nb)) < 1e-12


def test_keyness_matches_python(spark):
    from de4ml_spark.queries.textq4 import (
        KEYNESS_K,
        keyness_terms_sources,
    )

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    from collections import Counter

    by_src = Counter(s for s, _ in docs)
    top2 = sorted(by_src.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    (sa, _), (sb, _) = top2
    ca, cb = Counter(), Counter()
    for s, t in docs:
        if s == sa:
            ca.update(t.split(" "))
        elif s == sb:
            cb.update(t.split(" "))
    na, nb = sum(ca.values()), sum(cb.values())
    n = na + nb
    g2 = {}
    for term in set(ca) | set(cb):
        a, b = ca.get(term, 0), cb.get(term, 0)
        val = 0.0
        if a > 0:
            val += a * math.log(a * n / (na * (a + b)))
        if b > 0:
            val += b * math.log(b * n / (nb * (a + b)))
        g2[term] = 2 * val
    rows = keyness_terms_sources(spark, SF).collect()
    assert len(rows) == KEYNESS_K
    # engine top-K is by the micro-quantized G2, so compare values
    # rather than insisting on identical tie order at the cut
    for r in rows:
        t = r["term"]
        assert abs(r["g2_keyness"] - g2[t]) < 1e-3 * max(
            1.0, abs(g2[t])
        )
        assert r["cnt_a"] == ca.get(t, 0)
        assert r["cnt_b"] == cb.get(t, 0)
    # the true top term must be the engine's top term
    best = max(g2.items(), key=lambda kv: (kv[1], kv[0]))[0]
    top_terms = {r["term"] for r in rows[:3]}
    assert best in top_terms


def test_mahalanobis_matches_numpy(spark):
    from de4ml_spark.queries.statq5 import (
        MAHAL_TOPK,
        mahalanobis_anomalous_days,
    )

    import numpy as np

    con = duckdb.connect()
    daily = con.sql(
        f"""SELECT CAST(ts AS DATE) AS day,
            SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END),
            SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    days = [d for d, _x, _y in daily]
    m = np.array([[float(x), float(y)] for _d, x, y in daily])
    mu = m.mean(axis=0)
    cov = np.cov(m, rowvar=False, bias=True)  # population covariance
    inv = np.linalg.inv(cov)
    d2 = np.einsum("ij,jk,ik->i", m - mu, inv, m - mu)
    order = sorted(
        range(len(days)), key=lambda i: (-d2[i], days[i])
    )[:MAHAL_TOPK]
    expect = {days[i]: d2[i] for i in order}
    rows = mahalanobis_anomalous_days(spark, SF).collect()
    assert len(rows) == MAHAL_TOPK
    for r in rows:
        assert r["day"] in expect
        assert abs(r["mahal_d2"] - expect[r["day"]]) < 1e-6


def test_burrows_delta_matches_python(spark):
    from de4ml_spark.queries.textq4 import (
        BURROWS_K,
        burrows_delta_sources,
    )

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    from collections import Counter, defaultdict

    per_src = defaultdict(Counter)
    for s, t in docs:
        per_src[s].update(t.split(" "))
    corpus = Counter()
    for c in per_src.values():
        corpus.update(c)
    topk = [
        t
        for t, _ in sorted(
            corpus.items(), key=lambda kv: (-kv[1], kv[0])
        )[:BURROWS_K]
    ]  # may be shorter than K on the tiny sf0.001 vocabulary
    totals = {s: sum(c.values()) for s, c in per_src.items()}
    # nano-quantized relative freqs, replicating the plan
    f9 = {
        (s, t): (2 * per_src[s][t] * 10**9 + totals[s])
        // (2 * totals[s])
        for s in per_src
        for t in topk
    }
    srcs = sorted(per_src)
    by_docs = Counter(s for s, _ in docs)
    (sa, _), (sb, _) = sorted(
        by_docs.items(), key=lambda kv: (-kv[1], kv[0])
    )[:2]
    delta = 0.0
    for t in topk:
        vals = [f9[(s, t)] for s in srcs]
        n = len(vals)
        var = (n * sum(v * v for v in vals) - sum(vals) ** 2)
        term = (
            n * abs(f9[(sa, t)] - f9[(sb, t)]) / math.sqrt(var)
        )
        delta += math.floor(term * 1e6 + 0.5) / 1e6
    delta /= len(topk)
    row = burrows_delta_sources(spark, SF).collect()[0]
    assert (row["src_a"], row["src_b"]) == (sa, sb)
    assert row["n_terms"] == len(topk)
    assert abs(row["burrows_delta"] - delta) < 1e-6


def test_cohens_d_matches_python(spark):
    from de4ml_spark.queries.statq5 import cohens_d_value

    s = _values_by_type("click", "purchase")
    a, b = s["click"], s["purchase"]
    m, n = len(a), len(b)
    ma, mb = sum(a) / m, sum(b) / n
    ssa = sum((x - ma) ** 2 for x in a)
    ssb = sum((x - mb) ** 2 for x in b)
    sp = math.sqrt((ssa + ssb) / (m + n - 2))
    d = (ma - mb) / sp
    g = d * (1 - 3 / (4 * (m + n) - 9))
    row = cohens_d_value(spark, SF).collect()[0]
    assert row["n_a"] == m and row["n_b"] == n
    assert abs(row["cohens_d"] - d) < 1e-9 * max(1.0, abs(d))
    assert abs(row["hedges_g"] - g) < 1e-9 * max(1.0, abs(g))


def test_mcc_threshold_matches_python(spark):
    from de4ml_spark.queries.statq5 import mcc_threshold_value

    s = _values_by_type("click", "purchase")
    a, b = s["click"], s["purchase"]
    na, nb = len(a), len(b)
    support = sorted(set(a) | set(b))
    best = None
    for v in support:
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        key = (abs(ca * nb - cb * na), -v)
        if best is None or key > best[0]:
            best = (key, v, nb - cb, na - ca, ca, cb)
    _k, thr, tp, fp, tn, fn = best
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    row = mcc_threshold_value(spark, SF).collect()[0]
    assert row["threshold_cents"] == thr
    assert (row["tp"], row["fp"], row["tn"], row["fn"]) == (
        tp, fp, tn, fn,
    )
    assert abs(row["mcc"] - mcc) < 1e-12


def test_ewma_chart_matches_python(spark):
    from de4ml_spark.queries.tsq2 import EWMA_LAGS, ewma_chart_daily

    daily = _daily_counts_9c()
    idx = {(d - min(daily)).days: daily[d] for d in daily}
    w_tot = (1 << EWMA_LAGS) - 1
    n = len(idx)
    s = sum(idx.values())
    vnum = n * sum(v * v for v in idx.values()) - s * s
    sigma_term = w_tot * math.sqrt(vnum) * 0.5773502691896257
    scored = []
    for t in sorted(idx):
        lag = [idx.get(t - j) for j in range(1, EWMA_LAGS + 1)]
        if any(v is None for v in lag):
            continue
        z = sum(
            v * (1 << (EWMA_LAGS - j))
            for j, v in zip(range(1, EWMA_LAGS + 1), lag)
        )
        dev = idx[t] * w_tot - z
        scored.append(abs(dev) * n / sigma_term)
    row = ewma_chart_daily(spark, SF).collect()[0]
    assert row["n_scored"] == len(scored)
    assert row["n_violations"] == sum(1 for x in scored if x > 3.0)
    assert abs(row["max_abs_standardized"] - max(scored)) < 1e-12


def test_benford_second_digit_matches_python(spark):
    from de4ml_spark.queries.sketchq import (
        benford_second_digit_totalprice,
    )

    con = duckdb.connect()
    vals = [
        v
        for (v,) in con.sql(
            f"""SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2))
                 AS VARCHAR)
            FROM '{SF}/orders.parquet'"""
        ).fetchall()
    ]
    from collections import Counter

    obs = Counter(
        int(s[1]) for s in vals if len(s) > 1 and s[1].isdigit()
    )
    n = sum(obs.values())
    expect_p = [
        sum(math.log10(1 + 1 / (10 * k + d)) for k in range(1, 10))
        for d in range(10)
    ]
    chi2 = 0.0
    for d in range(10):
        e = n * expect_p[d]
        chi2 += math.floor(
            (obs.get(d, 0) - e) ** 2 / e * 1e6 + 0.5
        ) / 1e6
    rows = benford_second_digit_totalprice(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["observed"] == obs.get(r["digit"], 0)
        assert abs(
            r["expected_micro"] / 1e6 - n * expect_p[r["digit"]]
        ) < 1e-5 * n
        assert abs(r["chi2_r"] - chi2) < 1e-9


def test_clustering_summary_matches_python(spark):
    from de4ml_spark.queries.graphq import clustering_summary_parts

    con = duckdb.connect()
    edges = set(
        con.sql(
            f"""SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM '{SF}/lineitem.parquet' a
        JOIN '{SF}/lineitem.parquet' b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey"""
        ).fetchall()
    )
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    t_v = Counter()
    total = 0
    nodes = sorted(adj)
    for u, v in edges:
        common = adj[u] & adj[v]
        for w in common:
            if w > v:  # count each triangle once at its max corner
                total += 1
                t_v[u] += 1
                t_v[v] += 1
                t_v[w] += 1
    sum_local = 0.0
    n2 = 0
    sum_dd1 = 0
    for node in nodes:
        d = len(adj[node])
        if d < 2:
            continue
        n2 += 1
        sum_dd1 += d * (d - 1)
        # replicate the half-up micro quantization
        num = 2 * t_v.get(node, 0) * 1_000_000
        den = d * (d - 1)
        sum_local += (2 * num + den) // (2 * den) / 1e6
    row = clustering_summary_parts(spark, SF).collect()[0]
    assert row["n_nodes_deg2"] == n2
    assert row["total_triangles"] == total
    assert abs(row["avg_local_clustering"] - sum_local / n2) < 1e-9
    assert abs(
        row["global_transitivity"] - 6 * total / sum_dd1
    ) < 1e-12
