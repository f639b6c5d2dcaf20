"""Statistical-test tier: invariants beyond the DuckDB value-hash gate —
Mann-Whitney U identities against a pure-Python midrank recompute,
Agresti-Coull bounds bit-equal to Python's IEEE ops, Kaplan-Meier vs
Nelson-Aalen ordering, and attribution credit conservation."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_mann_whitney_matches_python_midranks(spark):
    """U for (click, view) must equal a driver-side midrank recompute,
    and every pair must satisfy the U-range identity 0 <= U <= n_a*n_b."""
    from de4ml_spark.queries.statq import mann_whitney_value
    from de4ml_spark.session import load_table

    out = {
        (r["type_a"], r["type_b"]): r
        for r in mann_whitney_value(spark, SF).collect()
    }
    assert len(out) == 10  # 5 choose 2 event-type pairs

    ev = load_table(spark, SF, "events")
    vals = {
        t: [
            int(r["v_c"])
            for r in ev.filter(F.col("event_type") == t)
            .selectExpr(
                "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c"
            )
            .collect()
        ]
        for t in ("click", "view")
    }
    a, b = vals["click"], vals["view"]
    pooled = sorted(a + b)
    # midrank ×2 per value: 2*minrank + cnt - 1
    first = {}
    cnt = {}
    for i, v in enumerate(pooled):
        first.setdefault(v, i + 1)
        cnt[v] = cnt.get(v, 0) + 1
    r1_2x = sum(2 * first[v] + cnt[v] - 1 for v in a)
    u_2x = r1_2x - len(a) * (len(a) + 1)

    row = out[("click", "view")]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert row["u_a_x2"] == u_2x
    for r in out.values():
        assert 0 <= r["u_a_x2"] <= 2 * r["n_a"] * r["n_b"]
        # z recompute (same IEEE op chain) — exact float equality
        n = r["n_a"] + r["n_b"]
        varnum = float(
            r["n_a"]
            * r["n_b"]
            * ((n + 1) * n * (n - 1) - r["tie_sum"])
        )
        varden = float(12 * n * (n - 1))
        znum = float(r["u_a_x2"]) - float(r["n_a"] * r["n_b"])
        assert r["z"] == znum / (2.0 * math.sqrt(varnum / varden))


def test_plus4_bounds_bit_equal_python(spark):
    """The z=2 Agresti-Coull bounds are a chain of correctly-rounded
    IEEE ops, so Python must reproduce them bit-for-bit."""
    from de4ml_spark.queries.statq import plus4_ctr_bounds

    rows = plus4_ctr_bounds(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        n, s = r["n"], r["s"]
        pd = (s + 2) / (n + 4)
        sd = math.sqrt((s + 2) * (n + 2 - s) / ((n + 4) ** 3))
        assert r["lo"] == pd - 2.0 * sd
        assert r["hi"] == pd + 2.0 * sd
        assert r["lo"] <= r["p_adj_r"] <= r["hi"]


def test_kaplan_meier_dominates_nelson_aalen(spark):
    """-ln S_KM(t) >= H_NA(t) pointwise (ln(n/(n-d)) >= d/n per step),
    and both curves are nondecreasing; the spines agree."""
    from de4ml_spark.queries.statq import kaplan_meier_retention
    from de4ml_spark.queries.tsq2 import nelson_aalen_retention

    km = {r["t"]: r for r in kaplan_meier_retention(spark, SF).collect()}
    na = {r["t"]: r for r in nelson_aalen_retention(spark, SF).collect()}
    assert set(km) == set(na)
    prev = -1
    for t in sorted(km):
        assert km[t]["n_risk"] == na[t]["n_risk"]
        assert km[t]["d_churn"] == na[t]["d_churn"]
        # per-step micro-rounding can differ by 1 each way
        slack = len(km)
        assert (
            km[t]["cum_negln_micro"] + slack >= na[t]["cumhaz_micro"]
        ), t
        assert km[t]["cum_negln_micro"] >= prev
        prev = km[t]["cum_negln_micro"]
        # ln step vs an independent Python portable-ln-free recompute:
        # within 2e-6 of math.log (quantization + ~2ulp primitive);
        # a terminal all-churn step is NULL (-inf) and must be last
        n, d = km[t]["n_risk"], km[t]["d_churn"]
        if km[t]["negln_micro"] is None:
            assert n == d and t == max(km)
        else:
            ref = math.log(n / (n - d))
            assert abs(km[t]["negln_micro"] / 1e6 - ref) < 2e-6


def test_attribution_credit_conservation(spark):
    """Every purchase with >=1 touch hands out exactly 1e6 ppm of
    first-touch and last-touch credit, and linear credit within
    n_touch/2 ppm of 1e6 (half-up rounding remainder)."""
    from de4ml_spark.queries.statq import (
        ATTR_WINDOW_DAYS,
        attribution_credit_events,
    )
    from de4ml_spark.session import load_table

    out = attribution_credit_events(spark, SF).collect()
    tot_first = sum(r["first_credit_ppm"] for r in out)
    tot_last = sum(r["last_credit_ppm"] for r in out)
    tot_linear = sum(r["linear_credit_ppm"] for r in out)

    ev = load_table(spark, SF, "events").filter(
        F.col("user_id").isNotNull()
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("ts").alias("b_ts")
    )
    touches = ev.filter(
        F.col("event_type").isin("click", "view")
    ).select(F.col("user_id").alias("u"), F.col("ts").alias("t_ts"))
    per_buy = (
        buys.join(touches, "u")
        .filter(
            (F.col("t_ts") <= F.col("b_ts"))
            & (
                F.col("t_ts")
                >= F.col("b_ts")
                - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")
            )
        )
        .groupBy("u", "b_ts")
        .count()
        .collect()
    )
    n_attributed = len(per_buy)
    assert tot_first == 1_000_000 * n_attributed
    assert tot_last == 1_000_000 * n_attributed
    max_remainder = sum(r["count"] // 2 + 1 for r in per_buy)
    assert abs(tot_linear - 1_000_000 * n_attributed) <= max_remainder


def test_mase_matches_python_recompute(spark):
    """Seasonal-naive and persistence error sums recomputed exactly
    from the daily totals."""
    from de4ml_spark.queries.statq import mase_seasonal_events
    from de4ml_spark.session import load_table

    daily = (
        load_table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.expr(
                "CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))"
                " AS DECIMAL(38,2)) * 100 AS BIGINT)"
            ).alias("v_c")
        )
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r["event_type"], {})[r["day"]] = r["v_c"]
    import datetime

    want = {}
    for t, by_day in series.items():
        days = sorted(by_day)
        e7 = e1 = n = 0
        # the query lags by ROWS then checks calendar adjacency — a
        # gap in the trailing week shifts the row-lag target, so the
        # recompute must use row positions, not calendar lookups
        for i, d in enumerate(days):
            if i < 7:
                continue
            d1, d7 = days[i - 1], days[i - 7]
            if (d - d1) == datetime.timedelta(days=1) and (
                d - d7
            ) == datetime.timedelta(days=7):
                n += 1
                e7 += abs(by_day[d] - by_day[d7])
                e1 += abs(by_day[d] - by_day[d1])
        want[t] = (n, e7, e1)
    got = {r["event_type"]: r for r in mase_seasonal_events(spark, SF).collect()}
    assert set(got) == {t for t, w in want.items() if w[0] > 0}
    for t, r in got.items():
        n, e7, e1 = want[t]
        assert (r["n_days"], r["sum_abs_err_c"], r["sum_abs_naive_c"]) == (
            n,
            e7,
            e1,
        )


def test_conformal_bound_rank_and_coverage(spark):
    """The bound is the ceil(0.9(n+1))-th smallest residual and the
    reported coverage counts match a direct recompute; coverage is at
    least the nominal level whenever n_calib admits it."""
    from de4ml_spark.queries.statq import (
        CONF_LEVEL_DEN,
        CONF_LEVEL_NUM,
        CONF_SPLIT_DAY,
        conformal_bound_events,
    )
    from de4ml_spark.session import load_table

    ev = load_table(spark, SF, "events").selectExpr(
        "event_type",
        "event_id",
        "dayofmonth(ts) AS dom",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c",
    ).collect()
    train = defaultdict(list)
    calib = defaultdict(list)
    for r in ev:
        (train if r["dom"] < CONF_SPLIT_DAY else calib)[
            r["event_type"]
        ].append((r["v_c"], r["event_id"]))
    got = {r["event_type"]: r for r in conformal_bound_events(spark, SF).collect()}
    expected_types = set()
    for t, rows in calib.items():
        if not train[t]:
            continue  # no predictor to calibrate — entry omits the type
        s = sum(v for v, _ in train[t])
        c = len(train[t])
        pred = (2 * s + c) // (2 * c)
        resid = sorted((abs(v - pred), eid) for v, eid in rows)
        n = len(resid)
        rk = ((n + 1) * CONF_LEVEL_NUM + CONF_LEVEL_DEN - 1) // CONF_LEVEL_DEN
        if rk > n:
            continue  # no finite distribution-free bound — entry omits
        expected_types.add(t)
        r = got[t]
        assert r["pred_c"] == pred
        assert r["n_calib"] == n
        assert r["bound_c"] == resid[rk - 1][0]
        within = sum(1 for x, _ in resid if x <= r["bound_c"])
        assert r["n_within"] == within
        assert within * CONF_LEVEL_DEN >= n * CONF_LEVEL_NUM
    assert set(got) == expected_types


def test_changepoint_argmin_matches_python(spark):
    """Best split day and segment means recomputed by brute force over
    exact integer SSE rationals."""
    from fractions import Fraction

    from de4ml_spark.queries.tsq2 import changepoint_value_events
    from de4ml_spark.session import load_table

    daily = (
        load_table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.expr(
                "CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))"
                " AS DECIMAL(38,2)) * 100 AS BIGINT)"
            ).alias("v_c")
        )
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r["event_type"]].append((r["day"], r["v_c"]))
    got = {
        r["event_type"]: r
        for r in changepoint_value_events(spark, SF).collect()
    }
    for t, pts in series.items():
        pts.sort()
        vals = [v for _, v in pts]
        n = len(vals)
        best = None
        for k in range(1, n):
            l, r_ = vals[:k], vals[k:]

            def sse(xs):
                s, q, m = sum(xs), sum(x * x for x in xs), len(xs)
                return Fraction(m * q - s * s, m)

            obj = sse(l) + sse(r_)
            if best is None or obj < best[0]:
                best = (obj, pts[k - 1][0], k)
        obj, day, k = best
        assert got[t]["split_day"] == day, t
        assert got[t]["n_left"] == k
        assert got[t]["n_right"] == n - k


def test_loso_influence_signs_sum(spark):
    """Removing a below-average source must RAISE the mean (positive
    delta) and vice versa; deltas recomputed as exact fractions."""
    from fractions import Fraction

    from de4ml_spark.queries.mldataq4 import loso_source_influence_docs
    from de4ml_spark.session import load_table

    per = (
        load_table(spark, SF, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("t"))
        .collect()
    )
    N = sum(r["n"] for r in per)
    T = sum(r["t"] for r in per)
    got = {
        r["source"]: r
        for r in loso_source_influence_docs(spark, SF).collect()
    }
    for r in per:
        delta = Fraction(T - r["t"], N - r["n"]) - Fraction(T, N)
        g = got[r["source"]]
        assert abs(g["delta_mean_r"] - float(delta)) <= 1e-6
        mean_s = Fraction(r["t"], r["n"])
        if mean_s < Fraction(T, N):
            assert g["delta_mean_r"] >= 0
        elif mean_s > Fraction(T, N):
            assert g["delta_mean_r"] <= 0


def test_sprt_replay_matches_python(spark):
    """Decision, decision day and LLR replayed exactly from daily
    (clicks, trials) with the same micro-quantized portable-ln consts."""
    from de4ml_spark.queries.statq import _sprt_consts, sprt_ctr_deciles
    from de4ml_spark.session import load_table

    ln43, ln98, ln19 = _sprt_consts()
    daily = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .filter(F.col("user_id").isNotNull())
        .groupBy(
            (F.col("user_id") % 10).alias("decile"),
            F.col("ts").cast("date").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("x"),
        )
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r["decile"]].append((r["day"], r["n"], r["x"]))
    got = {r["decile"]: r for r in sprt_ctr_deciles(spark, SF).collect()}
    assert set(got) == set(series)
    for dec, days in series.items():
        days.sort()
        cum = 0
        hit = None
        for i, (d, n, x) in enumerate(days, start=1):
            cum += x * ln43 - (n - x) * ln98
            if abs(cum) >= ln19:
                hit = (d, i, cum, "h1" if cum >= ln19 else "h0")
                break
        r = got[dec]
        if hit:
            assert (
                r["decision_day"],
                r["n_days_used"],
                r["llr_micro"],
                r["decision"],
            ) == hit
        else:
            assert r["decision"] == "continue"
            assert r["n_days_used"] == len(days)
            assert r["llr_micro"] == cum


def test_theil_sen_median_slope_matches_python(spark):
    from de4ml_spark.queries.tsq2 import REGISTRY as _  # noqa: F401
    from de4ml_spark.queries.statq import theil_sen_trend_events
    from de4ml_spark.session import load_table

    daily = (
        load_table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.expr(
                "CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))"
                " AS DECIMAL(38,2)) * 100 AS BIGINT)"
            ).alias("v_c")
        )
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r["event_type"]].append((r["day"], r["v_c"]))
    got = {
        r["event_type"]: r
        for r in theil_sen_trend_events(spark, SF).collect()
    }
    for t, pts in series.items():
        pts.sort()
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                d1, v1 = pts[i]
                d2, v2 = pts[j]
                slopes.append(
                    (float(v2 - v1) / float((d2 - d1).days), d1, d2)
                )
        slopes.sort()
        m = len(slopes)
        med = slopes[(m + 1) // 2 - 1][0]
        assert got[t]["n_pairs"] == m
        assert got[t]["median_slope_r"] == med


def test_pareto_partitions_and_shares(spark):
    """ABC classes partition the part set, class revenue sums to the
    total, and the A-class share is the largest and ~80%."""
    from de4ml_spark.queries.relational3 import pareto_revenue_parts
    from de4ml_spark.session import load_table

    rows = {r["abc_class"]: r for r in pareto_revenue_parts(spark, SF).collect()}
    assert set(rows) == {"A", "B", "C"}
    n_parts_total = (
        load_table(spark, SF, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r["n_parts"] for r in rows.values()) == n_parts_total
    total = sum(r["class_rev_c4"] for r in rows.values())
    assert abs(sum(r["rev_share_r"] for r in rows.values()) - 1.0) < 1e-5
    # A holds at most 80% (boundary part tips it under), B tops it to 95%
    assert rows["A"]["class_rev_c4"] * 5 <= total * 4
    assert (rows["A"]["class_rev_c4"] + rows["B"]["class_rev_c4"]) * 20 <= total * 19


def test_rfm_scores_partition_customers(spark):
    """Every customer lands in exactly one segment; scores are 1..5 and
    quintile sizes differ by at most one per dimension."""
    from de4ml_spark.queries.relational3 import rfm_segments_customers
    from de4ml_spark.session import load_table

    rows = rfm_segments_customers(spark, SF).collect()
    n_cust = (
        load_table(spark, SF, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for dim in ("r_score", "f_score", "m_score"):
        per = defaultdict(int)
        for r in rows:
            assert 1 <= r[dim] <= 5
            per[r[dim]] += r["n_customers"]
        assert max(per.values()) - min(per.values()) <= 1


def test_isotonic_fit_matches_pava(spark):
    """The minimax closed form must equal the classic sequential PAVA
    merge, and the fit must be non-decreasing while preserving the
    weighted total."""
    from fractions import Fraction

    from de4ml_spark.queries.statq import isotonic_ctr_deciles

    rows = sorted(
        isotonic_ctr_deciles(spark, SF).collect(), key=lambda r: r["bin"]
    )
    # PAVA on exact rationals
    blocks = []  # (sum_s, sum_n)
    for r in rows:
        blocks.append((r["s"], r["n"]))
        while len(blocks) > 1 and Fraction(*blocks[-2]) >= Fraction(
            *blocks[-1]
        ):
            s2, n2 = blocks.pop()
            s1, n1 = blocks.pop()
            blocks.append((s1 + s2, n1 + n2))
    # expand blocks back to bins
    expanded = []
    idx = 0
    for s, n in blocks:
        # count how many bins the block covers by accumulating n
        covered = 0
        acc = 0
        while acc < n:
            acc += rows[idx + covered]["n"]
            covered += 1
        expanded.extend([Fraction(s, n)] * covered)
        idx += covered
    prev = None
    for r, want in zip(rows, expanded):
        assert abs(r["iso_rate"] - float(want)) < 1e-12, (r, want)
        if prev is not None:
            assert r["iso_rate"] >= prev - 1e-15
        prev = r["iso_rate"]
    # weighted total preserved
    tot_fit = sum(
        Fraction(r["s"], 1) for r in rows
    )
    tot_iso = sum(want * r["n"] for r, want in zip(rows, expanded))
    assert tot_iso == tot_fit


def test_stl_identity_and_centering(spark):
    """v*1e4 == trend + seasonal + resid exactly per day; the seasonal
    week sums to ~0 (centering rounds once); trend equals the integer
    7-day half-up mean."""
    from de4ml_spark.queries.tsq2 import stl_decompose_events
    from de4ml_spark.session import load_table

    rows = sorted(
        stl_decompose_events(spark, SF).collect(), key=lambda r: r["day"]
    )
    daily = {
        r["day"]: r["v_c"]
        for r in load_table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.expr(
                "CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))"
                " AS DECIMAL(38,2)) * 100 AS BIGINT)"
            ).alias("v_c")
        )
        .collect()
    }
    days = sorted(daily)
    for r in rows:
        assert r["v_c"] * 10000 == (
            r["trend_uc"] + r["seasonal_uc"] + r["resid_uc"]
        )
        i = days.index(r["day"])
        window = [daily[d] for d in days[i - 3 : i + 4]]
        assert len(window) == 7
        s7 = sum(window)
        if s7 >= 0:
            want_tr = (2 * s7 * 10000 + 7) // 14
        else:
            want_tr = -((2 * -s7 * 10000 + 7) // 14)
        assert r["trend_uc"] == want_tr
    seas = {}
    for r in rows:
        seas[r["day"].isoweekday()] = r["seasonal_uc"]
    assert len(seas) == 7
    assert abs(sum(seas.values())) <= 4  # one centering round per dw


def test_ccf_lag0_matches_pearson(spark):
    from de4ml_spark.queries.tsq2 import ccf_view_click_events
    from de4ml_spark.session import load_table

    got = {r["lag"]: r for r in ccf_view_click_events(spark, SF).collect()}
    assert set(got) == set(range(-3, 4))

    def daily(t):
        return {
            r["day"]: r["v"]
            for r in load_table(spark, SF, "events")
            .filter(F.col("event_type") == t)
            .groupBy(F.col("ts").cast("date").alias("day"))
            .agg(
                F.expr(
                    "CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))"
                    " AS DECIMAL(38,2)) * 100 AS BIGINT)"
                ).alias("v")
            )
            .collect()
        }

    import datetime

    x, y = daily("view"), daily("click")
    for lag in range(-3, 4):
        pairs = [
            (x[d], y[d + datetime.timedelta(days=lag)])
            for d in x
            if d + datetime.timedelta(days=lag) in y
        ]
        n = len(pairs)
        assert got[lag]["n"] == n
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        sxx = sum(a * a for a, _ in pairs)
        syy = sum(b * b for _, b in pairs)
        sxy = sum(a * b for a, b in pairs)
        num = float(n * sxy - sx * sy)
        dx, dy = float(n * sxx - sx * sx), float(n * syy - sy * sy)
        assert got[lag]["ccf_r"] == num / math.sqrt(dx * dy)


def test_markov_accuracy_recompute(spark):
    """Train argmax predictions and test hit counts replayed in pure
    Python over per-user ordered sequences."""
    from de4ml_spark.queries.statq import (
        MARKOV_SPLIT_DAY,
        markov_next_event_accuracy,
    )
    from de4ml_spark.session import load_table

    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("user_id").isNotNull())
        .selectExpr("user_id", "event_type", "ts", "event_id",
                    f"dayofmonth(ts) < {MARKOV_SPLIT_DAY} AS is_train")
        .collect()
    )
    seqs = defaultdict(list)
    for r in ev:
        seqs[(r["user_id"], r["is_train"])].append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    train_cnt = defaultdict(int)
    test_trans = []
    for (_, is_train), rows in seqs.items():
        rows.sort()
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            if is_train:
                train_cnt[(a, b)] += 1
            else:
                test_trans.append((a, b))
    pred = {}
    for (a, b), c in train_cnt.items():
        cur = pred.get(a)
        if cur is None or c > cur[1] or (c == cur[1] and b < cur[0]):
            pred[a] = (b, c)
    got = {r["prev"]: r for r in markov_next_event_accuracy(spark, SF).collect()}
    per_prev = defaultdict(lambda: [0, 0])
    for a, b in test_trans:
        per_prev[a][0] += 1
        if a in pred and pred[a][0] == b:
            per_prev[a][1] += 1
    assert set(got) == set(per_prev)
    for a, (n, hits) in per_prev.items():
        assert got[a]["n_test"] == n
        assert got[a]["n_hits"] == hits
        if a in pred:
            assert got[a]["predicted"] == pred[a][0]
            assert got[a]["train_cnt"] == pred[a][1]


def test_kruskal_wallis_matches_scipy_free_recompute(spark):
    """Rank sums and the H statistic replayed in pure Python with the
    same quantized definition; identity sum(R_i) = N(N+1)/2 holds."""
    from de4ml_spark.queries.statq import kruskal_wallis_value
    from de4ml_spark.session import load_table

    rows = kruskal_wallis_value(spark, SF).collect()
    ev = (
        load_table(spark, SF, "events")
        .selectExpr(
            "event_type",
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c",
        )
        .where("v_c IS NOT NULL AND event_type IS NOT NULL")
        .collect()
    )
    vals = defaultdict(list)
    for r in ev:
        vals[r["event_type"]].append(r["v_c"])
    pooled = sorted(v for lst in vals.values() for v in lst)
    first, cnt = {}, defaultdict(int)
    for i, v in enumerate(pooled):
        first.setdefault(v, i + 1)
        cnt[v] += 1
    r2x = {v: 2 * first[v] + cnt[v] - 1 for v in cnt}
    got = {r["event_type"]: r for r in rows}
    n_tot = len(pooled)
    total_r2x = 0
    sum_q = 0
    for t, lst in vals.items():
        rs = sum(r2x[v] for v in lst)
        assert got[t]["n_i"] == len(lst)
        assert got[t]["r2x_sum"] == rs
        total_r2x += rs
        sum_q += (2 * rs * rs + 4 * len(lst)) // (8 * len(lst))
    assert total_r2x == n_tot * (n_tot + 1)  # x2 of N(N+1)/2
    tie_sum = sum(c**3 - c for c in cnt.values())
    h_raw = 12.0 * float(sum_q) / (
        float(n_tot) * float(n_tot + 1)
    ) - 3.0 * float(n_tot + 1)
    c = 1.0 - float(tie_sum) / float(n_tot**3 - n_tot)
    row = rows[0]
    assert row["h_raw"] == h_raw
    assert row["h_tie_r"] == h_raw / c
    assert row["h_raw"] >= 0 or abs(row["h_raw"]) < 1e-6


def test_acf_diagonal_and_recompute(spark):
    """Each (type, lag) Pearson replayed exactly; lag coverage n
    decreases with lag on a dense calendar."""
    import datetime

    from de4ml_spark.queries.tsq2 import (
        ACF_MAX_LAG,
        acf_value_events,
    )
    from de4ml_spark.session import load_table

    daily = (
        load_table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.expr(
                "CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))"
                " AS DECIMAL(38,2)) * 100 AS BIGINT)"
            ).alias("v_c")
        )
        .collect()
    )
    series = defaultdict(dict)
    for r in daily:
        series[r["event_type"]][r["day"]] = r["v_c"]
    got = {
        (r["event_type"], r["lag"]): r
        for r in acf_value_events(spark, SF).collect()
    }
    for t, by_day in series.items():
        for lag in range(1, ACF_MAX_LAG + 1):
            pairs = [
                (v, by_day[d + datetime.timedelta(days=lag)])
                for d, v in by_day.items()
                if d + datetime.timedelta(days=lag) in by_day
            ]
            n = len(pairs)
            if n == 0:
                assert (t, lag) not in got
                continue
            r = got[(t, lag)]
            assert r["n"] == n
            sx = sum(a for a, _ in pairs)
            sy = sum(b for _, b in pairs)
            sxx = sum(a * a for a, _ in pairs)
            syy = sum(b * b for _, b in pairs)
            sxy = sum(a * b for a, b in pairs)
            dx = float(n * sxx - sx * sx)
            dy = float(n * syy - sy * sy)
            if dx == 0.0 or dy == 0.0:
                assert r["acf_r"] is None
            else:
                assert r["acf_r"] == float(n * sxy - sx * sy) / math.sqrt(
                    dx * dy
                )


def test_ljung_box_and_strengths(spark):
    """Q replayed from the ACF values with the same nano-quantized
    terms; strengths in [0,1] and the decomposition identity basis."""
    from de4ml_spark.queries.tsq2 import (
        acf_value_events,
        ljung_box_value_events,
        seasonal_strength_events,
    )
    from de4ml_spark.session import load_table

    acf = {
        (r["event_type"], r["lag"]): r["acf_r"]
        for r in acf_value_events(spark, SF).collect()
    }
    n_days = {
        r["event_type"]: r["nd"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct(F.col("ts").cast("date")).alias("nd"))
        .collect()
    }
    got = {r["event_type"]: r for r in ljung_box_value_events(spark, SF).collect()}
    for t, nd in n_days.items():
        s_nano = 0
        n_lags = 0
        for (tt, lag), r in acf.items():
            if tt != t:
                continue
            n_lags += 1
            if r is not None:
                s_nano += math.floor(
                    r * r / float(nd - lag) * 1e9 + 0.5
                )
        g = got[t]
        assert g["n_days"] == nd
        assert g["n_lags"] == n_lags
        assert g["sum_nano"] == s_nano
        assert g["q_r"] == float(nd) * float(nd + 2) * (
            float(s_nano) / 1e9
        )
        assert g["q_r"] >= 0.0

    row = seasonal_strength_events(spark, SF).collect()[0]
    assert 0.0 <= row["seasonal_strength_r"] <= 1.0
    assert 0.0 <= row["trend_strength_r"] <= 1.0


def test_logrank_replay(spark):
    """O/E/Var totals and z replayed in pure Python over the same
    censoring spine and hash cohorts."""
    from fractions import Fraction

    from tests.test_mldataq4 import _phash59

    from de4ml_spark.queries.statq import logrank_retention_cohorts
    from de4ml_spark.session import load_table

    spans = (
        load_table(spark, SF, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("date")).alias("d0"),
            F.max(F.col("ts").cast("date")).alias("d1"),
        )
        .collect()
    )
    hmax = max(r["d1"] for r in spans)
    users = []
    for r in spans:
        dur = (r["d1"] - r["d0"]).days
        obs = (hmax - r["d0"]).days
        users.append(
            (
                _phash59(f"lr:{r['user_id']}") % 2,
                dur,
                obs,
                1 if r["d1"] < hmax else 0,
            )
        )
    o_a = e_micro = v_micro = n_steps = 0
    tmax = max(min(d, o) for _, d, o, _ in users)
    for t in range(0, tmax + 1):
        at = [(g, d, c) for g, d, o, c in users if min(d, o) >= t]
        n = len(at)
        d = sum(1 for g, dd, c in at if c == 1 and dd == t)
        if n <= 1 or d == 0:
            continue
        na = sum(1 for g, _, _ in at if g == 0)
        da = sum(1 for g, dd, c in at if g == 0 and c == 1 and dd == t)
        n_steps += 1
        o_a += da
        e_micro += (2 * d * na * 10**6 + n) // (2 * n)
        num = 2 * d * (n - d) * na * (n - na) * 10**6 + n * n * (n - 1)
        v_micro += num // (2 * n * n * (n - 1))
    got = logrank_retention_cohorts(spark, SF).collect()[0]
    assert got["n_steps"] == n_steps
    assert got["o_a"] == o_a
    assert got["e_a_micro"] == e_micro
    assert got["var_micro"] == v_micro
    want_z = float(o_a * 10**6 - e_micro) / (
        1000.0 * math.sqrt(float(v_micro))
    )
    assert got["z_r"] == want_z


def test_zipf_and_fano_recompute(spark):
    """Zipf OLS moments and Fano factors replayed from exact integers;
    Zipf slopes are negative (frequency falls with rank)."""
    from collections import Counter

    from de4ml_spark.queries.textq3 import ZIPF_TOPN, zipf_slope_docs
    from de4ml_spark.queries.tsq2 import fano_burstiness_events
    from de4ml_spark.session import load_table

    docs = load_table(spark, SF, "documents").select(
        "source", "text"
    ).collect()
    per_src = defaultdict(Counter)
    for r in docs:
        for tok in r["text"].split(" "):
            if tok:
                per_src[r["source"]][tok] += 1
    got = {r["source"]: r for r in zipf_slope_docs(spark, SF).collect()}
    from de4ml_spark.operators.portable_hash import portable_ln_const

    for src, cnt in per_src.items():
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :ZIPF_TOPN
        ]
        xs, ys = [], []
        for rank, (_, freq) in enumerate(ranked, start=1):
            xs.append(math.floor(portable_ln_const(rank, 1) * 1e6 + 0.5))
            ys.append(math.floor(portable_ln_const(freq, 1) * 1e6 + 0.5))
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        g = got[src]
        assert g["n"] == n
        assert g["zipf_slope_r"] == float(num) / float(den)
        assert g["zipf_slope_r"] < 0

    daily = defaultdict(list)
    ev = (
        load_table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .collect()
    )
    for r in ev:
        daily[r["event_type"]].append(r["count"])
    gotf = {
        r["event_type"]: r
        for r in fano_burstiness_events(spark, SF).collect()
    }
    for t, cs in daily.items():
        n, sc = len(cs), sum(cs)
        scc = sum(c * c for c in cs)
        want = (
            float(n)
            * (float(n * scc - sc * sc))
            / float((n - 1) * sc * n)
        )
        g = gotf[t]
        assert g["n"] == n and g["n_events"] == sc
        assert g["fano_r"] == want
        assert g["fano_r"] > 0
