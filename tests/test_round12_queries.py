"""Round-12 statistics batch: independent pure-Python/numpy recompute
tests (the mandatory discipline — catalog entries must match a
from-the-definition reference implementation, not just the oracle)."""

from __future__ import annotations

import math

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"


def _daily_counts(sf_dir: str) -> dict[int, int]:
    con = duckdb.connect()
    return dict(
        con.sql(
            f"""SELECT CAST(date_diff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS BIGINT) AS t,
                   COUNT(*)
            FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1"""
        ).fetchall()
    )


# ---------------------------------------------------------------- KPSS


def _kpss_reference(daily: dict[int, int], lags: int = 7) -> float:
    ts = sorted(daily)
    y = [daily[t] for t in ts]
    n = len(y)
    mu = sum(y) / n
    e = [v - mu for v in y]
    s = 0.0
    sum_s2 = 0.0
    for v in e:
        s += v
        sum_s2 += s * s
    # Bartlett HAC on the day-INDEX adjacency (t and t+k both observed),
    # matching the entry's equi-join on the calendar spine
    by_t = {t: v - mu for t, v in zip(ts, y)}
    lrv = 0.0
    for k in range(0, lags + 1):
        ck = sum(
            by_t[t] * by_t[t + k] for t in ts if t + k in by_t
        )
        w = 1.0 if k == 0 else 2.0 * (lags + 1 - k) / (lags + 1)
        lrv += w * ck / n
    return (sum_s2 / (n * n)) / lrv


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_kpss_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq6 import kpss_daily_events

    daily = _daily_counts(sf_dir)
    ref = _kpss_reference(daily)
    row = kpss_daily_events(spark, sf_dir).collect()[0]
    assert row["n_days"] == len(daily)
    assert row["kpss_stat"] == pytest.approx(ref, rel=1e-9)
    assert row["kpss_stat"] > 0.0


# ------------------------------------------------------ variance ratio


def _vr_reference(daily: dict[int, int], q: int = 5):
    def moments(lag):
        d = [
            daily[t] - daily[t - lag]
            for t in daily
            if t - lag in daily
        ]
        m = sum(d) / len(d)
        return len(d), sum((x - m) ** 2 for x in d) / len(d)

    n1, v1 = moments(1)
    nq, vq = moments(q)
    vr = vq / (q * v1)
    phi = 2.0 * (2 * q - 1) * (q - 1) / (3.0 * q * nq)
    return n1, nq, vr, (vr - 1.0) / math.sqrt(phi)


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_variance_ratio_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq6 import variance_ratio_daily_events

    n1, nq, vr, z = _vr_reference(_daily_counts(sf_dir))
    row = variance_ratio_daily_events(spark, sf_dir).collect()[0]
    assert (row["n1"], row["nq"]) == (n1, nq)
    assert row["variance_ratio"] == pytest.approx(vr, rel=1e-9)
    assert row["z_vr"] == pytest.approx(z, rel=1e-9)


# --------------------------------------------------------------- DeLong


def _delong_reference(sf_dir: str):
    """Textbook per-observation DeLong components (float path) — an
    independent derivation from the entry's quantized-histogram one."""
    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT),
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        FROM '{sf_dir}/events.parquet'
        WHERE value IS NOT NULL AND event_type IS NOT NULL"""
    ).fetchall()
    pos = sorted(v for v, is_p in rows if is_p)
    neg = sorted(v for v, is_p in rows if not is_p)
    import bisect

    n_pos, n_neg = len(pos), len(neg)

    def v10(x):
        lo = bisect.bisect_left(neg, x)
        hi = bisect.bisect_right(neg, x)
        return (lo + 0.5 * (hi - lo)) / n_neg

    def v01(x):
        lo = bisect.bisect_left(pos, x)
        hi = bisect.bisect_right(pos, x)
        return (n_pos - hi + 0.5 * (hi - lo)) / n_pos

    v10s = [v10(x) for x in pos]
    v01s = [v01(x) for x in neg]
    auc = sum(v10s) / n_pos
    auc2 = sum(v01s) / n_neg
    assert abs(auc - auc2) < 1e-12  # the DeLong identity
    s10 = sum((v - auc) ** 2 for v in v10s) / (n_pos - 1)
    s01 = sum((v - auc) ** 2 for v in v01s) / (n_neg - 1)
    var = s10 / n_pos + s01 / n_neg
    return n_pos, n_neg, auc, math.sqrt(var)


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_delong_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq6 import delong_auc_variance_events

    n_pos, n_neg, auc, se = _delong_reference(sf_dir)
    row = delong_auc_variance_events(spark, sf_dir).collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (n_pos, n_neg)
    # AUC is the exact integer identity — tight
    assert row["auc"] == pytest.approx(auc, rel=1e-12)
    # se carries the documented 1e-6 component quantization
    assert row["se_auc"] == pytest.approx(se, rel=1e-4)
    assert row["z_null_half"] == pytest.approx(
        (auc - 0.5) / se, rel=1e-4
    )


def test_delong_agrees_with_auc_entry(spark):
    """Same frame => the AUC column must equal auc_roc_events' exactly."""
    from de4ml_spark.queries.statq2 import auc_roc_events
    from de4ml_spark.queries.statq6 import delong_auc_variance_events

    a = auc_roc_events(spark, SF).collect()[0]
    d = delong_auc_variance_events(spark, SF).collect()[0]
    assert d["auc"] == a["auc"]
    assert (d["n_pos"], d["n_neg"]) == (a["n_pos"], a["n_neg"])


# --------------------------------------------------------- Krippendorff


def _kripp_reference(pairs):
    """General nominal-alpha via the coincidence matrix (2 raters, no
    missing): alpha = 1 - D_o/D_e."""
    n = len(pairs)
    big_n = 2 * n
    vals: dict[int, int] = {}
    disagree = 0
    for a, b in pairs:
        vals[a] = vals.get(a, 0) + 1
        vals[b] = vals.get(b, 0) + 1
        disagree += a != b
    d_o = disagree / n
    d_e = sum(
        nc * (big_n - nc) for nc in vals.values()
    ) / (big_n * (big_n - 1))
    return 1.0 - d_o / d_e


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_krippendorff_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq6 import krippendorff_alpha_docs

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT n_chars >= 300,
               len(string_split(text, ' ')) >= 50
        FROM '{sf_dir}/documents.parquet'"""
    ).fetchall()
    pairs = [(int(a), int(b)) for a, b in rows]
    ref = _kripp_reference(pairs)
    row = krippendorff_alpha_docs(spark, sf_dir).collect()[0]
    assert row["n_units"] == len(pairs)
    assert row["disagree"] == sum(a != b for a, b in pairs)
    assert row["kripp_alpha"] == pytest.approx(ref, rel=1e-12)


def test_krippendorff_fixtures():
    # perfect agreement -> alpha = 1
    assert _kripp_reference([(1, 1)] * 5 + [(0, 0)] * 5) == 1.0
    # Krippendorff's own canonical property: all-disagree, balanced
    # marginals -> alpha < 0 (worse than chance)
    assert _kripp_reference([(0, 1)] * 5 + [(1, 0)] * 5) < 0.0


# ------------------------------------------------------------------ ADF


def _adf_reference(daily: dict[int, int]):
    """Dickey-Fuller t via numpy least squares on [1, y_{t-1}] — a
    fully independent linear-algebra path (no moment formulas)."""
    import numpy as np

    x = np.array(
        [daily[t - 1] for t in daily if t - 1 in daily], dtype=float
    )
    d = np.array(
        [daily[t] - daily[t - 1] for t in daily if t - 1 in daily],
        dtype=float,
    )
    n = len(x)
    A = np.column_stack([np.ones(n), x])
    coef, _, _, _ = np.linalg.lstsq(A, d, rcond=None)
    resid = d - A @ coef
    sigma2 = float(resid @ resid) / (n - 2)
    cov = sigma2 * np.linalg.inv(A.T @ A)
    rho = float(coef[1])
    se = math.sqrt(float(cov[1, 1]))
    return n, rho, rho / se


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_adf_matches_numpy_lstsq(spark, sf_dir):
    from de4ml_spark.queries.statq6 import adf_daily_events

    n, rho, t = _adf_reference(_daily_counts(sf_dir))
    row = adf_daily_events(spark, sf_dir).collect()[0]
    assert row["n_pairs"] == n
    assert row["rho_hat"] == pytest.approx(rho, rel=1e-9)
    assert row["adf_t"] == pytest.approx(t, rel=1e-9)
    # event counts are strongly mean-reverting around a level -> the
    # unit root must be rejected hard (rho well below 0)
    assert row["rho_hat"] < 0.0


# ------------------------------------------------------------------- Qn


def _qn_from_values(vals: list[int]):
    """Brute-force Qn from the definition (k-th order statistic of
    pairwise distances, i < j)."""
    n = len(vals)
    h = n // 2 + 1
    k = h * (h - 1) // 2
    dists = sorted(
        abs(vals[i] - vals[j])
        for i in range(n)
        for j in range(i + 1, n)
    )
    return n, k, dists[k - 1]


def test_qn_brute_force_fixture():
    """The histogram selection must equal the brute-force definition
    on a small synthetic sample with heavy ties."""
    vals = [100, 100, 100, 250, 250, 400, 1000, 1000, 5000, 70]
    n, k, qn = _qn_from_values(vals)
    # histogram path (the entry's algorithm, replicated in Python)
    hist: dict[int, int] = {}
    for v in vals:
        hist[v] = hist.get(v, 0) + 1
    byd: dict[int, int] = {}
    for v, c in hist.items():
        if c > 1:
            byd[0] = byd.get(0, 0) + c * (c - 1) // 2
    hs = sorted(hist)
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            d = hs[j] - hs[i]
            byd[d] = byd.get(d, 0) + hist[hs[i]] * hist[hs[j]]
    cum = 0
    sel = None
    for d in sorted(byd):
        cum += byd[d]
        if cum >= k:
            sel = d
            break
    assert sel == qn


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_qn_matches_histogram_reference(spark, sf_dir):
    from de4ml_spark.queries.statq6 import qn_scale_value

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT),
               COUNT(*)
        FROM '{sf_dir}/events.parquet'
        WHERE value IS NOT NULL GROUP BY 1"""
    ).fetchall()
    hist = {int(v): int(c) for v, c in rows}
    n = sum(hist.values())
    h = n // 2 + 1
    k = h * (h - 1) // 2
    byd: dict[int, int] = {}
    for v, c in hist.items():
        if c > 1:
            byd[0] = byd.get(0, 0) + c * (c - 1) // 2
    hs = sorted(hist)
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            d = hs[j] - hs[i]
            byd[d] = byd.get(d, 0) + hist[hs[i]] * hist[hs[j]]
    cum = 0
    sel = None
    for d in sorted(byd):
        cum += byd[d]
        if cum >= k:
            sel = d
            break
    row = qn_scale_value(spark, sf_dir).collect()[0]
    assert row["n_values"] == n
    assert row["k_pairs"] == k
    assert row["qn_raw_cents"] == sel
    assert row["qn_scale"] == pytest.approx(
        2.21914 * sel / 100.0, rel=1e-12
    )


# ---------------------------------------------------------------- CUPED


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_cuped_matches_numpy(spark, sf_dir):
    import numpy as np

    from de4ml_spark.queries.statq6 import cuped_user_value

    con = duckdb.connect()
    rows = con.sql(
        f"""WITH ev AS (
          SELECT user_id,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS v_c,
                 CAST(date_diff('day', DATE '1970-01-01',
                      CAST(ts AS DATE)) AS BIGINT) AS t
          FROM '{sf_dir}/events.parquet'
          WHERE value IS NOT NULL AND user_id IS NOT NULL
        ), days AS (SELECT (MIN(t) + MAX(t)) // 2 AS mid FROM ev)
        SELECT SUM(CASE WHEN t <= mid THEN v_c ELSE 0 END),
               SUM(CASE WHEN t <= mid THEN 0 ELSE v_c END)
        FROM ev CROSS JOIN days GROUP BY user_id"""
    ).fetchall()
    x = np.array([float(a) for a, _ in rows])
    y = np.array([float(b) for _, b in rows])
    cov = ((x - x.mean()) * (y - y.mean())).mean()
    theta = cov / ((x - x.mean()) ** 2).mean()
    rho2 = cov * cov / (
        ((x - x.mean()) ** 2).mean() * ((y - y.mean()) ** 2).mean()
    )
    row = cuped_user_value(spark, sf_dir).collect()[0]
    assert row["n_users"] == len(rows)
    assert row["theta"] == pytest.approx(theta, rel=1e-9)
    assert row["rho_sq"] == pytest.approx(rho2, rel=1e-9)
    assert row["var_reduction_factor"] == pytest.approx(
        1.0 - rho2, rel=1e-9
    )
    assert 0.0 <= row["rho_sq"] <= 1.0


# ----------------------------------------------------------------- Hill


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_hill_matches_reference(spark, sf_dir):
    """Textbook per-observation Hill from sorted raw values (math.log
    path — independent of the portable-ln/histogram pipeline)."""
    from de4ml_spark.queries.statq6 import HILL_K, hill_tail_value

    con = duckdb.connect()
    vals = sorted(
        (
            int(v)
            for (v,) in con.sql(
                f"""SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100
                       AS BIGINT)
                FROM '{sf_dir}/events.parquet'
                WHERE value IS NOT NULL AND value > 0"""
            ).fetchall()
        ),
        reverse=True,
    )
    t = vals[HILL_K]  # x_(k+1)
    s = sum(math.log(vals[i] / t) for i in range(HILL_K))
    alpha = HILL_K / s
    row = hill_tail_value(spark, sf_dir).collect()[0]
    assert row["n_values"] == len(vals)
    assert row["k_top"] == HILL_K
    assert row["tail_threshold_cents"] == t
    # portable ln is ~2 ulp; micro-quantization adds <= 5e-7 per term
    assert row["hill_alpha"] == pytest.approx(alpha, rel=1e-5)
    assert row["hill_alpha"] > 0.0


def test_hill_degenerate_tail_emits_null_row(spark, tmp_path):
    """Fewer than HILL_K+1 positive values must yield ONE row with
    NULL hill_alpha ("undefined"), not an empty frame that reads as
    "no data" (ADVICE r12)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from de4ml_spark.queries.statq6 import HILL_K, hill_tail_value

    n = 5  # << HILL_K + 1: the cum-threshold CTE finds no t
    pdf = pd.DataFrame(
        {
            "event_id": pd.array(range(n), dtype="int64"),
            "ts": pd.to_datetime(["2024-01-01 00:00:00"] * n),
            "user_id": pd.array([1] * n, dtype="int64"),
            "event_type": ["click"] * n,
            "value": [float(i + 1) for i in range(n)],
            "props": ["{}"] * n,
        }
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    rows = hill_tail_value(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    row = rows[0]
    assert row["n_values"] == n
    assert row["k_top"] == HILL_K
    assert row["tail_threshold_cents"] is None
    assert row["hill_alpha"] is None


# ----------------------------------------------------------------- Yuen


def _yuen_reference(a: list[int], b: list[int], trim_div: int = 5):
    """Textbook per-observation Yuen from sorted raw samples."""

    def stats(x):
        x = sorted(x)
        n = len(x)
        g = n // trim_div
        h = n - 2 * g
        mid = x[g : n - g]
        mt = sum(mid) / h
        lo, hi = x[g], x[n - g - 1]
        wins = [min(max(v, lo), hi) for v in x]
        sw = sum(wins)
        sw2 = sum(v * v for v in wins)
        d = (n * sw2 - sw * sw) / (n * h * (h - 1))
        return n, h, mt, d

    n_a, h_a, mt_a, d_a = stats(a)
    n_b, h_b, mt_b, d_b = stats(b)
    t = (mt_a - mt_b) / math.sqrt(d_a + d_b)
    df = (d_a + d_b) ** 2 / (
        d_a**2 / (h_a - 1) + d_b**2 / (h_b - 1)
    )
    return n_a, n_b, h_a, h_b, mt_a - mt_b, t, df


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_yuen_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq6 import yuen_trimmed_ttest_value

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT),
               event_type
        FROM '{sf_dir}/events.parquet'
        WHERE value IS NOT NULL
          AND event_type IN ('click', 'purchase')"""
    ).fetchall()
    a = [int(v) for v, et in rows if et == "click"]
    b = [int(v) for v, et in rows if et == "purchase"]
    n_a, n_b, h_a, h_b, diff, t, df = _yuen_reference(a, b)
    row = yuen_trimmed_ttest_value(spark, sf_dir).collect()[0]
    assert (row["n_a"], row["n_b"]) == (n_a, n_b)
    assert (row["h_a"], row["h_b"]) == (h_a, h_b)
    assert row["trimmed_mean_diff"] == pytest.approx(diff, rel=1e-9)
    assert row["yuen_t"] == pytest.approx(t, rel=1e-9)
    assert row["yuen_df"] == pytest.approx(df, rel=1e-9)


def test_yuen_winsorize_bounds_fixture():
    """Hand fixture with ties straddling the trim boundary — the
    positional-overlap arithmetic must reproduce the brute force."""
    a = [10, 10, 10, 20, 30, 40, 50, 60, 70, 70]  # n=10, g=2
    b = [15, 15, 25, 25, 35, 35, 45, 45, 55, 55]
    n_a, n_b, h_a, h_b, diff, t, df = _yuen_reference(a, b)
    assert (n_a, h_a) == (10, 6)
    # mid of a = [10, 20, 30, 40, 50, 60]
    assert diff == pytest.approx(sum([10, 20, 30, 40, 50, 60]) / 6
                                 - sum([25, 25, 35, 35, 45, 45]) / 6)
    assert df > 0 and math.isfinite(t)


# ------------------------------------------------------------- Greenwood


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_km_greenwood_matches_reference(spark, sf_dir):
    """Per-day Greenwood ratio from a direct pure-Python life table
    (same span model as the KM entry), and internal consistency with
    kaplan_meier_retention's at-risk counts."""
    from de4ml_spark.queries.statq6 import km_greenwood_retention

    con = duckdb.connect()
    spans = con.sql(
        f"""SELECT datediff('day', MIN(CAST(ts AS DATE)),
                        MAX(CAST(ts AS DATE)))
        FROM '{sf_dir}/events.parquet'
        WHERE user_id IS NOT NULL GROUP BY user_id"""
    ).fetchall()
    hmax_rows = con.sql(
        f"""SELECT datediff('day', MIN(CAST(ts AS DATE)),
                        MAX(CAST(ts AS DATE))),
               datediff('day', MIN(CAST(ts AS DATE)),
                   (SELECT MAX(CAST(ts AS DATE))
                    FROM '{sf_dir}/events.parquet'
                    WHERE user_id IS NOT NULL))
        FROM '{sf_dir}/events.parquet'
        WHERE user_id IS NOT NULL GROUP BY user_id"""
    ).fetchall()
    durs = [(int(d), int(o)) for d, o in hmax_rows]
    tmax = max(min(d, o) for d, o in durs)
    expected = {}
    cum = 0.0
    for t in range(tmax + 1):
        n_risk = sum(1 for d, o in durs if min(d, o) >= t)
        d_t = sum(1 for d, o in durs if d == t and d < o)
        if n_risk == d_t:
            expected[t] = (n_risk, d_t, None)
            continue
        # entry quantizes each term half-up on the 1e-12 grid
        term = (2 * d_t * 10**12 + n_risk * (n_risk - d_t)) // (
            2 * n_risk * (n_risk - d_t)
        )
        cum += term
        expected[t] = (n_risk, d_t, int(cum))
    rows = {
        r["t"]: r
        for r in km_greenwood_retention(spark, sf_dir).collect()
    }
    assert set(rows) == set(expected)
    for t, (n_risk, d_t, cum_p) in expected.items():
        r = rows[t]
        assert r["n_risk"] == n_risk and r["d_churn"] == d_t
        if cum_p is None:
            assert r["cum_term_p"] is None
        else:
            assert r["cum_term_p"] == cum_p
            assert r["greenwood_se_ratio"] == math.sqrt(
                cum_p / 1e12
            )
    assert len(spans) == sum(
        1 for d, o in durs if min(d, o) >= 0
    )  # every user enters the table at t=0


# --------------------------------------------------------------- MoM


def _mom_phash(s: str) -> int:
    import hashlib

    d = hashlib.md5(s.encode()).digest()
    return int.from_bytes(d[8:16], "little") & ((1 << 40) - 1)


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_median_of_means_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq6 import MOM_K, median_of_means_value

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT event_id,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL"""
    ).fetchall()
    sums = [0] * MOM_K
    cnts = [0] * MOM_K
    for eid, v in rows:
        b = _mom_phash(str(eid)) % MOM_K
        sums[b] += int(v)
        cnts[b] += 1
    means = sorted(
        (s / c, b) for b, (s, c) in enumerate(zip(sums, cnts)) if c
    )
    k = len(means)
    lo, hi = (k + 1) // 2 - 1, (k + 2) // 2 - 1
    mom = (means[lo][0] + means[hi][0]) / 2.0 if lo != hi else means[lo][0]
    row = median_of_means_value(spark, sf_dir).collect()[0]
    assert row["n_values"] == len(rows)
    assert row["k_buckets"] == k
    assert row["mom_cents"] == pytest.approx(mom, rel=1e-12)
    assert row["mean_cents"] == pytest.approx(
        sum(sums) / len(rows), rel=1e-12
    )


# -------------------------------------------------------------- Siegel


def _median(xs):
    xs = sorted(xs)
    m = len(xs)
    return (xs[(m + 1) // 2 - 1] + xs[(m + 2) // 2 - 1]) / 2.0


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_siegel_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq6 import siegel_slope_daily

    daily = _daily_counts(sf_dir)
    ts = sorted(daily)
    meds = []
    for i in ts:
        meds.append(
            _median(
                [
                    (daily[i] - daily[j]) / (i - j)
                    for j in ts
                    if j != i
                ]
            )
        )
    slope = _median(meds)
    intercept = _median([daily[t] - slope * t for t in ts])
    row = siegel_slope_daily(spark, sf_dir).collect()[0]
    assert row["n_days"] == len(ts)
    assert row["siegel_slope"] == pytest.approx(slope, rel=1e-12)
    assert row["siegel_intercept"] == pytest.approx(
        intercept, rel=1e-12
    )


# ------------------------------------------------------- Phillips-Perron


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_phillips_perron_matches_reference(spark, sf_dir):
    """Float-path PP Z_tau via numpy least squares (independent of the
    entry's quantized-integer pipeline), Hamilton 17.6.12 form."""
    import numpy as np

    from de4ml_spark.queries.statq6 import (
        PP_LAGS,
        phillips_perron_daily,
    )

    daily = _daily_counts(sf_dir)
    ts = sorted(t for t in daily if t - 1 in daily)
    x = np.array([daily[t - 1] for t in ts], dtype=float)
    d = np.array([daily[t] - daily[t - 1] for t in ts], dtype=float)
    n = len(x)
    A = np.column_stack([np.ones(n), x])
    coef, _, _, _ = np.linalg.lstsq(A, d, rcond=None)
    u = d - A @ coef
    by_t = dict(zip(ts, u))
    g0 = float(u @ u) / n
    l2 = g0
    for j in range(1, PP_LAGS + 1):
        cj = sum(
            by_t[t] * by_t[t + j] for t in ts if t + j in by_t
        )
        l2 += 2.0 * (PP_LAGS + 1 - j) / (PP_LAGS + 1) * cj / n
    sxx = float(((x - x.mean()) ** 2).sum())
    s2 = float(u @ u) / (n - 2)
    se_rho = math.sqrt(s2 / sxx)
    t_rho = float(coef[1]) / se_rho
    z_tau = math.sqrt(g0 / l2) * t_rho - (
        l2 - g0
    ) * n * se_rho / (2.0 * math.sqrt(l2) * s2)

    row = phillips_perron_daily(spark, sf_dir).collect()[0]
    assert row["n_pairs"] == n
    assert row["gamma0"] == pytest.approx(g0, rel=1e-6)
    assert row["lambda2"] == pytest.approx(l2, rel=1e-6)
    assert row["adf_t"] == pytest.approx(t_rho, rel=1e-9)
    assert row["pp_z_tau"] == pytest.approx(z_tau, rel=1e-6)
    # internal consistency: PP's embedded DF t equals the ADF entry's
    from de4ml_spark.queries.statq6 import adf_daily_events

    adf = adf_daily_events(spark, sf_dir).collect()[0]
    assert row["adf_t"] == adf["adf_t"]


# ------------------------------------------------------- CUSUM-of-squares


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_cusum_squares_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.statq6 import cusum_squares_daily

    daily = _daily_counts(sf_dir)
    ts = sorted(daily)
    n = len(ts)
    s = sum(daily.values())
    w = [(n * daily[t] - s) ** 2 for t in ts]
    tw = sum(w)
    best = None
    cw = 0
    for rk, t in enumerate(ts, start=1):
        cw += w[rk - 1]
        num = abs(cw * n - rk * tw)
        key = (num, -t)
        if best is None or key > best[0]:
            best = (key, t, num)
    row = cusum_squares_daily(spark, sf_dir).collect()[0]
    assert row["n_days"] == n
    assert row["break_t"] == best[1]
    assert row["cusumsq_stat"] == pytest.approx(
        best[2] / (n * tw), rel=1e-12
    )
    assert 0.0 <= row["cusumsq_stat"] <= 1.0


# ------------------------------------------------------------- ARCH LM


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_arch_lm_matches_reference(spark, sf_dir):
    """numpy regression of u^2 on lagged u^2 — independent of the
    quantized moment pipeline."""
    import numpy as np

    from de4ml_spark.queries.statq6 import arch_lm_daily

    daily = _daily_counts(sf_dir)
    ts = sorted(daily)
    n = len(ts)
    s = sum(daily.values())
    # the entry requantizes ((n*y - s)/n)^2 half-up to an integer
    a = {
        t: (2 * (n * daily[t] - s) ** 2 + n * n) // (2 * n * n)
        for t in ts
    }
    px = np.array(
        [a[t - 1] for t in ts if t - 1 in a], dtype=float
    )
    py = np.array([a[t] for t in ts if t - 1 in a], dtype=float)
    r = np.corrcoef(px, py)[0, 1]
    m = len(px)
    row = arch_lm_daily(spark, sf_dir).collect()[0]
    assert row["n_pairs"] == m
    assert row["r2"] == pytest.approx(r * r, rel=1e-9)
    assert row["arch_lm"] == pytest.approx(m * r * r, rel=1e-9)
    assert 0.0 <= row["r2"] <= 1.0


# ------------------------------------------------------ contamination span


def test_contamination_span_matches_reference(spark):
    """Pure-Python replay: tokenize, 3-gram, benchmark set, longest
    consecutive matched-position run per corpus doc."""
    from de4ml_spark.queries.textq3 import (
        DECON_N,
        N_BENCH,
        contamination_span_docs,
    )

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()

    def grams(text):
        toks = text.split(" ")
        return [
            " ".join(toks[i : i + DECON_N])
            for i in range(len(toks) - DECON_N + 1)
        ]

    bench = set()
    for did, text in rows:
        if did < N_BENCH:
            bench.update(grams(text))
    expected = {}
    for did, text in rows:
        if did < N_BENCH:
            continue
        g = grams(text)
        if not g:
            continue
        run = best = hits = 0
        for sh in g:
            if sh in bench:
                run += 1
                hits += 1
                best = max(best, run)
            else:
                run = 0
        expected[did] = (
            len(g),
            hits,
            best,
            best + DECON_N - 1 if best else 0,
        )
    got = {
        r["doc_id"]: (
            r["n_shingles"],
            r["n_hits"],
            r["max_run"],
            r["max_span_tokens"],
        )
        for r in contamination_span_docs(spark, SF).collect()
    }
    assert got == expected
    # sanity: contamination exists but is not universal
    assert any(v[2] > 0 for v in expected.values())


# ---------------------------------------------------------- Wasserstein-2


def test_w2_w1_equals_emd_entry_exactly(spark):
    """The quantile-axis W1 by-product must equal the value-axis EMD
    integer of emd_value_types for the (click, purchase) pair — two
    independent formulations of the same transport integral."""
    from de4ml_spark.queries.sketchq import emd_value_types
    from de4ml_spark.queries.statq6 import wasserstein2_value

    w2row = wasserstein2_value(spark, SF).collect()[0]
    emd = {
        (r["type_a"], r["type_b"]): r
        for r in emd_value_types(spark, SF).collect()
    }["click", "purchase"]
    assert w2row["n_a"] == emd["n_a"] and w2row["n_b"] == emd["n_b"]
    assert w2row["w1_scaled_d"] == emd["emd_scaled_d"]


@pytest.mark.parametrize("sf_dir", [SF, SF2])
def test_w2_matches_reference(spark, sf_dir):
    """Per-observation quantile coupling in pure Python: sort both
    samples, expand to the common n_a*n_b grid, integrate (Qa-Qb)^2."""
    from de4ml_spark.queries.statq6 import wasserstein2_value

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT),
               event_type
        FROM '{sf_dir}/events.parquet'
        WHERE value IS NOT NULL
          AND event_type IN ('click', 'purchase')"""
    ).fetchall()
    a = sorted(int(v) for v, et in rows if et == "click")
    b = sorted(int(v) for v, et in rows if et == "purchase")
    na, nb = len(a), len(b)
    # merge the two step functions over the common grid without
    # materializing n_a*n_b points: two-pointer over breakpoints
    ia = ib = 0
    p = 0
    w1 = w2 = 0
    while ia < na and ib < nb:
        # current segment ends at the nearer breakpoint
        end = min((ia + 1) * nb, (ib + 1) * na)
        dv = a[ia] - b[ib]
        w1 += abs(dv) * (end - p)
        w2 += dv * dv * (end - p)
        p = end
        if end == (ia + 1) * nb:
            ia += 1
        if end == (ib + 1) * na:
            ib += 1
    row = wasserstein2_value(spark, sf_dir).collect()[0]
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert row["w1_scaled_d"] == float(w1)
    assert row["w2_cents"] == math.sqrt(w2 / (na * nb))
