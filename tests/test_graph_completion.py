"""Round-12 graph completion pair: independent pure-Python recomputes
(union-find for the giant component, float-exact Breslow-Day from raw
2x2 counts) against the catalog entries — the discipline that caught
four shared-formula bugs in round 9 (and the d-vs-(d-a) margin slip in
this pair's own first draft)."""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _copurchase(sf_dir: str):
    con = duckdb.connect()
    edges = con.sql(
        f"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM '{sf_dir}/lineitem.parquet')
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey"""
    ).fetchall()
    nodes = [
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT l_partkey FROM '{sf_dir}/lineitem.parquet'"
        ).fetchall()
    ]
    return nodes, edges


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    sizes: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        sizes[r] = sizes.get(r, 0) + 1
    return sizes


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_giant_component_matches_union_find(spark, sf_dir):
    from de4ml_spark.queries.graphq import giant_component_parts

    nodes, edges = _copurchase(sf_dir)
    sizes = _union_find(nodes, edges)
    giant = max(sizes.values())

    row = giant_component_parts(spark, sf_dir).collect()[0]
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(edges)
    # equality with TRUE components pins GC_ITERS >= diameter here
    assert row["n_components"] == len(sizes)
    assert row["giant_size"] == giant
    assert row["giant_fraction_ppm"] == giant * 1_000_000 // len(nodes)


def test_giant_iters_has_convergence_headroom():
    """8 fixed rounds must not sit exactly at the observed diameter —
    label propagation needs rounds >= eccentricity of the min-label
    node; assert the pure-Python propagation converges in <= 6 rounds
    at sf0.01 so the unrolled 8 carries slack."""
    nodes, edges = _copurchase("/root/testdata/sf0.01")
    lbl = {n: n for n in nodes}
    adj_rounds = 0
    for adj_rounds in range(1, 9):
        changed = False
        new = dict(lbl)
        for u, v in edges:
            m = min(lbl[u], lbl[v])
            if new[u] > m:
                new[u] = m
                changed = True
            if new[v] > m:
                new[v] = m
                changed = True
        lbl = new
        if not changed:
            break
    assert adj_rounds <= 6


def _bd_tables(sf_dir: str):
    con = duckdb.connect()
    return con.sql(
        f"""SELECT source,
           SUM(CASE WHEN lang = 'en' AND n_chars >= 300 THEN 1 ELSE 0 END),
           SUM(CASE WHEN lang = 'en' AND n_chars < 300 THEN 1 ELSE 0 END),
           SUM(CASE WHEN lang <> 'en' AND n_chars >= 300 THEN 1 ELSE 0 END),
           SUM(CASE WHEN lang <> 'en' AND n_chars < 300 THEN 1 ELSE 0 END)
        FROM '{sf_dir}/documents.parquet'
        GROUP BY 1 ORDER BY 1"""
    ).fetchall()


def _bd_reference(tables):
    """Textbook Breslow-Day in plain floats (UNquantized MH weights) —
    an independent derivation path from the catalog entry's
    integer-quantized pipeline."""
    tabs = [
        (int(a), int(b), int(c), int(d))
        for _, a, b, c, d in tables
        if a + b > 0 and c + d > 0 and a + c > 0 and b + d > 0
    ]
    psi = sum(a * d / (a + b + c + d) for a, b, c, d in tabs) / sum(
        b * c / (a + b + c + d) for a, b, c, d in tabs
    )
    chi2 = sum_d = sum_v = 0.0
    for a, b, c, d in tabs:
        r1, r2, c1 = a + b, c + d, a + c
        if abs(psi - 1.0) < 1e-12:
            fitted = r1 * c1 / (r1 + r2)
        else:
            aq, bq = 1.0 - psi, (r2 - c1) + psi * (r1 + c1)
            c0 = -psi * r1 * c1
            sq = math.sqrt(max(bq * bq - 4.0 * aq * c0, 0.0))
            a1 = (sq - bq) / (2.0 * aq)
            if 0.0 < a1 < min(r1, c1) and (r2 - c1) + a1 > 0.0:
                fitted = a1
            else:
                fitted = (-(bq + sq)) / (2.0 * aq)
        var_inv = (
            1.0 / fitted
            + 1.0 / (r1 - fitted)
            + 1.0 / (c1 - fitted)
            + 1.0 / ((r2 - c1) + fitted)
        )
        chi2 += (a - fitted) ** 2 * var_inv
        sum_d += a - fitted
        sum_v += 1.0 / var_inv
    return len(tabs), psi, chi2, chi2 - sum_d * sum_d / sum_v


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_breslow_day_matches_reference(spark, sf_dir):
    from de4ml_spark.queries.mldataq6 import breslow_day_docs

    n_strata, psi, chi2, tarone = _bd_reference(_bd_tables(sf_dir))
    row = breslow_day_docs(spark, sf_dir).collect()[0]
    assert row["n_strata"] == n_strata
    assert row["df"] == n_strata - 1
    # catalog psi is micro-quantized MH sums; reference is unquantized
    assert row["or_mh"] == pytest.approx(psi, rel=1e-5)
    assert row["chi2_bd"] == pytest.approx(chi2, rel=1e-4, abs=1e-4)
    assert row["chi2_tarone"] == pytest.approx(tarone, rel=1e-4, abs=1e-4)
    assert row["chi2_tarone"] <= row["chi2_bd"] + 1e-9
    # fitted-cell sanity: a homogeneous-looking corpus should not
    # explode; chi2 is finite and non-negative
    assert 0.0 <= row["chi2_bd"] < 1e9


def test_breslow_day_exact_homogeneity_is_zero():
    """Strata manufactured with IDENTICAL odds ratios must give
    chi2 ~ 0 (the fitted cells equal the observed ones)."""
    tables = [
        ("s1", 20, 10, 5, 10),   # OR = (20*10)/(10*5) = 4
        ("s2", 40, 20, 10, 20),  # same OR, doubled
        ("s3", 8, 4, 2, 4),      # same OR, scaled down
    ]
    n, psi, chi2, tarone = _bd_reference(tables)
    assert n == 3
    assert psi == pytest.approx(4.0, rel=1e-12)
    assert chi2 == pytest.approx(0.0, abs=1e-9)
    assert tarone == pytest.approx(0.0, abs=1e-9)


# -------------------------------------------------------------- HyperANF


def _phash(s: str, bits: int) -> int:
    import hashlib

    digest = hashlib.md5(s.encode()).digest()
    return int.from_bytes(digest[8:16], "little") & ((1 << bits) - 1)


def _anf_reference(sf_dir: str):
    """Exact BFS balls + the SAME KMV estimator: the propagated min-K
    sketch's fixpoint must equal 'K smallest hashes in the h-ball'
    (semilattice identity), so totals match the entry EXACTLY."""
    from de4ml_spark.queries.graphq import ANF_BITS, ANF_H, ANF_K, _ANF_NUM

    nodes, edges = _copurchase(sf_dir)
    adj: dict[int, set[int]] = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    hashes = {n: _phash(str(n), ANF_BITS) for n in nodes}
    balls = {n: {n} for n in nodes}
    totals, exacts = [], []
    for h in range(ANF_H + 1):
        if h > 0:
            balls = {
                n: ball | {w for m in ball for w in adj[m]}
                for n, ball in balls.items()
            }
        total = 0
        for n, ball in balls.items():
            hs = sorted({hashes[m] for m in ball})
            if len(hs) < ANF_K:
                total += len(hs)
            else:
                total += _ANF_NUM // (hs[ANF_K - 1] + 1)
        totals.append(total)
        exacts.append(sum(len(b) for b in balls.values()))
    return totals, exacts


def test_hyperanf_matches_ball_sketch_exactly(spark):
    from de4ml_spark.queries.graphq import hyperanf_parts

    totals, exacts = _anf_reference("/root/testdata/sf0.001")
    rows = {
        r["h"]: r
        for r in hyperanf_parts(spark, "/root/testdata/sf0.001").collect()
    }
    t4 = totals[-1]
    for h, total in enumerate(totals):
        assert rows[h]["total_reach_est"] == total
        assert rows[h]["frac_ppm"] == (2 * total * 1_000_000 + t4) // (
            2 * t4
        )
    # estimator sanity: within 35% of the exact neighborhood function
    # at every level (K = 32 -> ~18% per-node sigma, tighter in sum)
    for total, exact in zip(totals, exacts):
        assert abs(total - exact) <= 0.35 * exact
    # monotone: N(h) grows with h
    assert all(a <= b for a, b in zip(totals, totals[1:]))


def test_anf_closeness_matches_ball_sketch_exactly(spark):
    """Per-node radius-4 harmonic score from exact BFS balls + the same
    KMV estimator must reproduce the entry's top-20 bit-for-bit
    (including the node-id tie-break)."""
    from de4ml_spark.queries.graphq import (
        ANF_BITS,
        ANF_H,
        ANF_K,
        ANF_TOPK,
        _ANF_NUM,
        anf_closeness_parts,
    )

    nodes, edges = _copurchase("/root/testdata/sf0.001")
    adj: dict[int, set[int]] = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    hashes = {n: _phash(str(n), ANF_BITS) for n in nodes}
    balls = {n: {n} for n in nodes}
    ests = {n: [] for n in nodes}
    for h in range(ANF_H + 1):
        if h > 0:
            balls = {
                n: ball | {w for m in ball for w in adj[m]}
                for n, ball in balls.items()
            }
        for n, ball in balls.items():
            hs = sorted({hashes[m] for m in ball})
            ests[n].append(
                len(hs)
                if len(hs) < ANF_K
                else _ANF_NUM // (hs[ANF_K - 1] + 1)
            )
    weights = [12, 6, 4, 3]
    scored = sorted(
        (
            (
                -sum(
                    w * (e[h + 1] - e[h])
                    for h, w in enumerate(weights)
                ),
                n,
            )
            for n, e in ests.items()
        ),
    )[:ANF_TOPK]
    expected = [(n, -neg) for neg, n in scored]

    rows = anf_closeness_parts(
        spark, "/root/testdata/sf0.001"
    ).collect()
    got = sorted(
        ((r["node"], r["score12"]) for r in rows),
        key=lambda t: (-t[1], t[0]),
    )
    assert got == expected
    for r in rows:
        assert r["harmonic_closeness_r4"] == r["score12"] / 12.0
        assert r["score12"] >= 0
