"""k-core and per-edge Jaccard: exact pure-Python recomputes of both
operators on the sf0.001 co-purchase graph (the oracle gate proves
cross-engine equality; these prove the algorithm itself)."""

from __future__ import annotations

from collections import defaultdict

SF = "/root/testdata/sf0.001"


def _adjacency(spark):
    from de4ml_spark.session import load_table

    li = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    nbr = defaultdict(set)
    for parts in by_order.values():
        for p in parts:
            nbr[p] |= parts - {p}
    return {k: v for k, v in nbr.items() if v}


def test_kcore_matches_python_peel(spark):
    from de4ml_spark.queries.graphq import KCORE_ROUNDS, kcore_parts

    nbr = _adjacency(spark)
    deg0 = {n: len(v) for n, v in nbr.items()}
    degs = sorted(deg0.values())
    # k = (min + median) // 2, median at ceil(n/2) by (deg, node)
    ordered = sorted(deg0.items(), key=lambda kv: (kv[1], kv[0]))
    med = ordered[(len(ordered) + 1) // 2 - 1][1]
    k = (min(degs) + med) // 2

    cur = {n: set(v) for n, v in nbr.items()}
    sizes = []
    for _ in range(KCORE_ROUNDS):
        keep = {n for n, v in cur.items() if len(v) >= k}
        cur = {
            n: {m for m in v if m in keep}
            for n, v in cur.items()
            if n in keep
        }
        cur = {n: v for n, v in cur.items() if v}
        sizes.append(len(cur))

    rows = kcore_parts(spark, SF).collect()
    got = {r["node"]: r for r in rows}
    assert set(got) == set(cur)
    for n, r in got.items():
        assert r["core_deg"] == len(cur[n])
        assert r["deg0"] == deg0[n]
        assert r["k_val"] == k
        assert r["converged"] == (sizes[-1] == sizes[-2])


def test_jaccard_matches_python_topk(spark):
    from de4ml_spark.queries.graphq import (
        JACCARD_TOPK,
        jaccard_copurchase_parts,
    )

    nbr = _adjacency(spark)
    scored = []
    for u in nbr:
        for v in nbr[u]:
            if u < v:
                common = len(nbr[u] & nbr[v])
                union = len(nbr[u]) + len(nbr[v]) - 2 - common
                ppm = (2 * common * 10**6 + max(union, 1)) // (
                    2 * max(union, 1)
                )
                scored.append((-ppm, u, v, common, union))
    scored.sort()
    want = scored[:JACCARD_TOPK]

    rows = jaccard_copurchase_parts(spark, SF).collect()
    assert len(rows) == min(JACCARD_TOPK, len(scored))
    for r, (nppm, u, v, common, union) in zip(rows, want):
        assert (r["u"], r["v"]) == (u, v)
        assert r["common_neighbors"] == common
        assert r["union_size"] == union
        assert round(r["jaccard_r"] * 10**6) == -nppm
