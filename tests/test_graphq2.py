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


def test_grid_density_clusters_python_recompute(spark):
    """Cell assignment, core flags, and cluster labels recomputed with
    a pure-Python grid + BFS; noise points have NULL cluster."""
    import math
    from collections import deque

    from de4ml_spark.queries.simq import (
        GRID_H,
        GRID_MINPTS,
        _GRID_OFF,
        grid_density_clusters,
    )
    from de4ml_spark.session import load_table

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    ).collect()

    def trunc_div(m, h):
        # truncation toward zero, matching Spark DIV / DuckDB //
        q = abs(m) // h
        return q if m >= 0 else -q

    pts = {
        r["vec_id"]: (
            trunc_div(math.floor(float(r["embedding"][0]) * 1e6 + 0.5), GRID_H),
            trunc_div(math.floor(float(r["embedding"][1]) * 1e6 + 0.5), GRID_H),
        )
        for r in emb
    }
    from collections import Counter

    counts = Counter(pts.values())
    core = {c for c, n in counts.items() if n >= GRID_MINPTS}
    key = lambda c: (c[0] + _GRID_OFF) * 100000 + (c[1] + _GRID_OFF)
    # BFS components over 8-neighbour core cells, labeled by min key
    label = {}
    for start in sorted(core, key=key):
        if start in label:
            continue
        comp = []
        q = deque([start])
        seen = {start}
        while q:
            c = q.popleft()
            comp.append(c)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (c[0] + dx, c[1] + dy)
                    if nb in core and nb not in seen:
                        seen.add(nb)
                        q.append(nb)
        lbl = min(key(c) for c in comp)
        for c in comp:
            label[c] = lbl
    got = {r["vec_id"]: r for r in grid_density_clusters(spark, SF).collect()}
    assert set(got) == set(pts)
    for vid, (cx, cy) in pts.items():
        g = got[vid]
        assert (g["cx"], g["cy"]) == (cx, cy)
        if (cx, cy) in core:
            assert g["is_core"] and g["cluster"] == label[(cx, cy)]
        else:
            assert not g["is_core"] and g["cluster"] is None


def test_hits_bipartite_python_replay(spark):
    """The three unrolled half-steps with integer renormalization
    replayed exactly in Python."""
    from collections import defaultdict

    from de4ml_spark.queries.graphq import (
        HITS_SCALE,
        HITS_TOPK,
        hits_bipartite_orders,
    )
    from de4ml_spark.session import load_table

    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    cust = {r["o_orderkey"]: r["o_custkey"] for r in orders}
    edges = {(cust[r["l_orderkey"]], r["l_partkey"]) for r in li}
    by_p = defaultdict(set)
    by_c = defaultdict(set)
    for c, p in edges:
        by_p[p].add(c)
        by_c[c].add(p)
    a = {p: len(cs) * HITS_SCALE for p, cs in by_p.items()}
    t = sum(a.values())
    a = {p: s * HITS_SCALE // t for p, s in a.items()}
    h = {c: sum(a[p] for p in ps) for c, ps in by_c.items()}
    t = sum(h.values())
    h = {c: s * HITS_SCALE // t for c, s in h.items()}
    a2 = {p: sum(h[c] for c in cs) for p, cs in by_p.items()}
    t = sum(a2.values())
    a2 = {p: s * HITS_SCALE // t for p, s in a2.items()}
    want = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:HITS_TOPK]
    got = hits_bipartite_orders(spark, SF).collect()
    assert [(r["partkey"], r["authority_ppm"]) for r in got] == want


def test_cluster_purity_invariants(spark):
    """Purity in (0,1]; majority counts bounded by cluster size; the
    noise row carries NULL purity; point totals reconcile."""
    from de4ml_spark.queries.simq import cluster_purity_embeddings
    from de4ml_spark.session import load_table

    rows = cluster_purity_embeddings(spark, SF).collect()
    n_total = load_table(spark, SF, "embeddings").count()
    assert sum(r["n_points"] for r in rows) == n_total
    for r in rows:
        assert 1 <= r["n_majority"] <= r["n_points"]
        if r["cluster"] is None:
            assert r["purity_r"] is None
        else:
            assert 0.0 < r["purity_r"] <= 1.0
            assert (
                round(r["purity_r"] * r["n_points"]) >= r["n_majority"] - 1
            )
