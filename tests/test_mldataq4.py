"""Feature-engineering tier 4: leakage and determinism invariants
beyond the oracle gate — OOF encodings recomputed from fold sums,
feature-hash buckets replayed through a Python md5 replica, negative
samples disjoint from positives, assortativity moments recomputed."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _phash59(s: str) -> int:
    d = hashlib.md5(s.encode()).digest()
    return int.from_bytes(d[8:16], "little") & ((1 << 59) - 1)


def test_oof_encoding_excludes_own_fold(spark):
    from de4ml_spark.queries.mldataq4 import (
        OOF_FOLDS,
        oof_target_encode_events,
    )

    rows = oof_target_encode_events(spark, SF).collect()
    by_type = defaultdict(dict)
    for r in rows:
        by_type[r["event_type"]][r["fold"]] = r
    for t, folds in by_type.items():
        assert set(folds) <= set(range(OOF_FOLDS))
        n_tot = folds[0]["n_in_fold"] + folds[0]["n_oof"]
        sum_tot = None
        for f, r in folds.items():
            # every fold agrees on the category totals
            assert r["n_in_fold"] + r["n_oof"] == n_tot
            # oof mean excludes exactly this fold's mass: recompute
            if r["n_oof"] > 0:
                cents = r["sum_oof_c"]
                want = (2 * cents * 100 + r["n_oof"]) // (2 * r["n_oof"])
                assert round(r["enc_oof_r"] * 100) == want
            else:
                assert r["enc_oof_r"] is None


def test_feature_hash_bucket_replay(spark):
    from de4ml_spark.queries.mldataq4 import (
        FH_BUCKETS,
        feature_hash_docs,
    )
    from de4ml_spark.session import load_table

    out = {r["bucket"]: r for r in feature_hash_docs(spark, SF).collect()}
    docs = load_table(spark, SF, "documents").select("text").collect()
    occ = defaultdict(int)
    toks = defaultdict(set)
    for r in docs:
        for tok in r["text"].split(" "):
            if tok:
                b = _phash59(tok) % FH_BUCKETS
                occ[b] += 1
                toks[b].add(tok)
    assert set(out) == set(occ)
    for b in occ:
        assert out[b]["n_occurrences"] == occ[b]
        assert out[b]["n_tokens"] == len(toks[b])


def test_negative_samples_disjoint_and_deterministic(spark):
    from de4ml_spark.queries.mldataq4 import (
        NEG_K,
        NEG_USERS,
        negative_samples_orders,
    )
    from de4ml_spark.session import load_table

    rows = negative_samples_orders(spark, SF).collect()
    per_user = defaultdict(list)
    for r in rows:
        per_user[r["custkey"]].append(r)
    assert len(per_user) == NEG_USERS
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    pos = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .collect()
    )
    positives = {(r["c"], r["p"]) for r in pos}
    n_parts = load_table(spark, SF, "part").count()
    for cust, draws in per_user.items():
        assert len(draws) == NEG_K
        assert sorted(d["draw_rank"] for d in draws) == list(
            range(1, NEG_K + 1)
        )
        for d in draws:
            assert (cust, d["partkey"]) not in positives
            # hash-walk replay: draw i maps to this exact part
            want = _phash59(f"neg:{cust}:{d['i']}") % n_parts + 1
            assert d["partkey"] == want
        # parts are distinct within a user
        assert len({d["partkey"] for d in draws}) == NEG_K


def test_assortativity_matches_python(spark):
    from de4ml_spark.queries.graphq import degree_assortativity_parts
    from tests.test_graphq2 import _adjacency

    nbr = _adjacency(spark)
    deg = {n: len(v) for n, v in nbr.items()}
    m = sx = sxx = sxy = 0
    for u in nbr:
        for v in nbr[u]:
            m += 1
            sx += deg[u]
            sxx += deg[u] * deg[u]
            sxy += deg[u] * deg[v]
    row = degree_assortativity_parts(spark, SF).collect()[0]
    assert (row["m"], row["sx"], row["sxx"], row["sxy"]) == (
        m,
        sx,
        sxx,
        sxy,
    )
    num = float(m * sxy - sx * sx)
    den = float(m * sxx - sx * sx)
    import math

    assert row["assortativity_r"] == num / math.sqrt(den * den)


def test_quantile_normalize_exact_rank_map(spark):
    """Every doc's normalized value equals the pooled order statistic
    at the half-up-rounded relative rank — recomputed in Python."""
    from de4ml_spark.queries.mldataq4 import quantile_normalize_docs
    from de4ml_spark.session import load_table

    docs = (
        load_table(spark, SF, "documents")
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    pooled = sorted((r["n_chars"], r["doc_id"]) for r in docs)
    pooled_vals = [v for v, _ in pooled]
    nn = len(pooled)
    by_src = defaultdict(list)
    for r in docs:
        by_src[r["source"]].append((r["n_chars"], r["doc_id"]))
    got = {r["doc_id"]: r for r in quantile_normalize_docs(spark, SF).collect()}
    assert len(got) == nn
    for src, lst in by_src.items():
        lst.sort()
        ns = len(lst)
        for r0, (v, did) in enumerate(lst, start=1):
            if ns == 1:
                idx = (nn + 1) // 2
            else:
                idx = (2 * (r0 - 1) * (nn - 1) + (ns - 1)) // (
                    2 * (ns - 1)
                ) + 1
            g = got[did]
            assert g["src_rank"] == r0
            assert g["qnorm_chars"] == pooled_vals[idx - 1]


def test_popularity_hitrate_recompute(spark):
    """Top-K train popularity and per-customer holdout hits recomputed
    exactly from the raw tables."""
    import datetime

    from de4ml_spark.queries.mldataq4 import (
        POP_K,
        POP_SPLIT_DEN,
        POP_SPLIT_NUM,
        popularity_hitrate_orders,
    )
    from de4ml_spark.session import load_table

    orders = load_table(spark, SF, "orders").selectExpr(
        "o_orderkey", "o_custkey", "CAST(o_orderdate AS DATE) AS od"
    ).collect()
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    lines_by_order = defaultdict(list)
    for r in li:
        lines_by_order[r["l_orderkey"]].append(r["l_partkey"])
    days = [r["od"] for r in orders]
    span = (max(days) - min(days)).days
    split = min(days) + datetime.timedelta(
        days=span * POP_SPLIT_NUM // POP_SPLIT_DEN
    )
    cnt = defaultdict(int)
    holdout = defaultdict(set)
    for r in orders:
        if r["od"] <= split:
            # train popularity counts LINEITEM LINES, not distinct parts
            for p in lines_by_order[r["o_orderkey"]]:
                cnt[p] += 1
        else:
            for p in lines_by_order[r["o_orderkey"]]:
                holdout[r["o_custkey"]].add(p)
    topk = set(
        p
        for p, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :POP_K
        ]
    )
    got = {r["custkey"]: r for r in popularity_hitrate_orders(spark, SF).collect()}
    assert set(got) == set(holdout)
    for cust, parts in holdout.items():
        hits = len(parts & topk)
        assert got[cust]["n_holdout"] == len(parts)
        assert got[cust]["n_hits"] == hits


def test_emd_and_gini_recompute(spark):
    """EMD scaled integers and the Gini coefficient recomputed exactly."""
    from de4ml_spark.queries.relational3 import gini_revenue_parts
    from de4ml_spark.queries.sketchq import emd_value_types
    from de4ml_spark.session import load_table

    ev = load_table(spark, SF, "events").selectExpr(
        "event_type",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_c",
    ).where("v_c IS NOT NULL AND event_type IS NOT NULL").collect()
    vals = defaultdict(list)
    for r in ev:
        vals[r["event_type"]].append(r["v_c"])
    got = {
        (r["type_a"], r["type_b"]): r
        for r in emd_value_types(spark, SF).collect()
    }
    types = sorted(vals)
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            xs, ys = sorted(vals[a]), sorted(vals[b])
            na, nb = len(xs), len(ys)
            support = sorted(set(xs) | set(ys))
            emd_scaled = 0
            ca = cb = 0
            import bisect

            for v, vn in zip(support, support[1:]):
                ca = bisect.bisect_right(xs, v)
                cb = bisect.bisect_right(ys, v)
                emd_scaled += abs(ca * nb - cb * na) * (vn - v)
            r = got[(a, b)]
            assert (r["n_a"], r["n_b"]) == (na, nb)
            assert r["emd_scaled_d"] == float(emd_scaled)

    li = load_table(spark, SF, "lineitem").selectExpr(
        "l_partkey",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
        " * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))"
        " AS rev",
    ).collect()
    per = defaultdict(int)
    for r in li:
        per[r["l_partkey"]] += int(r["rev"].scaleb(4))
    xs = sorted((v, k) for k, v in per.items())
    n = len(xs)
    s = sum(v for v, _ in xs)
    wsum = sum(i * v for i, (v, _) in enumerate(xs, start=1))
    grow = gini_revenue_parts(spark, SF).collect()[0]
    assert grow["n"] == n and grow["total_rev_e4"] == s
    assert grow["gini_r"] == float(2 * wsum - (n + 1) * s) / float(n * s)
    assert 0.0 <= grow["gini_r"] < 1.0


def test_embedding_covariance_matches_numpy(spark):
    """Moment sums and covariance recomputed with numpy on the same
    micro-quantized integers — exact equality."""
    import math

    import numpy as np

    from de4ml_spark.queries.simq import embedding_covariance
    from de4ml_spark.session import load_table

    emb = load_table(spark, SF, "embeddings").select("embedding").collect()
    X = np.array(
        [
            [math.floor(float(v) * 1e6 + 0.5) for v in r["embedding"]]
            for r in emb
        ],
        dtype=object,
    )
    n, d = X.shape
    got = {(r["j"], r["k"]): r for r in embedding_covariance(spark, SF).collect()}
    assert len(got) == d * (d + 1) // 2
    sums = [int(sum(X[:, j])) for j in range(d)]
    for j in range(0, d, 7):  # sample the triangle
        for k in range(j, d, 11):
            sjk = int(sum(int(a) * int(b) for a, b in zip(X[:, j], X[:, k])))
            r = got[(j, k)]
            assert (r["n"], r["sj"], r["sk"]) == (n, sums[j], sums[k])
            assert r["sjk_d"] == float(sjk)
            want = (
                float(n * sjk - sums[j] * sums[k])
                / float(n * (n - 1))
                / 1e12
            )
            assert r["cov_r"] == want


def test_map_at_k_python_replay(spark):
    """MAP@K replayed exactly: same split, same ranked top-K, same
    micro-quantized per-hit precisions."""
    import datetime

    from de4ml_spark.queries.mldataq4 import (
        POP_K,
        POP_SPLIT_DEN,
        POP_SPLIT_NUM,
        map_at_k_orders,
    )
    from de4ml_spark.session import load_table

    orders = load_table(spark, SF, "orders").selectExpr(
        "o_orderkey", "o_custkey", "CAST(o_orderdate AS DATE) AS od"
    ).collect()
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    lines = defaultdict(list)
    for r in li:
        lines[r["l_orderkey"]].append(r["l_partkey"])
    days = [r["od"] for r in orders]
    split = min(days) + datetime.timedelta(
        days=(max(days) - min(days)).days * POP_SPLIT_NUM // POP_SPLIT_DEN
    )
    cnt = defaultdict(int)
    holdout = defaultdict(set)
    for r in orders:
        if r["od"] <= split:
            for p in lines[r["o_orderkey"]]:
                cnt[p] += 1
        else:
            for p in lines[r["o_orderkey"]]:
                holdout[r["o_custkey"]].add(p)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:POP_K]
    pos = {p: i for i, (p, _) in enumerate(ranked, start=1)}
    sum_ap = 0
    for cust, parts in holdout.items():
        hit_pos = sorted(pos[p] for p in parts if p in pos)
        prec = sum(
            (2 * i * 10**6 + p) // (2 * p)
            for i, p in enumerate(hit_pos, start=1)
        )
        denom = min(len(parts), POP_K)
        sum_ap += (2 * prec + denom) // (2 * denom)
    row = map_at_k_orders(spark, SF).collect()[0]
    assert row["n_customers"] == len(holdout)
    assert row["sum_ap_u"] == sum_ap
    assert 0.0 <= row["map_r"] <= 1.0
