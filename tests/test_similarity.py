"""Similarity-search tests: cosine correctness vs numpy, LSH structure and
recall against the exact brute-force ranking."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from de4ml_spark.operators.similarity import topk_bruteforce, topk_lsh
from de4ml_spark.session import load_table


def test_cosine_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = emb.filter(F.col("vec_id") == rows[0]["vec_id"])
    got = topk_bruteforce(q, emb, k=5).collect()
    for r in got:
        a, b = vecs[r["query_id"]], vecs[r["neighbor_id"]]
        expect = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r["cos_sim"] == pytest.approx(expect, abs=1e-6)


def test_bruteforce_rank_contract(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    got = topk_bruteforce(q, emb, k=5)
    per_q = {}
    for r in got.collect():
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in per_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        sims = [r["cos_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != qid for r in rows)


def test_lsh_subset_and_recall(spark, sf_dir):
    """LSH results must be a subset of the scored universe with identical
    cos_sim values, and recall@5 must beat random bucketing."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    brute = topk_bruteforce(q, emb, k=5).collect()
    lsh = topk_lsh(q, emb, k=5, bits=4).collect()

    brute_pairs = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in brute}
    lsh_pairs = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in lsh}
    # same exact scoring for pairs both methods ranked
    for pair, sim in lsh_pairs.items():
        if pair in brute_pairs:
            assert sim == brute_pairs[pair]

    hit = sum(1 for p in brute_pairs if p in lsh_pairs)
    recall = hit / len(brute_pairs)
    # Gate: beat random bucketing. Random assignment into 2^4 buckets finds
    # a given true neighbor with p = 1/16 ≈ 0.06; sign-LSH must do better.
    # On these weakly-structured synthetic vectors (top-5 cos_sim barely
    # above noise) per-plane agreement is only ~0.55, so absolute recall is
    # modest (~0.55^4 ≈ 0.09+) — the gate is structural, not a quality SLA.
    assert recall > 1 / 16, f"recall@5 = {recall} not better than random"


def test_ivf_recall(spark, sf_dir):
    """IVF probing 4/16 cells should recover most exact neighbors."""
    from de4ml_spark.operators.ivf import fit_centroids, topk_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    cents = fit_centroids(emb, k_cells=8, sample_n=500)
    assert len(cents) == 8 and len(cents[0]) == 64
    q = emb.filter(F.col("vec_id") < 5)
    brute_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_bruteforce(q, emb, k=5).collect()
    }
    ivf_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_ivf(q, emb, cents, k=5, nprobe=4).collect()
    }
    recall = len(brute_pairs & ivf_pairs) / len(brute_pairs)
    assert recall >= 0.5, f"recall@5 = {recall}"


def test_int8_quantization_error_bound(spark, sf_dir):
    """Quantize-dequantize error must be <= scale/2 per element, codes must
    span the int8 range direction correctly, and memory shrinks 4x+
    (tinyint vs float)."""
    from de4ml_spark.operators.similarity import quantize_int8
    from de4ml_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    q = quantize_int8(emb)
    joined = emb.join(q, "vec_id").collect()
    assert len(joined) == 100
    for r in joined:
        scale = r["scale"]
        for orig, code in zip(r["embedding"], r["codes"]):
            assert -127 <= code <= 127
            assert abs(float(orig) - code * scale) <= scale / 2 + 1e-12
