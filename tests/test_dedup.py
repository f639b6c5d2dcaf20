"""Dedup operator tests: exact-dedup semantics, MinHash-LSH recall against
exact Jaccard, SimHash candidate completeness against exact Hamming."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from de4ml_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from de4ml_spark.session import load_table


def test_exact_dedup_normalization(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello  World"),
            (2, "hello world"),   # same after normalization
            (3, " HELLO world "),
            (4, "different doc"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r["n_copies"] for r in exact_dedup(df).collect()}
    assert out == {1: 3, 4: 1}  # min-id survivor, 3 copies collapsed


def test_minhash_lsh_recall_equals_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    assert exact, "testdata should contain planted near-duplicates"
    # exact-verify step guarantees precision; bands tuned for full recall here
    assert lsh == exact


def test_minhash_signature_seeds_differ(spark):
    """Regression: per-seed hash functions must actually differ (a two-arg
    lambda in transform() silently becomes the (element, index) form)."""
    from de4ml_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m n o p")], "doc_id BIGINT, text STRING"
    )
    sig = minhash_signatures(df, num_hashes=8).collect()[0]["sig"]
    assert len(set(sig)) > 1


def test_simhash_pairs_complete_vs_bruteforce(spark, sf_dir):
    """Band candidates must recover every pair with Hamming <= 3 (pigeonhole
    guarantee) — verified against a brute-force signature cross join."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = simhash(docs)
    a, b = sigs.alias("a"), sigs.alias("b")
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    banded = {
        (r["id_a"], r["id_b"]) for r in simhash_pairs(docs, max_hamming=3).collect()
    }
    assert banded == brute
    assert banded, "planted near-dups should collide at Hamming <= 3"


def test_simhash_near_dups_have_close_signatures(spark, sf_dir):
    """Planted Jaccard≈0.99 near-dups should be within small Hamming."""
    docs = load_table(spark, sf_dir, "documents")
    exact = ngram_jaccard_pairs(docs, threshold=0.95).collect()
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    close = sum(
        1
        for r in exact
        if bin(sigs[r["id_a"]] ^ sigs[r["id_b"]]).count("1") <= 8
    )
    assert exact and close / len(exact) >= 0.8


def test_embedding_blocked_matches_fold_path(spark, sf_dir):
    """The blocked-BLAS path must find exactly the pairs the fold path
    finds, with cosines equal to ~1 ulp (BLAS summation order differs)."""
    from de4ml_spark.operators.dedup import (
        embedding_neardup_blocked,
        embedding_neardup_pairs,
    )
    from de4ml_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    fold = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_neardup_pairs(emb, threshold=0.45).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_neardup_blocked(emb, threshold=0.45).collect()
    }
    assert set(fold) == set(blocked)
    for pair, cs in fold.items():
        assert abs(cs - blocked[pair]) < 1e-9


def test_connected_components_chain(spark):
    """A chain a-b, b-c, plus an isolated pair and a singleton: labels
    propagate transitively to the min id in >1 round."""
    from de4ml_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (20, 21)], "id_a BIGINT, id_b BIGINT"
    )
    verts = spark.createDataFrame(
        [(i,) for i in (1, 5, 9, 20, 21, 99)], "doc_id BIGINT"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs, verts).collect()
    }
    assert got == {1: 1, 5: 1, 9: 1, 20: 20, 21: 20, 99: 99}


def test_portable_hash_matches_duckdb(spark):
    """The portability guarantee itself: Spark's md5-byte-arithmetic hash
    equals DuckDB's md5_number_lower for arbitrary strings and bit widths."""
    import duckdb

    from de4ml_spark.operators.portable_hash import (
        phash_duck_sql,
        phash_spark_sql,
    )

    vals = ["abc", "hello world", "", "τεστ unicode", "a b c", "7:63"]
    con = duckdb.connect()
    for bits in (32, 59):
        got = {
            r["s"]: r["ph"]
            for r in spark.createDataFrame([(v,) for v in vals], "s STRING")
            .selectExpr("s", f"{phash_spark_sql('s', bits)} AS ph")
            .collect()
        }
        for v in vals:
            want = con.execute(
                f"SELECT {phash_duck_sql('?', bits)}", [v]
            ).fetchone()[0]
            assert got[v] == want, (v, bits)


def test_portable_minhash_recall_equals_exact(spark, sf_dir):
    """The engine-portable MinHash variant (catalog entry) must recover the
    exact-Jaccard pair set just like the xxhash64 variant."""
    from de4ml_spark.operators.dedup import minhash_lsh_pairs_portable

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs_portable(docs, threshold=0.8).collect()
    }
    assert exact and lsh == exact


def test_portable_simhash_pairs_complete(spark, sf_dir):
    """Portable 59-bit SimHash banding must recover every pair with
    Hamming <= 3 (pigeonhole over 4 bands), like the 64-bit variant."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = simhash(docs, bits=59, portable=True)
    a, b = sigs.alias("a"), sigs.alias("b")
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    banded = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(docs, max_hamming=3, bits=59, portable=True).collect()
    }
    assert banded == brute and banded
