"""Round-2 ML-data operators: intra-document repetition metrics and
temperature-adjusted mixture rates — hand-computable fixtures."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from de4ml_spark.operators.sampling import temperature_rates
from de4ml_spark.operators.text import ngram_rows, repetition_stats


def test_ngram_rows_counts_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a"), (3, "x y")], "doc_id BIGINT, text STRING"
    )
    rows = ngram_rows(df, n=2).collect()
    got = {(r["doc_id"], r["gram"]) for r in rows}
    # doc 2 has < 2 tokens -> no rows; multiplicity preserved elsewhere
    assert got == {(1, "a b"), (1, "b c"), (1, "c d"), (3, "x y")}
    assert len(rows) == 4


def test_repetition_stats_exact_fractions(spark):
    # doc 1: tokens a a a a -> bigrams [aa, aa, aa]: total 3, distinct 1,
    # top 3 -> dup2 = 1 - 1/3, top2 = 1. trigrams: total 2, distinct 1.
    # doc 2: a b c a b -> bigrams [ab, bc, ca, ab]: total 4, distinct 3,
    # top 2 -> dup2 = 0.25, top2 = 0.5; trigrams [abc, bca, cab]: all
    # distinct -> dup3 = 0, top3 = 1/3.
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c a b")], "doc_id BIGINT, text STRING"
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, ns=(2, 3)).collect()}
    assert math.isclose(out[1]["dup2_frac"], round(1 - 1 / 3, 6))
    assert out[1]["top2_frac"] == 1.0
    assert math.isclose(out[1]["dup3_frac"], 0.5)
    assert out[2]["dup2_frac"] == 0.25
    assert out[2]["top2_frac"] == 0.5
    assert out[2]["dup3_frac"] == 0.0
    assert math.isclose(out[2]["top3_frac"], round(1 / 3, 6))


def test_temperature_rates_flatten_distribution(spark):
    # 80/20 split at alpha=0.5: q ∝ sqrt(p) -> q = (2/3, 1/3); the minority
    # source upsamples relative to p, majority pins at rate 1.0 downweighted.
    df = spark.range(100).select(
        F.when(F.col("id") < 80, "big").otherwise("small").alias("source")
    )
    out = {r["source"]: r for r in temperature_rates(df).collect()}
    assert out["big"]["n_docs"] == 80 and out["small"]["n_docs"] == 20
    assert math.isclose(out["big"]["q"], round(2 / 3, 6), abs_tol=1e-6)
    assert math.isclose(out["small"]["q"], round(1 / 3, 6), abs_tol=1e-6)
    # rate ratio: (q/p) small vs big = (1/3 / 0.2) / (2/3 / 0.8) = 2 -> big
    # is the max? No: q/p big = 0.833, small = 1.667 -> small pins at 1.0.
    assert out["small"]["rate"] == 1.0
    assert math.isclose(out["big"]["rate"], 0.5, abs_tol=1e-6)
    # expected_docs = rate * n
    assert math.isclose(out["big"]["expected_docs"], 40.0, abs_tol=0.01)
    assert math.isclose(out["small"]["expected_docs"], 20.0, abs_tol=0.01)


def test_portable_hash_fuzz_against_duckdb(spark):
    """Batch fuzz: 200 pseudo-random strings (unicode, whitespace, empties,
    long runs) hashed identically by Spark and DuckDB at both bit widths."""
    import random

    import duckdb

    from de4ml_spark.operators.portable_hash import (
        phash_duck_sql,
        phash_spark_sql,
    )

    rng = random.Random(1729)
    alphabet = "abz 019._-/é中ж\U0001f600"
    vals = [""] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 40)))
        for _ in range(199)
    ]
    sdf = spark.createDataFrame([(v,) for v in vals], "s STRING").selectExpr(
        "s",
        f"{phash_spark_sql('s', 32)} AS h32",
        f"{phash_spark_sql('s', 59)} AS h59",
    )
    got = {r["s"]: (r["h32"], r["h59"]) for r in sdf.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT s, {phash_duck_sql('s', 32)}, {phash_duck_sql('s', 59)} FROM t"
        ).fetchall()
    }
    assert got == want


def test_operators_tolerate_empty_and_tiny_corpora(spark):
    """Dedup/similarity/text operators must return empty results (same
    schema), not crash, on empty or sub-n-gram corpora."""
    from de4ml_spark.operators.dedup import (
        minhash_lsh_pairs_portable,
        simhash_pairs,
    )

    empty = spark.createDataFrame([], "doc_id BIGINT, text STRING")
    tiny = spark.createDataFrame([(1, "one"), (2, "two wds")],
                                 "doc_id BIGINT, text STRING")
    for df in (empty, tiny):
        assert minhash_lsh_pairs_portable(df).count() == 0
        assert simhash_pairs(df).count() == 0
        assert repetition_stats(df, ns=(2, 3)).count() == 0


def test_quality_gate_composes_into_streaming(spark, tmp_path):
    """The batch text operators are pure projections, so the same functions
    drive a streaming corpus gate unchanged — one continuous quality filter
    with no state store."""
    import json

    from de4ml_spark.operators.text import predict_lang, quality_score

    src = tmp_path / "docs"
    src.mkdir()
    rows = [
        {"doc_id": 1, "text": "the a of and the a of and"},      # stopwordy
        {"doc_id": 2, "text": "spark join merge batch window table vector"},
    ]
    (src / "d.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema("doc_id BIGINT, text STRING").json(str(src))
    gated = quality_score(predict_lang(stream)).filter("stop_ratio < 0.5")
    q = (
        gated.select("doc_id", "pred_lang", "quality")
        .writeStream.format("memory")
        .queryName("quality_gate")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = {r["doc_id"]: r for r in spark.sql("SELECT * FROM quality_gate").collect()}
    assert set(out) == {2}  # stopword-heavy doc rejected
    assert out[2]["pred_lang"] == "zh"  # marker vocabulary argmax
    assert 0.0 < out[2]["quality"] <= 1.0


def test_chunk_rows_boundaries(spark):
    """Sliding-window chunking: starts every `stride` tokens, last chunk
    clamps at the doc end, short/empty docs yield exactly one chunk."""
    from de4ml_spark.operators.text import chunk_rows

    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(1, 12))),  # 11 tokens
            (2, "a b"),                                    # shorter than one window
            (3, ""),                                       # empty -> [''] token
        ],
        "doc_id BIGINT, text STRING",
    )
    rows = {
        (r["doc_id"], r["chunk_id"]): r
        for r in chunk_rows(df, chunk_size=4, stride=3).collect()
    }
    # doc 1: overlap 1 -> starts 1,4,7,10 -> sizes 4,4,4,2
    assert [rows[(1, i)]["n_tokens"] for i in range(4)] == [4, 4, 4, 2]
    assert rows[(1, 0)]["chunk_text"] == "t1 t2 t3 t4"
    assert rows[(1, 1)]["chunk_text"] == "t4 t5 t6 t7"   # one-token overlap
    assert rows[(1, 3)]["chunk_text"] == "t10 t11"
    assert rows[(2, 0)]["chunk_text"] == "a b" and len(
        [k for k in rows if k[0] == 2]
    ) == 1
    assert rows[(3, 0)]["n_tokens"] == 1  # split('') -> one empty token


def test_exact_rounding_fuzz_spark_duckdb_fraction(spark):
    """The exact integer-rounding helpers are load-bearing for every
    rounded-mean oracle: fuzz random (p, q) pairs — biased toward exact
    half boundaries, where the naive double ROUND diverges — and require
    Spark, DuckDB, and Fraction-based half-up rounding to agree exactly."""
    import random
    from fractions import Fraction

    import duckdb

    from de4ml_spark.operators.portable_hash import (
        exact_round_div_sql,
        exact_round_neg_mean_sql,
    )

    # domain contract: p * 2e6 must fit a BIGINT, i.e. p <= ~4.6e12
    rng = random.Random(42)
    pairs = []
    for _ in range(150):
        q = rng.randint(1, 10**6)
        if rng.random() < 0.5:  # force an exact half boundary: p/q = k + 1/2
            if q % 2:  # odd q cannot hit the boundary; make q even
                q *= 2
            p = rng.randint(0, 10**6) * q + q // 2
        else:
            p = rng.randint(0, 10**12)
        pairs.append((p, q))

    def frac_half_up(p, q, d=6):
        scale = 10**d
        num = Fraction(p * scale, q)
        k = num.numerator // num.denominator
        rem = Fraction(p * scale, q) - k
        return (k + (1 if rem >= Fraction(1, 2) else 0)) / scale

    neg_sum = "CAST(-p AS DECIMAL(20,6)) / 1000000"
    sdf = spark.createDataFrame(pairs, "p LONG, q LONG").selectExpr(
        "p",
        "q",
        f"{exact_round_div_sql('p', 'q', 'DIV')} AS r",
        f"{exact_round_neg_mean_sql(neg_sum, 'q', 'DIV')} AS rn",
    )
    got = {(r["p"], r["q"]): (r["r"], r["rn"]) for r in sdf.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(p BIGINT, q BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            f"SELECT p, q, {exact_round_div_sql('p', 'q', '//')},"
            f" {exact_round_neg_mean_sql(neg_sum, 'q', '//')}"
            " FROM t"
        ).fetchall()
    }
    assert got == want
    for (p, q), (r, rn) in got.items():
        assert r == frac_half_up(p, q), (p, q, r)
        # the neg-mean input sum is -p/1e6, so its true quotient is p/(q*1e6)
        assert rn == -frac_half_up(p, q * 10**6), (p, q, rn)
