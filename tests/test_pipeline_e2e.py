"""Full ML-data pipeline composition: every stage of the engine chained on
the driver testdata, asserting the handoff shapes at each step. This is
the "a user can run their whole workflow" proof:

raw docs -> quality score -> near-dup pairs -> components -> survivor
dedup -> deterministic sample -> leakage-safe split -> sequence packing.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_full_curation_pipeline(spark, sf_dir):
    from de4ml_spark.operators.dedup import connected_components, ngram_jaccard_pairs
    from de4ml_spark.operators.sampling import deterministic_sample, group_split
    from de4ml_spark.operators.text import quality_score, tokens
    from de4ml_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality gate
    scored = quality_score(docs)
    kept = scored.filter(F.col("quality") >= 0.5)
    n1 = kept.count()
    assert 0 < n1 < n0

    # 2. near-dup graph -> components -> survivor per cluster (min doc_id)
    pairs = ngram_jaccard_pairs(docs, threshold=0.8).select("id_a", "id_b")
    comp = connected_components(pairs, docs, id_col="doc_id")
    survivors = comp.filter(F.col("doc_id") == F.col("component"))
    n_clustered_away = comp.filter(F.col("doc_id") != F.col("component")).count()
    assert n_clustered_away > 0  # the corpus ships near-dups
    deduped = kept.join(survivors.select("doc_id"), "doc_id")
    n2 = deduped.count()
    assert n2 <= n1

    # 3. deterministic sample + leakage-safe split
    sampled = deterministic_sample(deduped, 0.8, "doc_id", salt="e2e")
    split = group_split(sampled, "doc_id", test_fraction=0.2, salt="e2e")
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "test"}
    assert counts["train"] > counts["test"]

    # 4. pack the train split into training sequences
    w_docs = split.filter(F.col("split") == "train").select(
        "doc_id", F.size(tokens("text")).alias("n_tokens")
    )
    from pyspark.sql import Window

    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    packed = w_docs.withColumn(
        "offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).withColumn("seq", (F.col("offset") / 512).cast("bigint"))
    total_tokens = packed.agg(F.sum("n_tokens")).collect()[0][0]
    n_seqs = packed.agg(F.count_distinct("seq")).collect()[0][0]
    # every 512-token budget is filled except possibly the last
    assert n_seqs >= total_tokens // 512
    # deterministic end-to-end: rerun -> same counts
    again = group_split(
        deterministic_sample(deduped, 0.8, "doc_id", salt="e2e"),
        "doc_id", test_fraction=0.2, salt="e2e",
    )
    counts2 = {r["split"]: r["n"] for r in again.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts2 == counts
