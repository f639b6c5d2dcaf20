#!/usr/bin/env python
"""Measured scaling probe: synthesize a 10x copy of sf0.1 (~1M events,
50k documents) and time representative catalog operators at sf0.01,
sf0.1, and the synthesized sf1.0 — the 0.1 -> 1.0 ratio is the
meaningful one (the smaller steps sit on scheduling overhead).

Synthesis (deterministic, k = 0..9 copies):
- events:    event_id/user_id offset by k * 10^7 — per-user event volume
             stays constant (the realistic scale axis: more users, not
             longer histories); ts unchanged so calendar cardinality is
             fixed like a real 30-day window at any scale.
- documents: doc_id offset; every token suffixed ``_k`` so copies are
             NOT near-duplicates of each other — dedup workload shape
             (cluster sizes, candidate-pair density per doc) is
             preserved instead of exploding into artificial 10-clusters.

Writes under .scale_tmp/ (gitignored). Usage:
  python tools/scale_probe.py [query ...]   # default: the probe set
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE = [
    "rolling_7d_active_users",
    "sessionize_events",
    "scd2_user_event_type",
    "event_transition_matrix",
    "incident_window_events",
    "throttle_events",
    "dedup_minhash_lsh",
    "dedup_exact_docs",
    "repetition_docs",
    "gopher_rules_docs",
    "pack_sharded",
    "q1_pricing_summary",
    "capped_sessions_events",
    "quota_admission_events",
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivf",
    "dedup_embedding_blocked",
    # round-13 (VERDICT r12 #6): the round-12 graph/stat additions —
    # expected ~flat for the bounded-histogram stats, near-linear in
    # edges for the graph pair
    "giant_component_parts",
    "anf_closeness_parts",
    "contamination_span_docs",
    "delong_auc_variance_events",
    # round-16 (VERDICT r15 #5): the round-13-15 heavy additions that
    # joined the headline after the round-9 probe. Note the lineitem
    # synthesis axis for the graph pair: orderkey-offset copies reuse
    # the SAME part vocabulary, so the DISTINCT co-purchase edge set is
    # unchanged — the 10x lands on the scan + pre-distinct join volume
    # (the realistic crawl-dedup shape: 10x raw observations, same
    # underlying graph), and the map-side-combining distinct must
    # absorb it. The windowed attribution credit split is
    # events-scaled (10x users, per-user bounded windows, ~flat).
    "jaccard_copurchase_parts",
    "hyperanf_parts",
    "attribution_credit_events",
]

BASE = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_tmp", "sf1")
COPIES = 10
OFF = 10_000_000


def synthesize(spark) -> None:
    from pyspark.sql import functions as F

    from de4ml_spark.session import load_table

    os.makedirs(OUT, exist_ok=True)
    if not os.path.exists(os.path.join(OUT, "events.parquet")):
        ev = load_table(spark, BASE, "events")
        parts = [
            ev.select(
                (F.col("event_id") + k * OFF).alias("event_id"),
                "ts",
                (F.col("user_id") + k * OFF).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            for k in range(COPIES)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.repartition(32).write.mode("overwrite").parquet(
            os.path.join(OUT, "events.parquet")
        )
    if not os.path.exists(os.path.join(OUT, "documents.parquet")):
        docs = load_table(spark, BASE, "documents")
        parts = [
            docs.select(
                (F.col("doc_id") + k * OFF).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1_{k}").alias(
                    "text"
                ),
                "lang",
                "source",
                F.length(
                    F.regexp_replace(F.col("text"), r"(\S+)", f"$1_{k}")
                ).alias("n_chars"),
            )
            for k in range(COPIES)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.repartition(32).write.mode("overwrite").parquet(
            os.path.join(OUT, "documents.parquet")
        )
    # small tables copied as-is (q1 needs lineitem; scale it 10x by
    # offsetting orderkeys so group cardinality, not group count, grows)
    if not os.path.exists(os.path.join(OUT, "lineitem.parquet")):
        li = load_table(spark, BASE, "lineitem")
        parts = [
            li.withColumn("l_orderkey", F.col("l_orderkey") + k * OFF)
            for k in range(COPIES)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.repartition(32).write.mode("overwrite").parquet(
            os.path.join(OUT, "lineitem.parquet")
        )
    if not os.path.exists(os.path.join(OUT, "embeddings.parquet")):
        # per-copy sign scramble (deterministic per (copy, dim)) keeps
        # copies mutually dissimilar — near-dup pair density stays that
        # of the base corpus instead of every vector gaining 9 clones
        emb = load_table(spark, BASE, "embeddings")
        dim = len(emb.select("embedding").first()[0])
        parts = []
        for k in range(COPIES):
            signs = F.array(
                *[
                    F.lit(1.0 if k == 0 or ((i * 31 + k * 17) % 7) < 4 else -1.0)
                    for i in range(dim)
                ]
            )
            parts.append(
                emb.select(
                    (F.col("vec_id") + k * OFF).alias("vec_id"),
                    F.zip_with(
                        "embedding",
                        signs,
                        lambda x, s: (x * s).cast("float"),
                    ).alias("embedding"),
                    "label",
                )
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionAll(p)
        u.repartition(32).write.mode("overwrite").parquet(
            os.path.join(OUT, "embeddings.parquet")
        )
    for t in "region nation customer supplier part orders".split():
        dst = os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            load_table(spark, BASE, t).write.mode("overwrite").parquet(dst)


def main() -> None:
    from de4ml_spark.queries import catalog
    from de4ml_spark.session import get_spark

    from de4ml_spark.cache import drain_deferred

    names = sys.argv[1:] or PROBE
    spark = get_spark("scale_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    synthesize(spark)
    qs = catalog.queries()
    out = {}
    for name in names:
        fn = qs[name]
        row = {}
        for label, sf_dir in (
            ("sf0.01", "/root/testdata/sf0.01"),
            ("sf0.1", BASE),
            ("sf1", OUT),
        ):
            times = []
            for _ in range(3):
                # FRESH-PLAN reps (round 16): evict the memoized
                # prepared plan and drop deferred persists before each
                # rep, so every rep pays build + full execution. Without
                # this, entries whose result is eagerly checkpointed
                # (release_after) compute only on rep 1 — reps 2-3 just
                # re-read checkpoint blocks and min-of-3 reports a
                # cache read (~0.03 s at ANY scale), not the operator.
                catalog.evict(name, sf_dir)
                drain_deferred()
                t0 = time.time()
                fn(spark, sf_dir).collect()
                times.append(time.time() - t0)
            row[label] = round(min(times), 3)
        row["ratio_01_to_1"] = (
            round(row["sf1"] / row["sf0.1"], 2) if row["sf0.1"] else None
        )
        out[name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps({"metric": "scale_probe", "results": out}))


if __name__ == "__main__":
    main()
