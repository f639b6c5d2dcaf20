"""Golden end-to-end ETL test mirroring the reference's
logging-service/tests/test_searches.py:25-68: known event JSON -> typed parse
-> __-flatten -> Parquet -> read back -> exact value asserts, including the
parallel-array flattening shape (test_searches.py:64-67)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from de4ml_spark.planaudit import final_plan

from de4ml_spark.contracts import flatten_manifest, struct_from_json_schema
from de4ml_spark.etl import parse_typed, read_warehouse
from de4ml_spark.etl.flatten import flatten
from de4ml_spark.etl.pipeline import RAW_SCHEMA, etl
from tests.test_contracts import SEARCH_SCHEMA

EVENT = {
    "timestamp_micros": 1700000000000000,
    "user": {"id": 1},
    "query_id": "123",
    "raw_query": "test",
    "results": [{"document_id": 1, "position": 1, "score": 1.0}],
}


def _write_raw(spark, tmp_path, events):
    rows = [(1700000000000000 + i, json.dumps(e)) for i, e in enumerate(events)]
    df = spark.createDataFrame(rows, schema=RAW_SCHEMA)
    path = str(tmp_path / "raw")
    df.write.json(path)
    return path


def test_searches_etl_golden(spark, tmp_path):
    raw = _write_raw(spark, tmp_path, [EVENT])
    struct = struct_from_json_schema(SEARCH_SCHEMA)
    out = str(tmp_path / "wh")
    etl(spark, raw, struct, out)

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    # exact golden values incl. parallel-array shape (test_searches.py:60-67)
    assert r["timestamp_micros"] == 1700000000000000
    assert r["user__id"] == 1
    assert r["query_id"] == "123"
    assert r["raw_query"] == "test"
    assert r["results__document_id"] == [1]
    assert r["results__position"] == [1]
    assert r["results__score"] == [1.0]


def test_parse_malformed_yields_nulls(spark, tmp_path):
    raw = _write_raw(spark, tmp_path, [EVENT])
    struct = struct_from_json_schema(SEARCH_SCHEMA)
    bad = spark.createDataFrame([(1, "{not json")], schema=RAW_SCHEMA)
    typed = parse_typed(bad, struct)
    row = typed.collect()[0]
    assert row["query_id"] is None  # permissive parse -> nulls, rejected later


def test_schema_evolution_merge_read(spark, tmp_path):
    """v1 files + v2 files (new leaf) read together: union schema, nulls for
    v1 rows — migrate.py:42-72 append-only contract."""
    struct_v1 = struct_from_json_schema(SEARCH_SCHEMA)
    schema_v2 = json.loads(json.dumps(SEARCH_SCHEMA))
    schema_v2["$defs"]["User"]["properties"]["locale"] = {"type": "string"}
    struct_v2 = struct_from_json_schema(schema_v2)

    m1 = flatten_manifest(struct_v1)
    m2 = flatten_manifest(struct_v2)
    from de4ml_spark.contracts import merge_manifests

    manifest = merge_manifests(m1, m2)
    assert "user__locale" in manifest

    wh = str(tmp_path / "wh2")
    raw1 = _write_raw(spark, tmp_path / "r1", [EVENT])
    typed1 = parse_typed(spark.read.schema(RAW_SCHEMA).json(raw1), struct_v1)
    flatten(typed1.drop("ts"), struct_v1, m1).write.mode("append").parquet(wh)

    ev2 = dict(EVENT, user={"id": 2, "locale": "en"}, query_id="456")
    raw2 = _write_raw(spark, tmp_path / "r2", [ev2])
    typed2 = parse_typed(spark.read.schema(RAW_SCHEMA).json(raw2), struct_v2)
    flatten(typed2.drop("ts"), struct_v2, m2).write.mode("append").parquet(wh)

    merged = read_warehouse(spark, wh, manifest)
    assert merged.columns == manifest
    got = {r["query_id"]: r for r in merged.collect()}
    assert got["123"]["user__locale"] is None  # old file null-filled
    assert got["456"]["user__locale"] == "en"


def test_flatten_plan_is_pure_projection(spark, tmp_path):
    """The flatten plan must be a single Project over the scan — no shuffle,
    no UDF (scale contract: ETL is embarrassingly parallel)."""
    raw = _write_raw(spark, tmp_path, [EVENT])
    struct = struct_from_json_schema(SEARCH_SCHEMA)
    typed = parse_typed(spark.read.schema(RAW_SCHEMA).json(raw), struct)
    flat = flatten(typed.drop("ts"), struct)
    plan = final_plan(flat)
    assert "Exchange" not in plan
    assert "Python" not in plan  # no Python UDFs in the ETL hot path


def test_compact_small_files(spark, tmp_path):
    from de4ml_spark.etl.layout import compact

    src = str(tmp_path / "frag")
    # 40 tiny files
    spark.range(4000).repartition(40).write.parquet(src)
    out = str(tmp_path / "compacted")
    n = compact(spark, src, out, target_bytes=10 * 1024 * 1024)
    import os

    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == n <= 4
    assert spark.read.parquet(out).count() == 4000


def test_sampling_deterministic_and_leakage_safe(spark, sf_dir):
    from de4ml_spark.operators.sampling import (
        deterministic_sample,
        group_split,
        mix_sources,
    )
    from de4ml_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    s1 = {r["doc_id"] for r in deterministic_sample(docs, 0.2, "doc_id").collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(docs, 0.2, "doc_id").collect()}
    assert s1 == s2  # reproducible
    n = docs.count()
    assert 0.1 * n < len(s1) < 0.3 * n  # near the target rate
    # monotone: a larger fraction strictly contains a smaller one
    s3 = {r["doc_id"] for r in deterministic_sample(docs, 0.5, "doc_id").collect()}
    assert s1 < s3

    ev = load_table(spark, sf_dir, "events")
    split = group_split(ev, "user_id", test_fraction=0.25)
    per_user = (
        split.groupBy("user_id")
        .agg({"split": "collect_set"})
        .withColumnRenamed("collect_set(split)", "splits")
    )
    # leakage-safe: every user is wholly train or wholly test
    assert per_user.filter("size(splits) > 1").count() == 0

    mixed = mix_sources(docs, {"src1": 0.5, "src2": 1.0, "src3": 0.0})
    by_src = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert by_src.get("src3", 0) == 0
    full = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src["src2"] == full["src2"]


def test_upsert_parquet(spark, tmp_path):
    from de4ml_spark.etl.pipeline import upsert_parquet

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id BIGINT, v STRING"
    ).write.parquet(path)
    updates = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "id BIGINT, v STRING"
    )
    upsert_parquet(spark, path, updates, "id")
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 4: "d"}


def test_upsert_parquet_composite_key(spark, tmp_path):
    """Multi-column key: only the exact (k1, k2) match is replaced — rows
    sharing just the first key component must survive."""
    from de4ml_spark.etl.pipeline import upsert_parquet

    path = str(tmp_path / "t2")
    spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 1, 30)],
        "k1 STRING, k2 BIGINT, v BIGINT",
    ).write.parquet(path)
    updates = spark.createDataFrame(
        [("a", 2, 99), ("c", 1, 40)], "k1 STRING, k2 BIGINT, v BIGINT"
    )
    upsert_parquet(spark, path, updates, ["k1", "k2"])
    got = {(r["k1"], r["k2"]): r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {("a", 1): 10, ("a", 2): 99, ("b", 1): 30, ("c", 1): 40}


def test_sql_surface(spark, sf_dir):
    from de4ml_spark.sql import sql

    df = sql(
        spark,
        sf_dir,
        "SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY 1",
    )
    assert df.count() == 5


def test_with_provenance_lineage_columns(spark, sf_dir, tmp_path):
    from de4ml_spark.etl.pipeline import with_provenance

    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    prov = with_provenance(df)
    rows = prov.collect()
    assert all(r["__source_file"].endswith(".parquet") for r in rows)
    assert all("region.parquet" in r["__source_file"] for r in rows)
    # fingerprint is deterministic and content-based
    again = {r["__row_md5"] for r in with_provenance(df).collect()}
    assert {r["__row_md5"] for r in rows} == again
    assert len(again) == len(rows)  # distinct rows -> distinct hashes
    # idempotent re-application: fingerprint unchanged by provenance cols
    twice = with_provenance(with_provenance(df).drop("__source_file", "__row_md5"))
    assert {r["__row_md5"] for r in twice.collect()} == again
