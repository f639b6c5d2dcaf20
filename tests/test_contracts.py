"""Unit tests for JSON-Schema <-> StructType and manifest generation
(parity: logging-service/app/lib/jsonschema.py, app/migrate.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from de4ml_spark.contracts import (
    flatten_manifest,
    merge_manifests,
    struct_from_json_schema,
)

SEARCH_SCHEMA = {
    "type": "object",
    "properties": {
        "timestamp_micros": {"type": "integer"},
        "user": {"$ref": "#/$defs/User"},
        "query_id": {"type": "string"},
        "raw_query": {"type": "string"},
        "results": {"type": "array", "items": {"$ref": "#/$defs/Result"}},
    },
    "required": ["user", "query_id", "raw_query"],
    "$defs": {
        "User": {
            "type": "object",
            "properties": {"id": {"type": "integer"}},
            "required": ["id"],
        },
        "Result": {
            "type": "object",
            "properties": {
                "document_id": {"type": "integer"},
                "position": {"type": "integer"},
                "score": {"type": "number"},
            },
        },
    },
}


def test_type_mapping():
    st = struct_from_json_schema(SEARCH_SCHEMA)
    by_name = {f.name: f for f in st.fields}
    assert by_name["timestamp_micros"].dataType == T.LongType()
    assert by_name["query_id"].dataType == T.StringType()
    assert isinstance(by_name["user"].dataType, T.StructType)
    assert by_name["user"].dataType["id"].dataType == T.LongType()
    res = by_name["results"].dataType
    assert isinstance(res, T.ArrayType)
    assert res.elementType["score"].dataType == T.DoubleType()


def test_freeform_object_is_raw_json_string():
    st = struct_from_json_schema(
        {"type": "object", "properties": {"blob": {"type": "object"}}}
    )
    assert st["blob"].dataType == T.StringType()


def test_spark_type_escape_hatch(spark):
    # DDL parsing needs an active session (JVM-side parser)
    st = struct_from_json_schema(
        {
            "type": "object",
            "properties": {"d": {"spark_type": "decimal(10,2)"}},
        }
    )
    assert st["d"].dataType == T.DecimalType(10, 2)


def test_flatten_manifest_matches_reference_shape():
    # expected manifest: logging-service/app/config/searches_columns.csv:1-7
    st = struct_from_json_schema(SEARCH_SCHEMA)
    assert flatten_manifest(st) == [
        "timestamp_micros",
        "user__id",
        "query_id",
        "raw_query",
        "results__document_id",
        "results__position",
        "results__score",
    ]


def test_merge_manifests_append_only():
    v1 = ["a", "b__c"]
    v2 = ["a", "b__c", "b__d", "e"]
    assert merge_manifests(v1, v2) == ["a", "b__c", "b__d", "e"]
    with pytest.raises(ValueError):
        merge_manifests(["a", "gone"], ["a"])


def test_diff_contracts_classifies_and_emits_alter(spark):
    from pyspark.sql import types as T

    from de4ml_spark.contracts.ddl import alter_table_sql, diff_contracts

    old = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "user",
                T.StructType([T.StructField("name", T.StringType())]),
            ),
            T.StructField(
                "results",
                T.ArrayType(
                    T.StructType([T.StructField("score", T.DoubleType())])
                ),
            ),
        ]
    )
    new = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "user",
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("age", T.IntegerType()),
                    ]
                ),
            ),
            T.StructField(
                "results",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("score", T.DoubleType()),
                            T.StructField("rank", T.IntegerType()),
                        ]
                    )
                ),
            ),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    d = diff_contracts(old, new)
    assert d["compatible"]
    assert d["added"] == {
        "user__age": "int",
        "results__rank": "array<int>",
        "ts": "timestamp",
    }
    sql = alter_table_sql("events_flat", d)
    assert sql == (
        "ALTER TABLE events_flat ADD COLUMNS "
        "(results__rank ARRAY<INT>, ts TIMESTAMP, user__age INT)"
    )
    # the emitted DDL must actually run against a real table
    spark.sql("CREATE TABLE IF NOT EXISTS events_flat (id BIGINT, user__name STRING, results__score ARRAY<DOUBLE>) USING PARQUET")
    try:
        spark.sql(sql)
        assert set(spark.table("events_flat").columns) == {
            "id", "user__name", "results__score",
            "results__rank", "ts", "user__age",
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS events_flat")


def test_diff_contracts_rejects_non_additive():
    import pytest as _pytest

    from pyspark.sql import types as T

    from de4ml_spark.contracts.ddl import alter_table_sql, diff_contracts

    old = T.StructType([T.StructField("a", T.LongType())])
    dropped = diff_contracts(old, T.StructType([T.StructField("b", T.LongType())]))
    assert not dropped["compatible"] and dropped["removed"] == {"a": "bigint"}
    retyped = diff_contracts(
        old, T.StructType([T.StructField("a", T.StringType())])
    )
    assert retyped["retyped"] == {"a": ("bigint", "string")}
    for d in (dropped, retyped):
        with _pytest.raises(ValueError):
            alter_table_sql("t", d)
    # no-op diff emits nothing
    assert alter_table_sql("t", diff_contracts(old, old)) is None
