"""Kafka source contract tests — no broker, no connector jar needed.

The option builder and the wire-frame decode are the checked-in halves
of the prod source (S8); the connector-dependent ``load()`` is a
one-liner. These tests pin the option map semantics and that the decode
produces the exact typed schema the downstream ETL consumes.
"""

from __future__ import annotations

import datetime
import json

import pytest

from de4ml_spark.streaming.kafka import (
    KAFKA_WIRE_SCHEMA,
    decode_kafka_json,
    kafka_source_options,
)


def test_option_builder_subscribe():
    opts = kafka_source_options("b1:9092,b2:9092", topic="events")
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "events",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": "1000000",
    }


def test_option_builder_pattern_and_overrides():
    opts = kafka_source_options(
        "b:9092",
        topic_pattern="events-.*",
        starting_offsets="latest",
        max_offsets_per_trigger=None,
        fail_on_data_loss=True,
        min_partitions=64,
    )
    assert opts["subscribePattern"] == "events-.*"
    assert "subscribe" not in opts
    assert "maxOffsetsPerTrigger" not in opts
    assert opts["failOnDataLoss"] == "true"
    assert opts["minPartitions"] == "64"
    # per-partition JSON offsets pass through
    j = '{"events":{"0":23}}'
    assert (
        kafka_source_options("b", topic="events", starting_offsets=j)[
            "startingOffsets"
        ]
        == j
    )


def test_option_builder_rejects_bad_input():
    with pytest.raises(ValueError):
        kafka_source_options("b:9092")  # neither topic nor pattern
    with pytest.raises(ValueError):
        kafka_source_options("b:9092", topic="t", topic_pattern="t.*")
    with pytest.raises(ValueError):
        kafka_source_options("b:9092", topic="t", starting_offsets="middle")
    with pytest.raises(ValueError):
        kafka_source_options("b:9092", topic="t", max_offsets_per_trigger=0)


def test_decode_kafka_json_schema_and_values(spark):
    from pyspark.sql import types as T

    struct = T.StructType(
        [
            T.StructField("query_id", T.StringType()),
            T.StructField("position", T.LongType()),
        ]
    )
    ts = datetime.datetime(2024, 1, 5, 10, 0, 0)
    rows = [
        (
            b"k1",
            json.dumps({"query_id": "q1", "position": 3}).encode(),
            "events",
            0,
            17,
            ts,
            0,
        ),
        (b"k2", b"not json", "events", 1, 18, ts, 0),
    ]
    raw = spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)
    out = decode_kafka_json(raw, struct)
    assert [f.name for f in out.schema.fields] == [
        "ts",
        "topic",
        "partition",
        "offset",
        "query_id",
        "position",
    ]
    got = {r["offset"]: r for r in out.collect()}
    assert got[17]["query_id"] == "q1" and got[17]["position"] == 3
    assert got[17]["ts"] == int(ts.timestamp() * 1_000_000)
    # malformed payload -> null columns, row retained with its exactly-once
    # key intact (the dead-letter filter downstream decides its fate)
    assert got[18]["query_id"] is None and got[18]["partition"] == 1


def test_exactly_once_dedupe_drops_redelivery(spark, tmp_path):
    """A record redelivered in a later micro-batch (same topic,
    partition, offset) must be emitted exactly once; distinct offsets
    all pass."""
    import json as _json
    import time as _time

    from de4ml_spark.streaming.kafka import exactly_once_dedupe

    src = tmp_path / "k"
    src.mkdir()
    sch = (
        "ts BIGINT, topic STRING, partition INT, offset BIGINT, "
        "query_id STRING"
    )

    def rec(off, qid, ts_s):
        return {
            "ts": int(ts_s * 1_000_000),
            "topic": "events",
            "partition": 0,
            "offset": off,
            "query_id": qid,
        }

    base = 1704067200
    (src / "b1.json").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [rec(1, "a", base), rec(2, "b", base + 1)]
        )
    )
    stream = spark.readStream.schema(sch).json(str(src))
    q = (
        exactly_once_dedupe(stream)
        .writeStream.format("memory")
        .queryName("eo_dedupe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2 redelivers offset 2 and adds offset 3
        (src / f"b2_{_time.time_ns()}.json").write_text(
            "\n".join(
                _json.dumps(r)
                for r in [rec(2, "b", base + 1), rec(3, "c", base + 2)]
            )
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT offset, query_id FROM eo_dedupe").collect()
    finally:
        q.stop()
    assert sorted((r["offset"], r["query_id"]) for r in rows) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]


def test_kafka_plan_construction_jar_gated(spark):
    """Construct the ACTUAL format("kafka") readStream plan when the
    connector jar is on the classpath; skip (with the exact gate message)
    otherwise. The moment the environment ships spark-sql-kafka, this
    test exercises the prod path end-to-end up to the analyzed plan —
    including the connector's fixed wire schema, which decode_kafka_json
    assumes (key/value BINARY + topic/partition/offset/timestamp)."""
    from de4ml_spark.streaming.kafka import kafka_raw_stream

    opts = kafka_source_options("localhost:9092", topic="events")
    try:
        raw = kafka_raw_stream(spark, opts)
    except RuntimeError as e:
        assert "Kafka connector not on the classpath" in str(e)
        pytest.skip("spark-sql-kafka connector jar absent in this env")
    # Jar present: the analyzed schema IS the documented wire schema.
    got = {f.name: f.dataType.simpleString() for f in raw.schema.fields}
    for name, typ in {
        "key": "binary",
        "value": "binary",
        "topic": "string",
        "partition": "int",
        "offset": "bigint",
    }.items():
        assert got[name] == typ
    assert raw.isStreaming
