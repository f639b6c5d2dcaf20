"""Kafka source configuration for the streaming tier (S8's prod path).

The reference names Kafka as the production change-stream transport
(join-service/README.md:66-68); this sandbox has no broker and no
spark-sql-kafka connector jar, so what ships here is the part that can
be checked in and contract-tested WITHOUT a broker:

- ``kafka_source_options``: the validated option map for
  ``readStream.format("kafka")`` — one place that encodes the choices
  that matter at scale (explicit starting offsets, bounded
  ``maxOffsetsPerTrigger`` so a backlogged topic cannot produce an
  unbounded first micro-batch, ``failOnDataLoss`` for replayed
  retention-expired offsets, ``minPartitions`` to fan a hot topic out
  past its Kafka partition count).
- ``KAFKA_WIRE_SCHEMA``: the fixed schema every Kafka batch/stream frame
  carries (the connector's contract), so decoding logic is testable on
  plain DataFrames.
- ``decode_kafka_json``: wire frame -> typed rows against a contract
  struct — identical logic for the real stream and the tests.
- ``kafka_raw_stream``: the one-liner that needs the connector jar; it
  raises a clear error naming the required ``--packages`` coordinate
  when the data source is absent.

The downstream pipeline (parse -> validate -> flatten -> sink) is
format-agnostic: everything in sinks.py/stateful.py consumes the typed
frame, so swapping the file source for Kafka is exactly
``decode_kafka_json(kafka_raw_stream(...), struct)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the Spark-Kafka connector's fixed output schema (its public contract)
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)

KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13"


def kafka_source_options(
    bootstrap_servers: str,
    topic: str | None = None,
    topic_pattern: str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 1_000_000,
    fail_on_data_loss: bool = False,
    min_partitions: int | None = None,
) -> dict[str, str]:
    """Validated option map for ``readStream.format("kafka")``.

    Exactly one of ``topic`` (subscribe) / ``topic_pattern``
    (subscribePattern) must be given. ``max_offsets_per_trigger``
    defaults to 1M: an unbounded first batch on a backlogged topic is
    the classic way a streaming job OOMs on day one — None disables the
    cap explicitly. ``starting_offsets`` defaults to ``earliest`` for
    replayable pipelines (checkpoint state overrides it after the first
    run, so this only decides the initial backfill)."""
    if (topic is None) == (topic_pattern is None):
        raise ValueError("exactly one of topic / topic_pattern required")
    if starting_offsets not in ("earliest", "latest") and not (
        starting_offsets.startswith("{")
    ):
        raise ValueError(
            "starting_offsets must be 'earliest', 'latest', or a JSON "
            "per-partition offset map"
        )
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if topic is not None:
        opts["subscribe"] = topic
    else:
        opts["subscribePattern"] = topic_pattern
    if max_offsets_per_trigger is not None:
        if max_offsets_per_trigger <= 0:
            raise ValueError("max_offsets_per_trigger must be positive")
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        if min_partitions <= 0:
            raise ValueError("min_partitions must be positive")
        opts["minPartitions"] = str(min_partitions)
    return opts


def decode_kafka_json(raw: DataFrame, struct: T.StructType) -> DataFrame:
    """Wire frame (KAFKA_WIRE_SCHEMA) -> typed rows: the JSON payload in
    ``value`` parsed against ``struct``, plus the ingest metadata the
    downstream pipeline uses — ``ts`` (broker append time in micros,
    matching the HTTP ingest path's server-assigned timestamp, S2) and
    the (topic, partition, offset) triple, which is the exactly-once
    dedup key for idempotent sinks. Works identically on a streaming or
    a batch frame, which is what makes it testable without a broker."""
    return raw.select(
        F.unix_micros(F.col("timestamp")).alias("ts"),
        "topic",
        "partition",
        "offset",
        F.from_json(F.col("value").cast("string"), struct).alias("d"),
    ).select("ts", "topic", "partition", "offset", "d.*")


def exactly_once_dedupe(
    decoded: DataFrame,
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """At-least-once -> exactly-once: drop redelivered records by their
    (topic, partition, offset) identity — the key ``decode_kafka_json``
    carries precisely for this. Kafka redelivers on consumer restart /
    rebalance inside the retention window; ``dropDuplicates`` with a
    watermark holds seen keys only ``delay`` past the event-time
    high-water mark, so state is bounded by redelivery distance, not
    topic history. ``ts_col`` is the broker-append micros column from
    the decode (converted to timestamp for the watermark). Uses
    ``dropDuplicatesWithinWatermark``: plain ``dropDuplicates`` on a
    subset that omits the event-time column NEVER evicts its state (one
    entry per record forever — the state store dies on a busy topic);
    the within-watermark variant expires each seen key once the
    watermark passes it, which is exactly the bounded-by-redelivery-
    distance contract."""
    from pyspark.sql import functions as F

    return (
        decoded.withColumn(
            "__evt", F.timestamp_micros(F.col(ts_col).cast("bigint"))
        )
        .withWatermark("__evt", delay)
        .dropDuplicatesWithinWatermark(["topic", "partition", "offset"])
        .drop("__evt")
    )


def kafka_raw_stream(spark, options: dict[str, str]) -> DataFrame:
    """``readStream.format("kafka")`` with the validated option map.
    Needs the connector jar; without it Spark raises DATA_SOURCE_NOT_FOUND
    at load(), which is re-raised here naming the package coordinate."""
    try:
        return spark.readStream.format("kafka").options(**options).load()
    except Exception as e:  # noqa: BLE001
        if "kafka" in str(e).lower() and "source" in str(e).lower():
            raise RuntimeError(
                f"Kafka connector not on the classpath; submit with "
                f"--packages {KAFKA_PACKAGE}:<spark-version>"
            ) from e
        raise
