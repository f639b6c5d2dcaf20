"""Streaming pattern-match automaton: cross-batch state correctness —
final running counts must equal the BATCH regex query on the same events,
including conversions whose 'v' and 'p' arrive in different micro-batches."""

from __future__ import annotations

import json
import time

import pytest

from pyspark.sql import functions as F

from de4ml_spark.streaming.patterns import streaming_pattern_counts

SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"

TYPES = {"v": "view", "c": "click", "p": "purchase", "e": "error", "s": "signup"}


def _rows(user_id: int, syms: str, start_id: int):
    base = 1704067200.0
    out = []
    for i, s in enumerate(syms):
        t = time.strftime(
            "%Y-%m-%d %H:%M:%S", time.gmtime(base + start_id + i)
        )
        out.append(
            {
                "event_id": start_id + i,
                "ts": t,
                "user_id": user_id,
                "event_type": TYPES[s],
            }
        )
    return out


def _write(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    (path / f"b_{time.time_ns()}.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )


def _run_cross_batch(spark, tmp_path, op, queryname):
    src = tmp_path / "ev"
    # batch 1: u1 "vc" (open, no conversion yet), u2 "vp" (1 conversion)
    _write(src, _rows(1, "vc", 0) + _rows(2, "vp", 100))
    stream = (
        spark.readStream.schema(SCHEMA).json(str(src))
    )
    out = op(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(queryname)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: u1 "p" completes the cross-batch conversion, then "vvp"
        # (restart semantics: still exactly one more), u2 "p" alone (no
        # open v -> no conversion)
        _write(src, _rows(1, "pvvp", 10) + _rows(2, "p", 110))
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {queryname}").collect()
    finally:
        q.stop()
    return src, rows


@pytest.mark.slow
def test_streaming_pattern_counts_cross_batch(spark, tmp_path):
    src, rows = _run_cross_batch(
        spark, tmp_path, streaming_pattern_counts, "pattern_counts"
    )
    # latest update per user
    latest: dict[int, tuple[int, int]] = {}
    for r in rows:
        cur = latest.get(r["user_id"])
        if cur is None or r["n_events"] >= cur[0]:
            latest[r["user_id"]] = (r["n_events"], r["n_conversions"])
    assert latest[1] == (6, 2)  # vc|pvvp -> v..p and v v p
    assert latest[2] == (3, 1)  # vp|p -> the lone p never converts

    # cross-check against the batch regex twin on the SAME events
    all_rows = [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"])
        for r in spark.read.schema(SCHEMA).json(str(src)).collect()
    ]
    ev = spark.createDataFrame(all_rows, SCHEMA)
    sym = F.substring("event_type", 1, 1)
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("ts"), F.col("event_id"), sym.alias("s")))
            ),
            lambda r: r["s"],
        ),
        "",
    )
    batch = {
        r["user_id"]: (r["n"], r["c"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.regexp_count(seq, F.lit("v[^vp]*p")).alias("c"),
        )
        .collect()
    }
    assert {u: v for u, v in latest.items()} == batch


def _has_protobuf() -> bool:
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def test_streaming_pattern_counts_tws_plan(spark, tmp_path):
    """The transformWithStateInPandas variant wires up (plan construction +
    output schema) regardless of environment: the StatefulProcessor is
    serialized into the plan without starting the state-server protocol."""
    from de4ml_spark.streaming.patterns import streaming_pattern_counts_tws

    src = tmp_path / "ev"
    _write(src, _rows(1, "vp", 0))
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = streaming_pattern_counts_tws(stream)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "n_events",
        "n_conversions",
    ]


@pytest.mark.slow
@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python state-server protocol requires the "
    "protobuf package, which this environment does not ship",
)
def test_streaming_pattern_counts_tws_cross_batch(spark, tmp_path):
    """The transformWithStateInPandas variant carries identical automaton
    state across micro-batches (Spark 4 stateful API; needs the RocksDB
    state store provider)."""
    from de4ml_spark.streaming.patterns import streaming_pattern_counts_tws

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        _, rows = _run_cross_batch(
            spark, tmp_path, streaming_pattern_counts_tws, "pattern_counts_tws"
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    latest: dict[int, tuple[int, int]] = {}
    for r in rows:
        cur = latest.get(r["user_id"])
        if cur is None or r["n_events"] >= cur[0]:
            latest[r["user_id"]] = (r["n_events"], r["n_conversions"])
    assert latest[1] == (6, 2)
    assert latest[2] == (3, 1)
