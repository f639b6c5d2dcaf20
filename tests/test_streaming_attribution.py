"""Streaming attribution twin: per-touch-type credit totals from the
stream must be BIT-EQUAL to the batch attribution_credit_events
aggregate over the same events — including purchases whose touches
arrived in an earlier micro-batch — and out-of-order regressions must
be dropped and counted, never folded into the window state."""

from __future__ import annotations

import json
import time

import pytest

from de4ml_spark.streaming.attribution import streaming_attribution

SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"

SF = "/root/testdata/sf0.001"


def _write(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    (path / f"b_{time.time_ns()}.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )


def _stream_totals(spark, tmp_path, batches, name):
    src = tmp_path / "ev"
    _write(src, batches[0])
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        streaming_attribution(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        for b in batches[1:]:
            _write(src, b)
            q.processAllAvailable()
        return spark.sql(
            f"SELECT touch_type, SUM(linear_ppm) AS lin,"
            f" SUM(first_ppm) AS fi, SUM(last_ppm) AS la,"
            f" MAX(n_dropped) AS nd FROM {name} GROUP BY 1"
        ).collect()
    finally:
        q.stop()


@pytest.mark.slow
def test_stream_totals_equal_batch_entry(spark, tmp_path):
    from de4ml_spark.queries.statq import attribution_credit_events
    from de4ml_spark.session import load_table

    ev = (
        load_table(spark, SF, "events")
        .selectExpr(
            "event_id",
            "date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts",
            "user_id",
            "event_type",
        )
        .collect()
    )
    rows = [
        {
            "event_id": r["event_id"],
            "ts": r["ts"],
            "user_id": r["user_id"],
            "event_type": r["event_type"],
        }
        for r in ev
        if r["user_id"] is not None
    ]
    # split by time so touch windows straddle the micro-batch boundary
    rows.sort(key=lambda r: (r["ts"], r["event_id"]))
    mid = len(rows) // 2
    got = {
        r["touch_type"]: r
        for r in _stream_totals(
            spark, tmp_path, [rows[:mid], rows[mid:]], "attr_sf"
        )
    }
    want = {
        r["touch_type"]: r
        for r in attribution_credit_events(spark, SF).collect()
    }
    assert set(got) == set(want)
    for tt, w in want.items():
        assert got[tt]["lin"] == w["linear_credit_ppm"], tt
        assert got[tt]["fi"] == w["first_credit_ppm"], tt
        assert got[tt]["la"] == w["last_credit_ppm"], tt
        assert got[tt]["nd"] == 0


@pytest.mark.slow
def test_out_of_order_regression_dropped(spark, tmp_path):
    base = "2024-01-0{d} 00:00:0{s}"
    rows1 = [
        {"event_id": 1, "ts": base.format(d=2, s=0), "user_id": 7,
         "event_type": "view"},
        {"event_id": 2, "ts": base.format(d=2, s=5), "user_id": 7,
         "event_type": "purchase"},
    ]
    # regressor: a click BEFORE the high-water mark must be dropped,
    # so the second purchase still sees only the original view
    rows2 = [
        {"event_id": 3, "ts": base.format(d=1, s=0), "user_id": 7,
         "event_type": "click"},
        {"event_id": 4, "ts": base.format(d=2, s=9), "user_id": 7,
         "event_type": "purchase"},
    ]
    got = _stream_totals(spark, tmp_path, [rows1, rows2], "attr_ooo")
    by_type = {r["touch_type"]: r for r in got}
    assert set(by_type) == {"view"}
    assert by_type["view"]["lin"] == 2_000_000  # both purchases, 1 touch
    assert by_type["view"]["nd"] == 1


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def test_streaming_attribution_tws_plan(spark, tmp_path):
    """The transformWithStateInPandas variant wires up (plan + schema)
    regardless of environment."""
    from de4ml_spark.streaming.attribution import streaming_attribution_tws

    src = tmp_path / "ev"
    _write(
        src,
        [
            {"event_id": 1, "ts": "2024-01-02 00:00:00", "user_id": 7,
             "event_type": "view"},
        ],
    )
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = streaming_attribution_tws(stream)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "purchase_id",
        "touch_type",
        "n_touch",
        "linear_ppm",
        "first_ppm",
        "last_ppm",
        "n_dropped",
    ]


@pytest.mark.slow
@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python state-server protocol requires the "
    "protobuf package, which this environment does not ship",
)
def test_streaming_attribution_tws_matches_apiws(spark, tmp_path):
    """Both stateful surfaces fold through the shared _fold_batch, so
    their emitted credit rows must be identical on the same batches."""
    from de4ml_spark.streaming.attribution import streaming_attribution_tws

    rows1 = [
        {"event_id": 1, "ts": "2024-01-02 00:00:00", "user_id": 7,
         "event_type": "view"},
        {"event_id": 2, "ts": "2024-01-02 01:00:00", "user_id": 7,
         "event_type": "click"},
    ]
    rows2 = [
        {"event_id": 3, "ts": "2024-01-03 00:00:00", "user_id": 7,
         "event_type": "purchase"},
    ]
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "tws"
        _write(src, rows1)
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = (
            streaming_attribution_tws(stream)
            .writeStream.format("memory")
            .queryName("attr_tws")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .start()
        )
        try:
            q.processAllAvailable()
            _write(src, rows2)
            q.processAllAvailable()
            got = spark.sql(
                "SELECT touch_type, n_touch, linear_ppm, first_ppm,"
                " last_ppm FROM attr_tws ORDER BY touch_type"
            ).collect()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    want = _stream_totals(spark, tmp_path, [rows1, rows2], "attr_ap")
    want_by = {r["touch_type"]: r for r in want}
    got_by = {r["touch_type"]: r for r in got}
    assert set(got_by) == set(want_by) == {"click", "view"}
    for tt in got_by:
        assert got_by[tt]["linear_ppm"] == want_by[tt]["lin"]
        assert got_by[tt]["first_ppm"] == want_by[tt]["fi"]
        assert got_by[tt]["last_ppm"] == want_by[tt]["la"]
