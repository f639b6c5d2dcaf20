"""Streaming Youden/MCC threshold-drift monitor: the operating point
emitted after every micro-batch must equal the exact batch selection
over the same prefix (integer identity — no tolerance), and the shared
math must reproduce BOTH batch catalog entries' rows at sf0.001."""

from __future__ import annotations

import json
import time

import pytest

from de4ml_spark.streaming.thresholddrift import (
    exact_operating_point,
    j_num_at,
    streaming_threshold_monitor,
)

SCHEMA = "event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE"

REF_THRESHOLD_CENTS = 2000


def _rows(a_hist: dict[int, int], b_hist: dict[int, int], start: int):
    base = 1704067200.0
    out, i = [], start
    for et, hist in (("click", a_hist), ("purchase", b_hist)):
        for v_c, n in hist.items():
            for _ in range(n):
                t = time.strftime(
                    "%Y-%m-%d %H:%M:%S", time.gmtime(base + i)
                )
                out.append(
                    {
                        "event_id": i,
                        "ts": t,
                        "event_type": et,
                        "value": v_c / 100.0,
                    }
                )
                i += 1
    # noise rows the monitor must ignore (other type / null value)
    out.append(
        {"event_id": i, "ts": t, "event_type": "view", "value": 9.99}
    )
    out.append(
        {"event_id": i + 1, "ts": t, "event_type": "click", "value": None}
    )
    return out


def _write(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    (path / f"b_{time.time_ns()}.json").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )


def _merge(*hists):
    out: dict[int, int] = {}
    for h in hists:
        for v, n in h.items():
            out[v] = out.get(v, 0) + n
    return out


@pytest.mark.slow
def test_streaming_threshold_matches_batch_math(spark, tmp_path):
    src = tmp_path / "ev"
    # batch 1: clicks low, purchases high — optimum separates cleanly
    a1, b1 = {1000: 12, 2000: 8}, {3000: 9, 4000: 11}
    # batch 2: drift — purchase mass collapses BELOW the click range,
    # so the optimum moves off the deployed (reference) threshold
    a2, b2 = {2500: 5}, {500: 30}
    _write(src, _rows(a1, b1, 0))
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = streaming_threshold_monitor(stream, REF_THRESHOLD_CENTS)
    q = (
        out.writeStream.format("memory")
        .queryName("op_monitor")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(src, _rows(a2, b2, 1000))
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM op_monitor").collect()
    finally:
        q.stop()

    by_n = {(r["n_a"], r["n_b"]): r for r in rows}
    for hist_a, hist_b in ((a1, b1), (_merge(a1, a2), _merge(b1, b2))):
        op = exact_operating_point(hist_a, hist_b)
        r = by_n[(op["n_a"], op["n_b"])]
        for k in (
            "threshold_cents", "j_num", "tp", "fp", "tn", "fn"
        ):
            assert r[k] == op[k], (k, dict(r.asDict()), op)
        assert r["youden_j"] == op["youden_j"]
        assert r["mcc"] == op["mcc"]
        j_ref = j_num_at(hist_a, hist_b, REF_THRESHOLD_CENTS)
        assert r["j_at_ref_num"] == j_ref
        assert r["j_drift"] == (op["j_num"] - j_ref) / float(
            op["n_a"] * op["n_b"]
        )
    # prefix 1: reference threshold IS optimal (drift 0); prefix 2: decayed
    first = by_n[(sum(a1.values()), sum(b1.values()))]
    merged = by_n[
        (sum(_merge(a1, a2).values()), sum(_merge(b1, b2).values()))
    ]
    assert first["j_drift"] == 0.0
    assert merged["j_drift"] > 0.0


def test_exact_operating_point_agrees_with_batch_entries(spark):
    """The shared selection math, fed the batch entries' own
    click/purchase histograms at sf0.001, reproduces BOTH catalog rows
    exactly (youden_threshold_value and mcc_threshold_value)."""
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        """SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT),
               event_type
        FROM '/root/testdata/sf0.001/events.parquet'
        WHERE value IS NOT NULL
          AND event_type IN ('click', 'purchase')"""
    ).fetchall()
    click: dict[int, int] = {}
    purchase: dict[int, int] = {}
    for v_c, et in rows:
        d = click if et == "click" else purchase
        d[v_c] = d.get(v_c, 0) + 1
    op = exact_operating_point(click, purchase)

    from de4ml_spark.queries.statq5 import (
        mcc_threshold_value,
        youden_threshold_value,
    )

    yrow = youden_threshold_value(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert yrow["threshold_cents"] == op["threshold_cents"]
    assert yrow["n_a"] == op["n_a"] and yrow["n_b"] == op["n_b"]
    assert yrow["tp"] == op["tp"] and yrow["fp"] == op["fp"]
    assert yrow["youden_j"] == op["youden_j"]

    mrow = mcc_threshold_value(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert mrow["threshold_cents"] == op["threshold_cents"]
    assert (mrow["tp"], mrow["fp"], mrow["tn"], mrow["fn"]) == (
        op["tp"], op["fp"], op["tn"], op["fn"]
    )
    assert mrow["mcc"] == op["mcc"]


def test_degenerate_single_class():
    op = exact_operating_point({1000: 5}, {})
    assert op["threshold_cents"] == -1
    assert op["youden_j"] == 0.0 and op["mcc"] == 0.0
    assert j_num_at({1000: 5}, {}, 2000) == 0
