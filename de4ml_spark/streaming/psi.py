"""Streaming Population-Stability-Index monitor: the running PSI of
the LIVE $50 value-bucket distribution against a fixed reference
bucket histogram, updated per micro-batch via
``applyInPandasWithState`` — the streaming twin of
``queries/mldataq5.py: psi_value_drift`` (reference = the log's first
calendar half there; any frozen training-time histogram here).

Identical math to the batch twin: bucket masses Laplace-smoothed IN
INTEGERS (2c+1 per union bucket, totals 2N+k), each ln term evaluated
on the integer rational and HALF-UP micro-quantized before the exact
integer sum — so the final running value matches the batch PSI over
the same events to the portable-ln's ~2-ulp (pinned in
tests/test_streaming_psi.py).

State: one count per occupied bucket (bounded by the value domain /
bucket width, not traffic). Scale: one monitor key here; per-model or
per-segment monitors shard across executors by the groupBy key.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "monitor STRING, n_events BIGINT, n_buckets INT, psi DOUBLE"
)
STATE_SCHEMA = "buckets ARRAY<BIGINT>, counts ARRAY<BIGINT>"

BUCKET_CENTS = 5_000


def exact_psi(reference: dict[int, int], live: dict[int, int]) -> float:
    """The batch twin's smoothed PSI on two integer bucket histograms:
    micro-quantized ln terms, integer sum, one double normalization.
    (math.log on an integer ratio is correctly rounded to ~1 ulp —
    within the portable-ln's own 2-ulp band, so quantized terms can
    differ from the batch entry by at most 1 micro-unit each.)"""
    union = sorted(set(reference) | set(live))
    k = len(union)
    a_tot = 2 * sum(reference.values()) + k
    b_tot = 2 * sum(live.values()) + k
    num = 0
    for b in union:
        p_num = (2 * reference.get(b, 0) + 1) * b_tot
        q_num = (2 * live.get(b, 0) + 1) * a_tot
        ln_u = math.floor(
            abs(math.log(max(p_num, q_num) / min(p_num, q_num)))
            * 1_000_000.0
            + 0.5
        )
        num += abs(p_num - q_num) * ln_u
    return num / (a_tot * b_tot * 1_000_000.0)


def _psi_fn(reference: dict[int, int]):
    ref = {int(k): int(v) for k, v in reference.items()}

    def fn(
        key: tuple[str],
        pdfs: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        counts: dict[int, int] = {}
        if state.exists:
            bks, vals = state.get
            counts = {
                int(b): int(v)
                for b, v in zip(list(bks or []), list(vals or []))
            }
        for pdf in pdfs:
            for b, n in pdf["__bucket"].value_counts().items():
                counts[int(b)] = counts.get(int(b), 0) + int(n)
        state.update(
            (list(counts), [counts[b] for b in counts])
        )
        yield pd.DataFrame(
            {
                "monitor": [key[0]],
                "n_events": [sum(counts.values())],
                "n_buckets": [len(set(counts) | set(ref))],
                "psi": [exact_psi(ref, counts)],
            }
        )

    return fn


def streaming_psi_monitor(
    events: DataFrame,
    reference: dict[int, int],
    value_col: str = "value",
) -> DataFrame:
    """events: streaming DF with a numeric ``value_col``. Returns the
    running (monitor, n_events, n_buckets, psi) update stream — one
    row per batch."""
    keyed = events.filter(F.col(value_col).isNotNull()).select(
        F.lit("psi").alias("monitor"),
        F.expr(
            f"CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
            f" DIV {BUCKET_CENTS}"
        ).alias("__bucket"),
    )
    return keyed.groupBy("monitor").applyInPandasWithState(
        _psi_fn(reference),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
