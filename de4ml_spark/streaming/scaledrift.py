"""Streaming robust-scale drift monitor: the running Rousseeuw-Croux
Qn of the LIVE value distribution, updated per micro-batch via
``applyInPandasWithState`` — the streaming twin of
``queries/statq6.py: qn_scale_value`` (heavy-tail-safe scale, the
companion alarm to the location-drift monitors ksdrift/psi/cusum).

Identical math to the batch twin and EXACT at every emission: Qn is
the k-th order statistic (k = C(h,2), h = n/2+1) of pairwise cents
distances, selected on the value histogram by an integer cumulative
threshold — no quantization band; the running value equals the batch
statistic over the same prefix bit-for-bit (pinned in
tests/test_streaming_scaledrift.py). A frozen reference Qn (training
scale) rides along so ``scale_ratio`` = live/reference is the alarm
trigger for variance blow-ups that a mean monitor misses.

State: one count per occupied cents value — the same value-domain
bound every histogram monitor in streaming/ rides. The per-emission
selection is O(|support|²) pair CELLS (a few hundred thousand integer
ops), not row pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "monitor STRING, n_live BIGINT, k_pairs BIGINT,"
    " qn_raw_cents BIGINT, qn_scale DOUBLE, ref_qn_raw_cents BIGINT,"
    " scale_ratio DOUBLE"
)
STATE_SCHEMA = "vals ARRAY<BIGINT>, counts ARRAY<BIGINT>"

QN_CONST = 2.21914  # asymptotic Gaussian consistency (batch twin's)


def exact_qn(hist: dict[int, int]) -> tuple[int, int, int]:
    """The batch twin's exact selection on an integer cents histogram:
    (n, k_pairs, qn_raw_cents). Degenerate prefixes follow the batch
    entry's convention exactly (ADVICE r12): n == 1 has k_pairs == 0,
    and the batch cum >= k filter matches the first histogram row at
    distance 0, so qn_raw is 0 — NOT a sentinel. qn_raw is -1 only for
    n == 0 (no data, a state the batch entry never materializes a row
    for), keeping the bit-for-bit prefix claim valid for every n >= 1."""
    n = sum(hist.values())
    h = n // 2 + 1
    k = h * (h - 1) // 2
    if n == 0:
        return n, k, -1
    if k == 0:
        return n, k, 0
    byd: dict[int, int] = {}
    for v, c in hist.items():
        if c > 1:
            byd[0] = byd.get(0, 0) + c * (c - 1) // 2
    hs = sorted(hist)
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            d = hs[j] - hs[i]
            byd[d] = byd.get(d, 0) + hist[hs[i]] * hist[hs[j]]
    cum = 0
    for d in sorted(byd):
        cum += byd[d]
        if cum >= k:
            return n, k, d
    return n, k, -1  # unreachable: total pairs C(n,2) >= k


def _qn_fn(ref_qn_raw_cents: int):
    ref = int(ref_qn_raw_cents)

    def fn(
        key: tuple[str],
        pdfs: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        counts: dict[int, int] = {}
        if state.exists:
            vals, cnts = state.get
            counts = {
                int(v): int(c)
                for v, c in zip(list(vals or []), list(cnts or []))
            }
        for pdf in pdfs:
            for v, c in pdf["__v_c"].value_counts().items():
                counts[int(v)] = counts.get(int(v), 0) + int(c)
        state.update(
            (list(counts), [counts[v] for v in counts])
        )
        n, k, qn_raw = exact_qn(counts)
        yield pd.DataFrame(
            {
                "monitor": [key[0]],
                "n_live": [n],
                "k_pairs": [k],
                "qn_raw_cents": [qn_raw],
                "qn_scale": [
                    QN_CONST * (qn_raw / 100.0) if qn_raw >= 0 else 0.0
                ],
                "ref_qn_raw_cents": [ref],
                "scale_ratio": [
                    qn_raw / ref if qn_raw >= 0 and ref > 0 else 0.0
                ],
            }
        )

    return fn


def streaming_qn_monitor(
    events: DataFrame,
    ref_qn_raw_cents: int,
    value_col: str = "value",
) -> DataFrame:
    """events: streaming DF with a numeric ``value_col``. Returns the
    running robust-scale update stream — one row per batch."""
    keyed = events.filter(F.col(value_col).isNotNull()).select(
        F.lit("qn").alias("monitor"),
        F.expr(
            f"CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("__v_c"),
    )
    return keyed.groupBy("monitor").applyInPandasWithState(
        _qn_fn(ref_qn_raw_cents),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
