"""Streaming Kolmogorov-Smirnov drift monitor: the running two-sample
KS statistic of the LIVE value distribution against a frozen
reference histogram, updated per micro-batch via
``applyInPandasWithState`` — the streaming twin of
``queries/statq3.py: ks_two_sample_value`` (there the two samples are
click vs purchase; here reference vs live).

Identical math to the batch twin and EXACT at every emission: the KS
numerator max_v |cumRef·n_live − cumLive·n_ref| is an integer
identity on the merged cents histogram, so there is no quantization
band at all — the running value equals the batch statistic over the
same prefix bit-for-bit (pinned in tests/test_streaming_ksdrift.py).

State: one count per occupied cents value (bounded by the value
domain, not traffic — the same histogram-first bound every rank
statistic in the catalog rides). One monitor key here; per-segment
monitors shard across executors by the groupBy key.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "monitor STRING, n_live BIGINT, n_ref BIGINT, d_num BIGINT,"
    " ks_d DOUBLE"
)
STATE_SCHEMA = "vals ARRAY<BIGINT>, counts ARRAY<BIGINT>"


def exact_ks(reference: dict[int, int], live: dict[int, int]) -> tuple:
    """The batch twin's exact KS numerator on two integer cents
    histograms: (d_num, n_ref, n_live), with
    D = d_num / (n_ref · n_live)."""
    n_ref = sum(reference.values())
    n_live = sum(live.values())
    if n_ref == 0 or n_live == 0:
        return 0, n_ref, n_live
    cum_r = cum_l = 0
    d_num = 0
    for v in sorted(set(reference) | set(live)):
        cum_r += reference.get(v, 0)
        cum_l += live.get(v, 0)
        d_num = max(d_num, abs(cum_r * n_live - cum_l * n_ref))
    return d_num, n_ref, n_live


def _ks_fn(reference: dict[int, int]):
    ref = {int(k): int(v) for k, v in reference.items()}

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
            for v, n in pdf["__v_c"].value_counts().items():
                counts[int(v)] = counts.get(int(v), 0) + int(n)
        state.update(
            (list(counts), [counts[v] for v in counts])
        )
        d_num, n_ref, n_live = exact_ks(ref, counts)
        yield pd.DataFrame(
            {
                "monitor": [key[0]],
                "n_live": [n_live],
                "n_ref": [n_ref],
                "d_num": [d_num],
                "ks_d": [
                    d_num / (n_ref * n_live)
                    if n_ref and n_live
                    else 0.0
                ],
            }
        )

    return fn


def streaming_ks_monitor(
    events: DataFrame,
    reference: dict[int, int],
    value_col: str = "value",
) -> DataFrame:
    """events: streaming DF with a numeric ``value_col``. Returns the
    running (monitor, n_live, n_ref, d_num, ks_d) update stream — one
    row per batch."""
    keyed = events.filter(F.col(value_col).isNotNull()).select(
        F.lit("ks").alias("monitor"),
        F.expr(
            f"CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("__v_c"),
    )
    return keyed.groupBy("monitor").applyInPandasWithState(
        _ks_fn(reference),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
