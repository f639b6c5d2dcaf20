"""Streaming CUSUM spend-shift alarms: the LIVE one-sided upper CUSUM
of per-user daily spend via ``applyInPandasWithState`` — the
streaming twin of ``queries/sketchq.py: cusum_alarm_value`` (same
allowance K / threshold H, same integer-cents recurrence
s_i = max(0, s_{i-1} + (x_i − K)), evaluated by the same prefix-scan
closed form s_i = P_i − min(0, min_{j≤i} P_j)).

Out-of-order tolerant BY CONSTRUCTION: state holds the per-user map
day → accumulated cents (bounded by the retention window, not
traffic), and every micro-batch re-runs the exact scan over the
merged day map — so the final alarm set equals the batch entry's
over the same events REGARDLESS of arrival order (pinned in
tests/test_streaming_cusum.py).

Scale: state is one (user × active-day) count map, sharded across
executors by the user_id groupBy key; the per-key scan is
days-bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id BIGINT, day STRING, dc BIGINT, cusum_c BIGINT"
)
STATE_SCHEMA = "days ARRAY<STRING>, cents ARRAY<BIGINT>"

CUSUM_K = 5_000  # allowance, cents/day — same as the batch twin
CUSUM_H = 20_000  # alarm threshold, cents


def exact_cusum_scan(
    daymap: dict[str, int], k: int = CUSUM_K
) -> dict[str, int]:
    """The batch twin's scan on one user's day → cents map: returns
    day → cusum value (cents) for every day, in integer arithmetic."""
    out = {}
    p = 0
    m = 0
    for day in sorted(daymap):
        p += daymap[day] - k
        m = min(m, p, 0)
        out[day] = p - m
    return out


def _cusum_fn(k: int, h: int):
    def fn(
        key: tuple[int],
        pdfs: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        daymap: dict[str, int] = {}
        if state.exists:
            days, cents = state.get
            daymap = {
                str(d): int(c)
                for d, c in zip(list(days or []), list(cents or []))
            }
        for pdf in pdfs:
            for d, c in (
                pdf.groupby("__day")["__cents"].sum().items()
            ):
                daymap[str(d)] = daymap.get(str(d), 0) + int(c)
        state.update(
            (list(daymap), [daymap[d] for d in daymap])
        )
        scan = exact_cusum_scan(daymap, k)
        alarms = [
            (key[0], d, daymap[d], s)
            for d, s in scan.items()
            if s > h
        ]
        yield pd.DataFrame(
            alarms, columns=["user_id", "day", "dc", "cusum_c"]
        )

    return fn


def streaming_cusum_alarms(
    events: DataFrame,
    k: int = CUSUM_K,
    h: int = CUSUM_H,
    value_col: str = "value",
) -> DataFrame:
    """events: streaming DF with user_id, ts, ``value_col``. Returns
    the running alarm stream (user_id, day, dc, cusum_c) — the full
    current alarm set per updated user each batch."""
    keyed = (
        events.filter(F.col(value_col).isNotNull())
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.expr("CAST(CAST(ts AS DATE) AS STRING)").alias("__day"),
            F.expr(
                f"CAST(CAST({value_col} AS DECIMAL(18,2)) * 100"
                " AS BIGINT)"
            ).alias("__cents"),
        )
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _cusum_fn(k, h),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
