"""Streaming distribution-drift monitor: running total-variation distance
of a categorical column against a fixed baseline distribution, updated per
micro-batch via ``applyInPandasWithState``.

Batch twin: ``queries/mldataq2.py: categorical_drift_tvd`` (two fixed
windows). The streaming form answers the monitoring question — "how far
has the LIVE category mix moved from the reference?" — emitting one
running-TVD row per batch, exactly the PromQL-style data-quality signal
the reference's dataops loop exposes as counters
(dataops/app/profile.py:61-75), upgraded from threshold counts to a
full-shape distance.

State: one count per category (bounded by the category vocabulary, not
traffic). TVD is computed in exact integer arithmetic against the integer
baseline counts — identical math to the batch twin, so the final running
value equals the batch TVD over the same events (pinned in
tests/test_streaming_drift.py).

Scale: the monitor key partitions by a monitor id (here one global
monitor; per-source or per-model monitors shard naturally across
executors by the groupBy key).
"""

from __future__ import annotations

from collections.abc import Iterator
from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "monitor STRING, n_events BIGINT, n_categories INT, tvd DOUBLE"
)
STATE_SCHEMA = "cats ARRAY<STRING>, counts ARRAY<BIGINT>"


def _drift_fn(baseline: dict[str, int]):
    base_total = sum(baseline.values())

    def fn(
        key: tuple[str], pdfs: Iterator["pd.DataFrame"], state: GroupState  # noqa: F821
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        counts: dict[str, int] = {}
        if state.exists:
            cats, vals = state.get
            counts = dict(zip(list(cats or []), [int(v) for v in (vals or [])]))
        for pdf in pdfs:
            for cat, n in pdf["event_type"].value_counts().items():
                counts[cat] = counts.get(cat, 0) + int(n)
        state.update((list(counts), [counts[c] for c in counts]))
        live_total = sum(counts.values())
        # exact rational TVD vs the baseline, then one double conversion
        cats_all = set(counts) | set(baseline)
        tvd = Fraction(0)
        for c in cats_all:
            p = Fraction(counts.get(c, 0), live_total) if live_total else Fraction(0)
            q = (
                Fraction(baseline.get(c, 0), base_total)
                if base_total
                else Fraction(0)
            )
            tvd += abs(p - q)
        yield pd.DataFrame(
            {
                "monitor": [key[0]],
                "n_events": [live_total],
                "n_categories": [len(counts)],
                "tvd": [float(tvd / 2)],
            }
        )

    return fn


def streaming_drift_monitor(
    events: DataFrame, baseline: dict[str, int], category_col: str = "event_type"
) -> DataFrame:
    """events: streaming DF with ``category_col``. Returns the running
    (monitor, n_events, n_categories, tvd) update stream — one row per
    batch."""
    keyed = events.select(
        F.lit("drift").alias("monitor"), F.col(category_col).alias("event_type")
    )
    return keyed.groupBy("monitor").applyInPandasWithState(
        _drift_fn(baseline),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming CUSUM: per-user changepoint alarm on daily spend, the
# streaming twin of queries/sketchq.py:cusum_alarm_value. State is ONE
# (current_day, day_total, cusum) triple per user — O(1), never a
# buffer; a day rollover folds the finished day into the recurrence
# s = max(0, s + (day_total - K)) and emits an alarm row when s crosses
# H. Contract: event-time-ordered arrival per key across batches (the
# replay ordering; the batch twin is the arbiter for unordered
# history), matching streaming_throttle.
# --------------------------------------------------------------------------

CUSUM_OUTPUT_SCHEMA = "user_id BIGINT, day_num BIGINT, cusum_c BIGINT"
CUSUM_STATE_SCHEMA = "day BIGINT, total BIGINT, s BIGINT"

US_PER_DAY = 86_400_000_000


def streaming_cusum(
    events: DataFrame, k_cents: int = 5_000, h_cents: int = 20_000
) -> DataFrame:
    """Alarm rows (user, day, cusum) for COMPLETED days whose folded
    CUSUM exceeds ``h_cents``. A day is folded when a later day's first
    event arrives for that user."""

    src = events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__t"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("__vc"),
    ).withColumn("__day", (F.col("__t") / US_PER_DAY).cast("bigint"))

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        day, total, s = state.get if state.exists else (None, 0, 0)
        out_days, out_s = [], []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["__day", "__t"])
        for d, vc in zip(
            batch["__day"].to_numpy(), batch["__vc"].to_numpy()
        ):
            if day is not None and d < day:
                # Ordered-arrival contract violation (a day already folded
                # would reopen): drop the regressor instead of corrupting
                # the recurrence — the batch twin is the arbiter for
                # unordered history.
                continue
            if day is not None and d != day:
                s = max(0, s + (int(total) - k_cents))
                if s > h_cents:
                    out_days.append(int(day))
                    out_s.append(int(s))
                total = 0
            day = int(d)
            total = int(total) + int(vc)
        state.update((day, int(total), int(s)))
        # nullable Int64: key[0] is None for the NULL-key group
        yield pd.DataFrame(
            {
                "user_id": pd.array(
                    [key[0]] * len(out_days), dtype="Int64"
                ),
                "day_num": pd.array(out_days, dtype="int64"),
                "cusum_c": pd.array(out_s, dtype="int64"),
            }
        )

    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        CUSUM_OUTPUT_SCHEMA,
        CUSUM_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
