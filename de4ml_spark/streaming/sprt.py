"""Streaming Wald SPRT: the sequential test is the canonical STREAMING
decision procedure (it exists to stop as soon as the evidence
suffices), so the batch replay entry ``sprt_ctr_deciles``
(queries/statq.py) gets a first-class stateful twin: per decile, an
``applyInPandasWithState`` automaton folds daily (clicks, trials)
increments into the integer cumulative LLR and emits the decision row
AT the first barrier crossing — then freezes (a decided test must
ignore further data, exactly like the batch replay which stops at the
first crossing).

Determinism contract: the same micro-quantized portable-ln constants
as the batch entry (driver-side replica of the engines' ln
definition), integer state, and the drift.py arrival-order rule —
days that regress against the per-key high-water mark are dropped and
counted, never folded in. Totals after any prefix of ordered days are
bit-equal to the batch replay on the same events (pinned in
tests/test_streaming_sprt.py).

State is three scalars + the decided flag — O(1) per key forever.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

from de4ml_spark.queries.statq import _sprt_consts

OUTPUT_SCHEMA = (
    "decile BIGINT, decision_day DATE, n_days_used BIGINT,"
    " llr_micro BIGINT, decision STRING, n_dropped BIGINT"
)
STATE_SCHEMA = (
    "last_day DATE, llr BIGINT, n_days BIGINT, decided BOOLEAN,"
    " n_dropped BIGINT"
)


def _sprt_fn(key, pdfs: Iterator, state) -> Iterator:
    import pandas as pd

    ln43, ln98, ln19 = _sprt_consts()
    if state.exists:
        last_day, llr, n_days, decided, n_dropped = state.get
    else:
        last_day, llr, n_days, decided, n_dropped = None, 0, 0, False, 0

    out = []
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch) and not decided:
        batch = batch.sort_values("day")
        for day, n, x in zip(batch["day"], batch["n"], batch["x"]):
            d = day.date() if hasattr(day, "date") else day
            if last_day is not None and d <= last_day:
                n_dropped += 1
                continue
            last_day = d
            llr += int(x) * ln43 - (int(n) - int(x)) * ln98
            n_days += 1
            if llr >= ln19 or llr <= -ln19:
                decided = True
                out.append(
                    (
                        key[0],
                        d,
                        n_days,
                        llr,
                        "h1" if llr >= ln19 else "h0",
                        n_dropped,
                    )
                )
                break
    elif len(batch) and decided:
        n_dropped += len(batch)

    state.update((last_day, int(llr), int(n_days), bool(decided), int(n_dropped)))
    yield pd.DataFrame(
        out,
        columns=[
            "decile",
            "decision_day",
            "n_days_used",
            "llr_micro",
            "decision",
            "n_dropped",
        ],
    )


def streaming_sprt(daily: DataFrame) -> DataFrame:
    """daily: streaming DF with (decile BIGINT, day DATE, n BIGINT,
    x BIGINT) — per-decile daily trials and successes. Emits ONE
    decision row per decile at its first barrier crossing."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return daily.groupBy("decile").applyInPandasWithState(
        _sprt_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
