"""Streaming multi-touch attribution: the real-time twin of the batch
``attribution_credit_events`` catalog entry (queries/statq.py) as a
per-user ``applyInPandasWithState`` automaton.

Reference parity: the reference's join service materializes
decision↔reward credit assignment on a stream (join-service/app/
main.py); attribution is the marketing-analytics face of the same
delayed-credit shape. Semantics mirror the batch entry exactly — every
purchase credits the SAME user's click/view touches in the preceding
ATTR_WINDOW_DAYS (inclusive both ends), linear credit is half-up
integer ppm per touch, first/last credit goes to the (ts, event_id)-
ordered boundary touches — so stream totals are bit-equal to the batch
aggregate after the same events (pinned in
tests/test_streaming_attribution.py).

State per user is the touch buffer for the trailing window ONLY
(parallel lists, evicted against the max event time seen: a touch
older than max_ts − window can never enter a future purchase's window
under ordered arrival), so state size is bounded by per-user touch
rate × window, independent of stream length. Arrival-order contract as
streaming/drift.py, on the TOTAL processing order (ts, kind, event_id)
— kind puts touches before purchases at equal timestamps, matching the
batch twin's inclusive t_ts <= b_ts window: an arrival that regresses
against the per-user high-water TRIPLE (not just the timestamp — a
same-timestamp touch landing in a later micro-batch than its purchase
would otherwise silently re-order the buffer) is DROPPED and counted
into the emitted n_dropped, never folded into state. Out-of-order
replay therefore degrades detectably, and the in-order stream is
bit-equal to the batch aggregate.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

from de4ml_spark.queries.statq import ATTR_WINDOW_DAYS

OUTPUT_SCHEMA = (
    "purchase_id BIGINT, touch_type STRING, n_touch BIGINT,"
    " linear_ppm BIGINT, first_ppm BIGINT, last_ppm BIGINT,"
    " n_dropped BIGINT"
)
STATE_SCHEMA = (
    "last_us BIGINT, last_p INT, last_id BIGINT,"
    " t_us ARRAY<BIGINT>, t_type ARRAY<STRING>,"
    " t_id ARRAY<BIGINT>, n_dropped BIGINT"
)

_WINDOW_US = ATTR_WINDOW_DAYS * 86_400_000_000


def _fold_batch(state_tuple, batch):
    """Pure fold of one sorted-batch of a user's events into the
    attribution state. Shared by the applyInPandasWithState and
    transformWithStateInPandas surfaces so the two APIs cannot drift.
    Returns (new_state_tuple, out_rows)."""
    last_us, last_p, last_id, t_us, t_type, t_id, n_dropped = state_tuple
    last = (last_us, last_p, last_id) if last_us is not None else None
    t_us, t_type, t_id = list(t_us), list(t_type), list(t_id)

    out = []
    if len(batch):
        # same-timestamp ties process touches BEFORE purchases: the
        # batch twin's window is t_ts <= b_ts inclusive, so a touch
        # sharing the purchase's timestamp must be visible to it
        batch = batch.assign(
            _p=(batch["event_type"] == "purchase").astype(int)
        ).sort_values(["ts", "_p", "event_id"])
        for ts, eid, et, p in zip(
            batch["ts"], batch["event_id"], batch["event_type"],
            batch["_p"],
        ):
            us = int(ts.value) // 1000  # pandas ns -> micros
            order_key = (us, int(p), int(eid))
            if last is not None and order_key <= last:
                n_dropped += 1
                continue
            last = order_key
            if et in ("click", "view"):
                t_us.append(us)
                t_type.append(et)
                t_id.append(int(eid))
                # evict: older than max_ts - window can never credit
                cut = us - _WINDOW_US
                while t_us and t_us[0] < cut:
                    t_us.pop(0)
                    t_type.pop(0)
                    t_id.pop(0)
            elif et == "purchase":
                lo = us - _WINDOW_US
                idx = [
                    i
                    for i in range(len(t_us))
                    if lo <= t_us[i] <= us
                ]
                n = len(idx)
                if n:
                    per = (2 * 1_000_000 + n) // (2 * n)
                    # buffer is (ts, event_id)-ordered by construction
                    first_t = t_type[idx[0]]
                    last_t = t_type[idx[-1]]
                    agg: dict[str, int] = {}
                    for i in idx:
                        agg[t_type[i]] = agg.get(t_type[i], 0) + 1
                    for tt in sorted(agg):
                        out.append(
                            (
                                int(eid),
                                tt,
                                n,
                                agg[tt] * per,
                                1_000_000 if tt == first_t else 0,
                                1_000_000 if tt == last_t else 0,
                                n_dropped,
                            )
                        )

    new_state = (
        int(last[0]) if last is not None else 0,
        int(last[1]) if last is not None else -1,
        int(last[2]) if last is not None else -1,
        [int(x) for x in t_us],
        list(t_type),
        [int(x) for x in t_id],
        int(n_dropped),
    )
    return new_state, out


def _decode_state(raw) -> tuple:
    """Restore the stored state tuple: the no-watermark sentinel is
    last_p == -1 (set only before any event is accepted) — NOT a falsy
    last_us, which would misread a legitimate epoch-zero timestamp."""
    if raw[1] == -1:
        return (None,) + tuple(raw[1:])
    return tuple(raw)


_OUT_COLS = [
    "purchase_id",
    "touch_type",
    "n_touch",
    "linear_ppm",
    "first_ppm",
    "last_ppm",
    "n_dropped",
]


def _attr_fn(key, pdfs: Iterator, state) -> Iterator:
    import pandas as pd

    st = (
        _decode_state(state.get)
        if state.exists
        else (None, -1, -1, [], [], [], 0)
    )
    batch = pd.concat(list(pdfs), ignore_index=True)
    new_state, out = _fold_batch(st, batch)
    state.update(new_state)
    yield pd.DataFrame(out, columns=_OUT_COLS)


def streaming_attribution(events: DataFrame) -> DataFrame:
    """events: streaming DF with (event_id, ts, user_id, event_type).
    Returns per-purchase per-touch-type credit rows as they resolve.
    Null-user events are excluded, matching the batch twin's filter
    (and keeping the automaton off the null state key)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = events.filter(F.col("user_id").isNotNull())
    return events.groupBy("user_id").applyInPandasWithState(
        _attr_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_attribution_tws(events: DataFrame) -> DataFrame:
    """The same automaton on the Spark 4 stateful API
    (``transformWithStateInPandas``, applyInPandasWithState's
    successor): a ``StatefulProcessor`` holding the identical state
    tuple in a named ValueState and delegating every batch to the SAME
    ``_fold_batch`` — the two surfaces cannot drift. Same runtime
    requirements as streaming/patterns.py's TWS twin (RocksDB state
    store provider + the protobuf package for the Python state-server
    protocol); the parity test skips where the environment lacks them,
    plan construction is tested unconditionally."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _AttrProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("attr", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            if self._state.exists():
                st = _decode_state(self._state.get())
            else:
                st = (None, -1, -1, [], [], [], 0)
            batch = pd.concat(list(rows), ignore_index=True)
            new_state, out = _fold_batch(st, batch)
            self._state.update(new_state)
            yield pd.DataFrame(out, columns=_OUT_COLS)

        def close(self) -> None:
            pass

    events = events.filter(F.col("user_id").isNotNull())
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_AttrProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
