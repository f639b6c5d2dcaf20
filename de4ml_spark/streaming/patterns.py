"""Stateful streaming sequence-pattern matching (MATCH_RECOGNIZE-lite on a
stream): per-user conversion counting for the ``v[^vp]*p`` funnel pattern,
as an ``applyInPandasWithState`` automaton.

The batch twin is ``queries/pipelineq.py: pattern_match_events`` (regex over
the fully-ordered symbol string). Streaming cannot see the whole string, but
the pattern is regular, so a 1-bit automaton per key carries exactly the
information the regex scan needs across micro-batches:

- on 'v' (view): open := True (a later v restarts the same pending match —
  equivalent, since ``[^vp]*`` can never consume a v)
- on 'p' (purchase): if open -> one conversion, open := False
- other symbols: no-op (they sit inside ``[^vp]*``)

Ordering contract: events are processed in (ts, event_id) order WITHIN each
micro-batch and batches are assumed key-ordered across time — the guarantee
a partitioned log (Kafka key -> partition) provides. Full event-time
MATCH_RECOGNIZE over disordered streams needs watermark-delayed buffering
(the delayed-emission machinery in streaming/stateful.py shows that
pattern); this operator is the low-latency running-count shape.

Scale: state is 3 scalars per active user, partitioned by the groupBy
shuffle across executors; Arrow moves batches, the Python worker sees one
key-group at a time. Output mode "update": one running-total row per user
per batch that touched it.

Parity anchor: the reference's join-service consumes ordered per-key event
streams the same way (join-service/app/main.py:81-96); this extends that
surface to pattern detection.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, n_conversions BIGINT"
STATE_SCHEMA = "open BOOLEAN, n_events BIGINT, n_conversions BIGINT"


def _pattern_fn(
    key: tuple[int], pdfs: Iterator["pd.DataFrame"], state: GroupState  # noqa: F821
) -> Iterator["pd.DataFrame"]:  # noqa: F821
    import pandas as pd

    open_, n_events, n_conv = (
        state.get if state.exists else (False, 0, 0)
    )
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch):
        batch = batch.sort_values(["ts", "event_id"])
        for et in batch["event_type"]:
            s = et[0]
            n_events += 1
            if s == "v":
                open_ = True
            elif s == "p" and open_:
                n_conv += 1
                open_ = False
    state.update((bool(open_), int(n_events), int(n_conv)))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [int(n_events)],
            "n_conversions": [int(n_conv)],
        }
    )


def streaming_pattern_counts(events: DataFrame) -> DataFrame:
    """events: streaming DF with (event_id, ts, user_id, event_type).
    Returns the running (user_id, n_events, n_conversions) update stream."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _pattern_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_pattern_counts_tws(events: DataFrame) -> DataFrame:
    """The same automaton on the Spark 4 stateful API:
    ``transformWithStateInPandas`` with a ``StatefulProcessor`` holding the
    3-scalar automaton in a named ValueState. Functionally identical to
    ``streaming_pattern_counts`` (same output schema, same cross-batch
    semantics); transformWithState is the forward path
    (applyInPandasWithState's successor) and additionally supports
    timers/TTL if the pattern ever needs session expiry.

    Runtime requirements: the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the
    ``protobuf`` Python package (the Spark 4 Python state-server protocol
    is protobuf-framed). The cross-batch equivalence test runs wherever
    protobuf is available and skips (with the reason recorded) where the
    environment does not ship it; plan construction and output schema are
    tested unconditionally."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _PatternProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("automaton", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            open_, n_events, n_conv = (
                self._state.get() if self._state.exists() else (False, 0, 0)
            )
            batch = pd.concat(list(rows), ignore_index=True)
            if len(batch):
                batch = batch.sort_values(["ts", "event_id"])
                for et in batch["event_type"]:
                    s = et[0]
                    n_events += 1
                    if s == "v":
                        open_ = True
                    elif s == "p" and open_:
                        n_conv += 1
                        open_ = False
            self._state.update((bool(open_), int(n_events), int(n_conv)))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [int(n_events)],
                    "n_conversions": [int(n_conv)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_PatternProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
