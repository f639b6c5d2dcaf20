"""Cache lifecycle helper for operators that persist() intermediates.

Several operators persist an intermediate as a load-bearing barrier (it
stops CollapseProject/pushdown from re-inlining giant expressions — see
SCALE.md "Vector-math execution notes") and as a shared-scan index. The
returned DataFrame is lazy, so the function itself cannot unpersist —
but leaving the blocks cached accumulates storage across repeated catalog
runs in one session.

``release_after`` resolves this: eagerly materialize the (small) result
with ``localCheckpoint`` — truncating lineage so the result no longer
references the cached plans — then unpersist the intermediates. The
checkpoint blocks themselves are reference-tracked by Spark's
ContextCleaner and freed when the returned DataFrame is garbage
collected, so nothing outlives its consumer.
"""

from __future__ import annotations

import contextlib
import threading

from pyspark.sql import DataFrame

_RELEASE_ENABLED = True


def release_after(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize ``result``, then unpersist every ``cached`` input.

    Use when ``result`` is orders of magnitude smaller than the cached
    intermediates (top-k lists, near-dup pair sets, component labels):
    the eager materialization costs one extra write of a small relation
    and buys back the intermediates' cache space immediately.
    """
    if not _RELEASE_ENABLED:
        return result
    out = result.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist(blocking=False)
    return out


_DEFERRED: list[DataFrame] = []

# Upper bound on the deferred list: a driver-contract consumer that
# only collects DataFrames (never calls drain_deferred) must not
# accumulate persisted frames without limit across a long session.
# On overflow the OLDEST registrations are unpersisted — always safe
# (worst case a not-yet-materialized consumer recomputes), and old
# entries are overwhelmingly already-consumed by the time 32 newer
# ones have been registered.
_DEFERRED_MAX = 32

# _DEFERRED is mutated from the 16-thread parity/bench fleets; the lock
# makes the bound exact and the pop/unpersist pairs atomic rather than
# relying on the GIL's list-op atomicity (ADVICE r15: unlocked
# interleavings could transiently over-pop or double-release — benign,
# since unpersist is idempotent and recompute is safe, but the safety
# argument should be explicit, not incidental).
_DEFERRED_LOCK = threading.Lock()


def defer_release(*cached: DataFrame) -> None:
    """Register persisted intermediates for later release when
    ``release_after`` is unsuitable — i.e. when the RESULT is itself
    corpus-sized (global ranks, cumulative sums), so the eager
    ``localCheckpoint`` would cost a full corpus materialization.

    The registered frames stay cached until a run loop that has
    materialized the consuming result calls :func:`drain_deferred`
    (bench.py does this after each query; tools/verify_oracle.py after
    each entry), or until the bounded list overflows and the oldest
    registrations are released automatically. Unpersisting is always
    safe — worst case a not-yet-materialized consumer recomputes the
    range shuffle."""
    overflow: list[DataFrame] = []
    with _DEFERRED_LOCK:
        _DEFERRED.extend(cached)
        while len(_DEFERRED) > _DEFERRED_MAX:
            overflow.append(_DEFERRED.pop(0))
    # unpersist outside the lock: it is a Py4J round-trip and never
    # needs the list's consistency
    for df in overflow:
        df.unpersist(blocking=False)


def drain_deferred() -> int:
    """Unpersist every frame registered via :func:`defer_release`;
    returns how many were released."""
    with _DEFERRED_LOCK:
        drained = _DEFERRED[:]
        _DEFERRED.clear()
    for df in drained:
        df.unpersist(blocking=False)
    return len(drained)


@contextlib.contextmanager
def no_release():
    """Disable the checkpoint-and-release step (plan audits need to see the
    interior physical plan, which localCheckpoint truncates to a scan)."""
    global _RELEASE_ENABLED
    _RELEASE_ENABLED = False
    try:
        yield
    finally:
        _RELEASE_ENABLED = True
