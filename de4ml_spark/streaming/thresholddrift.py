"""Streaming threshold-metric drift monitor: the running Youden-J /
MCC operating point of the LIVE click-vs-purchase value stream,
re-selected exactly per micro-batch via ``applyInPandasWithState`` —
the streaming twin of ``queries/statq5.py: youden_threshold_value``
and ``mcc_threshold_value`` (reference's dataops loop re-profiles the
stream continuously: dataops/app/profile.py:61-78).

Identical math to the batch twins and EXACT at every emission: the
operating point maximizes the integer numerator
j_num = |ca·n_b − cb·n_a| over the merged cents histogram (ties to the
smallest cents value — the batch entries' max-struct order), so the
running threshold/J/MCC equal the batch statistics over the same
prefix bit-for-bit (pinned in tests/test_streaming_thresholddrift.py).

Drift surface: alongside the live optimum the monitor re-evaluates J
at a FROZEN reference threshold (the operating point shipped to
production at training time). ``j_drift = (j_num − j_at_ref_num) /
(n_a·n_b)`` ≥ 0 measures how far the deployed threshold has decayed
from optimal on live traffic — the alert trigger.

State: one (click, purchase) count pair per occupied cents value —
bounded by the value domain, not traffic (the same histogram-first
bound the batch pairhist frame rides). One monitor key here;
per-segment monitors shard across executors by the groupBy key.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "monitor STRING, n_a BIGINT, n_b BIGINT, threshold_cents BIGINT,"
    " j_num BIGINT, youden_j DOUBLE, tp BIGINT, fp BIGINT, tn BIGINT,"
    " fn BIGINT, mcc DOUBLE, ref_threshold_cents BIGINT,"
    " j_at_ref_num BIGINT, j_drift DOUBLE"
)
STATE_SCHEMA = (
    "vals ARRAY<BIGINT>, a_counts ARRAY<BIGINT>, b_counts ARRAY<BIGINT>"
)


def exact_operating_point(
    hist_a: dict[int, int], hist_b: dict[int, int]
) -> dict:
    """The batch twins' exact operating-point selection on two integer
    cents histograms (a = negative class / click, b = positive class /
    purchase): maximize j_num = |ca·n_b − cb·n_a|, ties to the SMALLEST
    cents value (statq5 max-struct order), and report the confusion
    counts for the rule "predict positive when value > threshold".

    Returns a dict with n_a, n_b, threshold_cents, j_num, tp, fp, tn,
    fn, youden_j, mcc — all integer-derived; youden_j and mcc are the
    single-IEEE-chain tails the batch entries emit. Empty classes give
    the degenerate point (threshold −1, metrics 0.0).
    """
    n_a = sum(hist_a.values())
    n_b = sum(hist_b.values())
    if n_a == 0 or n_b == 0:
        return {
            "n_a": n_a, "n_b": n_b, "threshold_cents": -1,
            "j_num": 0, "tp": n_b, "fp": n_a, "tn": 0, "fn": 0,
            "youden_j": 0.0, "mcc": 0.0,
        }
    ca = cb = 0
    best_key: tuple[int, int] | None = None
    best: dict = {}
    for v in sorted(set(hist_a) | set(hist_b)):
        ca += hist_a.get(v, 0)
        cb += hist_b.get(v, 0)
        j_num = abs(ca * n_b - cb * n_a)
        key = (j_num, -v)
        if best_key is None or key > best_key:
            best_key = key
            best = {
                "threshold_cents": v, "j_num": j_num,
                "tp": n_b - cb, "fp": n_a - ca, "tn": ca, "fn": cb,
            }
    tp, fp = best["tp"], best["fp"]
    tn, fn = best["tn"], best["fn"]
    denom = (
        float(tp + fp) * float(tp + fn) * float(tn + fp) * float(tn + fn)
    )
    return {
        "n_a": n_a,
        "n_b": n_b,
        **best,
        "youden_j": best["j_num"] / (float(n_a) * float(n_b)),
        # math.sqrt is the correctly-rounded IEEE sqrt the batch SQL's
        # sqrt() uses (pow(x, 0.5) is NOT guaranteed correctly rounded)
        "mcc": (
            (float(tp) * float(tn) - float(fp) * float(fn))
            / math.sqrt(denom)
            if denom > 0.0
            else 0.0
        ),
    }


def j_num_at(
    hist_a: dict[int, int], hist_b: dict[int, int], threshold: int
) -> int:
    """Exact J numerator of the live histograms evaluated AT a fixed
    threshold: |ca(θ)·n_b − cb(θ)·n_a| with ca/cb = counts ≤ θ."""
    n_a = sum(hist_a.values())
    n_b = sum(hist_b.values())
    ca = sum(c for v, c in hist_a.items() if v <= threshold)
    cb = sum(c for v, c in hist_b.items() if v <= threshold)
    return abs(ca * n_b - cb * n_a)


def _monitor_fn(ref_threshold_cents: int):
    ref_t = int(ref_threshold_cents)

    def fn(
        key: tuple[str],
        pdfs: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        hist_a: dict[int, int] = {}
        hist_b: dict[int, int] = {}
        if state.exists:
            vals, a_cnts, b_cnts = state.get
            for v, a_c, b_c in zip(
                list(vals or []), list(a_cnts or []), list(b_cnts or [])
            ):
                hist_a[int(v)] = int(a_c)
                hist_b[int(v)] = int(b_c)
        for pdf in pdfs:
            for v, n in (
                pdf.loc[~pdf["__is_b"], "__v_c"].value_counts().items()
            ):
                hist_a[int(v)] = hist_a.get(int(v), 0) + int(n)
            for v, n in (
                pdf.loc[pdf["__is_b"], "__v_c"].value_counts().items()
            ):
                hist_b[int(v)] = hist_b.get(int(v), 0) + int(n)
        vals = sorted(set(hist_a) | set(hist_b))
        state.update(
            (
                vals,
                [hist_a.get(v, 0) for v in vals],
                [hist_b.get(v, 0) for v in vals],
            )
        )
        op = exact_operating_point(hist_a, hist_b)
        j_ref = j_num_at(hist_a, hist_b, ref_t)
        nn = op["n_a"] * op["n_b"]
        yield pd.DataFrame(
            {
                "monitor": [key[0]],
                "n_a": [op["n_a"]],
                "n_b": [op["n_b"]],
                "threshold_cents": [op["threshold_cents"]],
                "j_num": [op["j_num"]],
                "youden_j": [op["youden_j"]],
                "tp": [op["tp"]],
                "fp": [op["fp"]],
                "tn": [op["tn"]],
                "fn": [op["fn"]],
                "mcc": [op["mcc"]],
                "ref_threshold_cents": [ref_t],
                "j_at_ref_num": [j_ref],
                "j_drift": [
                    (op["j_num"] - j_ref) / float(nn) if nn else 0.0
                ],
            }
        )

    return fn


def streaming_threshold_monitor(
    events: DataFrame,
    ref_threshold_cents: int,
    value_col: str = "value",
    type_col: str = "event_type",
    neg_type: str = "click",
    pos_type: str = "purchase",
) -> DataFrame:
    """events: streaming DF with ``value_col`` and a ``type_col`` whose
    (neg_type, pos_type) rows form the two classes. Returns the running
    operating-point + drift update stream — one row per batch."""
    keyed = events.filter(
        F.col(value_col).isNotNull()
        & F.col(type_col).isin(neg_type, pos_type)
    ).select(
        F.lit("op").alias("monitor"),
        F.expr(
            f"CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("__v_c"),
        (F.col(type_col) == pos_type).alias("__is_b"),
    )
    return keyed.groupBy("monitor").applyInPandasWithState(
        _monitor_fn(ref_threshold_cents),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
