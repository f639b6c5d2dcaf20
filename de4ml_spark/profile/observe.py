"""Zero-extra-pass data-quality metrics via ``df.observe`` (the A2
alternative named in SURVEY §2.4): violation counters computed as observation
metrics during whatever job already runs over the DataFrame — no second scan,
no extra shuffle. On streaming queries the same observation surfaces per
micro-batch through the StreamingQueryListener (the Prometheus-scrape analog,
dataops/promconfig/prometheus.yml:5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from de4ml_spark.contracts.validation import Rule


def observed_violation_counts(
    df: DataFrame, rules: list[Rule], name: str = "dq"
) -> tuple[DataFrame, Observation | None]:
    """Attach one counter per (loc, kind) rule as observation metrics.

    Batch: returns (df, observation); read ``observation.get`` after an
    action completes. Streaming: ``Observation`` objects are batch-only, so
    the metrics are registered under ``name`` (returns (df, None)) and
    surface per micro-batch in ``query.recentProgress[i]["observedMetrics"]
    [name]`` — the Prometheus-scrape analog."""
    counters = [
        F.count(
            F.when(~F.coalesce(rule.valid_expr(), F.lit(False)), F.lit(1))
        ).alias(f"{rule.loc}__{rule.kind}")
        for rule in rules
    ]
    if df.isStreaming:
        return df.observe(name, counters[0], *counters[1:]), None
    obs = Observation(name)
    return df.observe(obs, counters[0], *counters[1:]), obs
