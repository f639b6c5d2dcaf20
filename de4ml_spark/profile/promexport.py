"""Prometheus artifact emitters: profile-derived rules -> alert-rules YAML,
and labelled violation counters -> OpenMetrics exposition text.

Parity targets (citations relative to /root/reference/):
- Alert-rule generation — one PromQL alert per bounded field, written as a
  rule-group YAML artifact: dataops/app/profile.py:61-78 ->
  promconfig/data_quality_rules.yml. Shape per rule:
  {alert, expr: increase(<counter>_total{loc="<field>"}[1m]) > 0,
   for: 0m, labels: {severity: warning}, annotations: {summary, description}}.
- Labelled counter exposition — prometheus_client Counter(name, [loc, type])
  scraped as ``<name>_total{loc=...,type=...}``: dataops/app/api.py:15-19,
  counter name/labels in dataops/app/constants.py:4-5.

The reference materializes these via a live Prometheus client + codegen'd
contracts; here both are pure formatters over the repo's rules-as-data and
counter DataFrames, so the same dataops loop (profile -> rules -> counters
-> alerts) closes without a service process. Scale: driver-side string
formatting over rule lists and the (loc, type)-grained counter result —
bounded by field count, never by data volume.
"""

from __future__ import annotations

from typing import Iterable, Mapping

from de4ml_spark.contracts.validation import BOUNDS, Rule

# Reference defaults (dataops/app/constants.py:2-5, profile.py:72-78).
DEFAULT_COUNTER = "agrawal_validation_checks"
DEFAULT_GROUP = "agrawal"
DEFAULT_TITLE = "AgrawalRequest"
COUNTER_HELP = "Data quality validation error counter"


def rules_to_alert_dicts(
    rules: Iterable[Rule],
    *,
    counter: str = DEFAULT_COUNTER,
    title: str = DEFAULT_TITLE,
) -> list[dict]:
    """One alert dict per BOUNDS rule, mirroring the reference's
    "if minimum or maximum in prop" loop (dataops/app/profile.py:62-77) —
    required-only fields get no alert, matching the reference."""
    alerts = []
    seen: set[str] = set()
    for rule in rules:
        if rule.kind != BOUNDS or rule.loc in seen:
            continue
        seen.add(rule.loc)
        alerts.append(
            {
                "alert": f"{title}_{rule.loc}",
                "expr": (
                    f'increase({counter}_total{{loc="{rule.loc}"}}[1m]) > 0'
                ),
                "for": "0m",
                "labels": {"severity": "warning"},
                "annotations": {
                    "summary": f"DQ Violation {rule.loc}",
                    "description": (
                        f"Data quality rule violation for {rule.loc}"
                    ),
                },
            }
        )
    return alerts


def rules_to_promql(
    rules: Iterable[Rule],
    *,
    counter: str = DEFAULT_COUNTER,
    group: str = DEFAULT_GROUP,
    title: str = DEFAULT_TITLE,
) -> str:
    """Render the alert-rules artifact as YAML text with the exact
    document shape the reference writes (``yaml.dump({"groups": [...]})``
    at dataops/app/profile.py:78)."""
    doc = {
        "groups": [
            {
                "name": group,
                "rules": rules_to_alert_dicts(rules, counter=counter, title=title),
            }
        ]
    }
    try:
        import yaml

        return yaml.safe_dump(doc, sort_keys=True)
    except ImportError:  # pragma: no cover - PyYAML ships in this env
        import json

        return json.dumps(doc, sort_keys=True, indent=2)


def counters_to_openmetrics(
    counts: Iterable[Mapping],
    *,
    counter: str = DEFAULT_COUNTER,
    help_text: str = COUNTER_HELP,
) -> str:
    """Format (loc, type, n_violations) counter rows — the output of
    ``contracts.validation.violation_counts`` (or its streaming twin) — as
    prometheus_client-style exposition text, the scrape surface of
    dataops/app/api.py:15-19.

    Label order and the ``_total`` sample suffix follow the Prometheus
    client library; rows are emitted sorted by (loc, type) so the artifact
    is deterministic regardless of the aggregate's partition order."""
    lines = [
        f"# HELP {counter}_total {help_text}",
        f"# TYPE {counter}_total counter",
    ]
    rows = sorted(counts, key=lambda r: (str(r["loc"]), str(r["type"])))
    for r in rows:
        value = float(r["n_violations"])
        lines.append(
            f'{counter}_total{{loc="{r["loc"]}",type="{r["type"]}"}} {value}'
        )
    return "\n".join(lines) + "\n"
