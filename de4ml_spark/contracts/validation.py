"""Validation rules as data -> single-pass split into valid / reject streams.

Parity targets (citations relative to /root/reference/):
- Required-field + type contract checks (HTTP 422 path):
  logging-service/app/api.py:12-16, tests/test_searches.py:71-79.
- Range constraints (``probability`` in [0,1]): join-service/app/main.py:134-136.
- Profile-derived bounds: dataops/app/profile.py:26-39.
- Labelled violation counters ``(loc, type)``: dataops/app/api.py:15-19, 65-67.

Scale design: rules compile to ONE array-of-struct expression evaluated in a
single pass (whole-stage codegen, no Python). ``apply_rules`` returns a
DataFrame with a ``_violations`` column; validity is ``size(_violations)=0``.
No per-rule scans, no driver-side loops — N rules cost one projection.
Custom row predicates (the reference's "custom Pydantic validator"
capability, logging-service/README.md:23-26) plug in as a Column built from a
pandas_udf — still one pass.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REQUIRED = "required"
BOUNDS = "bounds"
FINITE = "finite"
CUSTOM = "custom"


@dataclass(frozen=True)
class Rule:
    """One validation rule. ``loc`` labels the field (Prometheus label parity,
    dataops/app/constants.py:4-5); ``kind`` is the error type label."""

    loc: str
    kind: str
    lo: float | None = None
    hi: float | None = None
    predicate: Any = None  # Column: True means VALID (for kind=CUSTOM)

    def valid_expr(self) -> Column:
        if self.kind == REQUIRED:
            return F.col(self.loc).isNotNull()
        if self.kind == BOUNDS:
            c = F.col(self.loc)
            cond = F.lit(True)
            if self.lo is not None:
                cond = cond & (c >= F.lit(self.lo))
            if self.hi is not None:
                cond = cond & (c <= F.lit(self.hi))
            # null passes bounds (required-ness is a separate rule)
            return c.isNull() | cond
        if self.kind == FINITE:
            # NaN/+-Inf are rejected EXPLICITLY: BOUNDS alone lets NaN
            # pass a lo-only bound (Spark orders NaN greater than
            # everything, so NaN >= lo is true). NULL passes —
            # required-ness is a separate rule. The scan-side twin of
            # this rule is session.load_table's finite-guard.
            c = F.col(self.loc)
            return c.isNull() | (
                ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))
            )
        if self.kind == CUSTOM:
            if self.predicate is None:
                raise ValueError(f"custom rule {self.loc} needs a predicate Column")
            return self.predicate
        raise ValueError(f"unknown rule kind: {self.kind}")


def rules_from_profile(profile_rows: list[dict]) -> list[Rule]:
    """Derive rules from a profile table, mirroring dataops/app/profile.py:21-39:
    numeric columns get [min, max] bounds; 0%-null columns become required.
    ``profile_rows`` uses the battery schema from de4ml_spark.profile.battery.
    """
    rules: list[Rule] = []
    for row in profile_rows:
        col = row["column_name"]
        if row.get("null_percentage", 100.0) == 0.0:
            rules.append(Rule(loc=col, kind=REQUIRED))
        if row.get("is_numeric") and row.get("min") is not None:
            rules.append(
                Rule(loc=col, kind=BOUNDS, lo=float(row["min"]), hi=float(row["max"]))
            )
            rules.append(Rule(loc=col, kind=FINITE))
    return rules


def violations_array(rules: list[Rule]) -> Column:
    """Array<struct<loc,type>> of violated rules — one expression, one pass."""
    # coalesce: a NULL predicate result (e.g. a custom rule over a null
    # field) counts as a violation, not a silent pass
    structs = [
        F.when(
            ~F.coalesce(rule.valid_expr(), F.lit(False)),
            F.struct(F.lit(rule.loc).alias("loc"), F.lit(rule.kind).alias("type")),
        )
        for rule in rules
    ]
    return F.array_compact(F.array(*structs)) if structs else F.array()


def apply_rules(df: DataFrame, rules: list[Rule]) -> DataFrame:
    return df.withColumn("_violations", violations_array(rules))


def split_valid(df: DataFrame, rules: list[Rule]) -> tuple[DataFrame, DataFrame]:
    """(valid, rejects). Works on batch and streaming DataFrames."""
    checked = apply_rules(df, rules)
    valid = checked.filter(F.size("_violations") == 0).drop("_violations")
    rejects = checked.filter(F.size("_violations") > 0)
    return valid, rejects


def violation_counts(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Labelled violation counts, the A2 counter surface
    (dataops/app/api.py:65-67): one row per (loc, type) with n_violations.
    """
    checked = apply_rules(df, rules)
    return (
        checked.select(F.explode("_violations").alias("v"))
        .groupBy(F.col("v.loc").alias("loc"), F.col("v.type").alias("type"))
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
