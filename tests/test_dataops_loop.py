"""The full dataops feedback loop E2E (FIXTURES.md §5): synthetic Agrawal
source -> DDL from contract -> profile clean slice -> derive rules ->
violation counts on a dirty slice, with (loc, type) labels
(dataops/app/api.py:54-76 + profile.py:21-39), plus the pandas_udf custom
validator hook (logging-service/README.md:23-26)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from de4ml_spark.contracts.ddl import create_table_sql
from de4ml_spark.contracts.validation import (
    Rule,
    rules_from_profile,
    violation_counts,
)
from de4ml_spark.profile import profile
from de4ml_spark.sources.synthetic import AGRAWAL_SCHEMA, agrawal_frame


def test_ddl_from_contract(spark, tmp_path):
    df = agrawal_frame(spark, 10)
    sql = create_table_sql("agrawal_t", df.schema, location=str(tmp_path / "t"))
    assert "salary DOUBLE" in sql and "age INT" in sql
    spark.sql(sql)
    try:
        df.write.insertInto("agrawal_t")
        assert spark.table("agrawal_t").count() == 10
    finally:
        spark.sql("DROP TABLE agrawal_t")


def test_generator_deterministic(spark):
    a = agrawal_frame(spark, 50, seed=1729).collect()
    b = agrawal_frame(spark, 50, seed=1729).collect()
    assert a == b
    c = agrawal_frame(spark, 50, seed=42).collect()
    assert a != c


def test_profile_rules_violations_loop(spark):
    clean = agrawal_frame(spark, 500)
    prof = [r.asDict() for r in profile(clean, exact=True).collect()]
    rules = rules_from_profile(prof)
    # every numeric column got bounds; 0%-null columns became required
    locs = {(r.loc, r.kind) for r in rules}
    assert ("salary", "bounds") in locs and ("loan", "required") in locs

    dirty = agrawal_frame(spark, 300, seed=7, dirty_fraction=0.3)
    counts = {
        (r["loc"], r["type"]): r["n_violations"]
        for r in violation_counts(dirty, rules).collect()
    }
    # 90 dirty rows cycle salary-low / age-high / loan-null (30 each)
    assert counts[("salary", "bounds")] == 30
    assert counts[("age", "bounds")] == 30
    assert counts[("loan", "required")] == 30


def test_rules_to_promql_golden(spark):
    """The alert-rules YAML artifact matches the reference's generated
    shape exactly (dataops/app/profile.py:61-78 ->
    promconfig/data_quality_rules.yml): one alert per bounded field with
    the increase(...[1m]) > 0 expression, for: 0m, severity warning, and
    the DQ summary/description annotations, under groups[0] named
    'agrawal'."""
    import yaml

    from de4ml_spark.profile.promexport import rules_to_promql

    clean = agrawal_frame(spark, 500)
    prof = [r.asDict() for r in profile(clean, exact=True).collect()]
    rules = rules_from_profile(prof)
    doc = yaml.safe_load(rules_to_promql(rules))

    assert list(doc) == ["groups"]
    assert len(doc["groups"]) == 1
    group = doc["groups"][0]
    assert group["name"] == "agrawal"
    bounded = [r.loc for r in rules if r.kind == "bounds"]
    assert sorted(a["alert"] for a in group["rules"]) == sorted(
        f"AgrawalRequest_{loc}" for loc in bounded
    )
    salary = next(a for a in group["rules"] if a["alert"] == "AgrawalRequest_salary")
    assert salary == {
        "alert": "AgrawalRequest_salary",
        "expr": 'increase(agrawal_validation_checks_total{loc="salary"}[1m]) > 0',
        "for": "0m",
        "labels": {"severity": "warning"},
        "annotations": {
            "summary": "DQ Violation salary",
            "description": "Data quality rule violation for salary",
        },
    }


def test_counters_to_openmetrics_golden(spark):
    """Counter exposition matches prometheus_client's text format for the
    reference counter (dataops/app/api.py:15-19): HELP/TYPE preamble plus
    one ``<name>_total{loc=...,type=...} <float>`` sample per label pair,
    deterministically sorted."""
    from de4ml_spark.profile.promexport import counters_to_openmetrics

    clean = agrawal_frame(spark, 500)
    prof = [r.asDict() for r in profile(clean, exact=True).collect()]
    rules = rules_from_profile(prof)
    dirty = agrawal_frame(spark, 300, seed=7, dirty_fraction=0.3)
    counts = [r.asDict() for r in violation_counts(dirty, rules).collect()]
    text = counters_to_openmetrics(counts)

    # exact preamble + exactly one sorted sample line per (loc, type);
    # the three engineered dirty families are pinned at 30 (other columns
    # may contribute a handful of sampling-edge bounds trips — the clean
    # profile's min/max come from a finite sample)
    preamble = (
        "# HELP agrawal_validation_checks_total Data quality validation"
        " error counter\n"
        "# TYPE agrawal_validation_checks_total counter\n"
    )
    expected_body = "".join(
        f'agrawal_validation_checks_total{{loc="{r["loc"]}",'
        f'type="{r["type"]}"}} {float(r["n_violations"])}\n'
        for r in sorted(counts, key=lambda r: (r["loc"], r["type"]))
    )
    assert text == preamble + expected_body
    for line in (
        'agrawal_validation_checks_total{loc="age",type="bounds"} 30.0\n',
        'agrawal_validation_checks_total{loc="loan",type="required"} 30.0\n',
        'agrawal_validation_checks_total{loc="salary",type="bounds"} 30.0\n',
    ):
        assert line in text


def test_pandas_udf_custom_validator(spark):
    """Arbitrary-Python row predicate as a rule — the reference's custom
    Pydantic validator capability, as an Arrow-batched pandas_udf."""

    @pandas_udf("boolean")
    def commission_consistent(salary: pd.Series, commission: pd.Series) -> pd.Series:
        return (salary < 75_000) | (commission == 0.0)

    df = agrawal_frame(spark, 200)
    rules = [
        Rule(
            loc="commission",
            kind="custom",
            predicate=commission_consistent(F.col("salary"), F.col("commission")),
        )
    ]
    # generator enforces this invariant -> zero violations on clean data
    assert violation_counts(df, rules).count() == 0

    broken = df.withColumn(
        "commission",
        F.when(F.col("salary") >= 75_000, F.lit(5.0)).otherwise(F.col("commission")),
    )
    counts = violation_counts(broken, rules).collect()
    assert counts and counts[0]["n_violations"] > 0
