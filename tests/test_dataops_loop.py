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
