"""salted_join must be row-identical to the plain inner join, replicate
only hot build rows, and leave cold-only joins untouched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skewed(spark):
    # key 7 is hot (300 rows), keys 0-9 cold
    big = spark.range(0, 330).select(
        F.when(F.col("id") < 300, F.lit(7))
        .otherwise(F.col("id") % 10)
        .cast("bigint")
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(10)], "k BIGINT, name STRING"
    )
    return big, small


def test_salted_join_equivalent(spark, skewed):
    from de4ml_spark.operators.skewjoin import salted_join

    big, small = skewed
    plain = {tuple(r) for r in big.join(small, "k").collect()}
    salted = {
        tuple(r)
        for r in salted_join(
            big, small, "k", n_salts=8, hot_threshold=100
        ).collect()
    }
    assert salted == plain and len(plain) == 330


def test_salted_join_explicit_hot_keys(spark, skewed):
    from de4ml_spark.operators.skewjoin import salted_join

    big, small = skewed
    plain = {tuple(r) for r in big.join(small, "k").collect()}
    salted = {
        tuple(r)
        for r in salted_join(big, small, "k", n_salts=4, hot_keys=[7]).collect()
    }
    assert salted == plain


def test_salted_join_no_hot_keys_is_plain_join(spark, skewed):
    from de4ml_spark.operators.skewjoin import salted_join

    big, small = skewed
    out = salted_join(big, small, "k", hot_threshold=10_000)
    assert "__salt" not in out.columns
    assert out.count() == 330


def test_salted_build_replication_bounded(spark, skewed):
    """Build side replicates ONLY the hot key: n_salts copies of it,
    one of everything else."""
    from de4ml_spark.operators.skewjoin import salted_join

    big, small = skewed
    n_salts = 8
    out = salted_join(big, small, "k", n_salts=n_salts, hot_keys=[7])
    # join result already proves semantics; measure replication on the
    # salted build frame by reconstructing it the same way
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    smalls = small.withColumn(
        "__salt",
        F.explode(
            F.when(F.col("k").isin([7]), salts).otherwise(F.array(F.lit(0)))
        ),
    )
    per_key = {r["k"]: r["n"] for r in smalls.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_key[7] == n_salts
    assert all(v == 1 for k, v in per_key.items() if k != 7)
    assert out.count() == 330
