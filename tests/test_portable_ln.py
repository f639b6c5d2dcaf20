"""Portable ln(p/q): Spark and DuckDB must produce BIT-IDENTICAL doubles.

The builder uses only IEEE-correctly-rounded double ops (+,-,*,/) plus
exact integer bit-length range reduction, so the two engines evaluate the
same op sequence on the same inputs — equality here is exact (==), not
approx. Also pins accuracy vs libm (~2 ulp) so the score stays honest.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from de4ml_spark.operators.portable_hash import (
    LN2,
    portable_ln_duck_ctes,
    round6_floor_sql,
    with_portable_ln,
)


@pytest.fixture(scope="module")
def ratio_rows():
    rng = random.Random(1729)
    rows = [(1, 1), (2, 1), (10, 3), (7, 7), (2**40, 3)]
    for _ in range(120):
        q = rng.randint(1, 10**6)
        p = q * rng.randint(1, 10**6) + rng.randint(0, q - 1)
        rows.append((p, q))
    return [(i, p, q) for i, (p, q) in enumerate(rows)]


def test_portable_ln_bit_identical_and_accurate(spark, ratio_rows):
    sdf = spark.createDataFrame(ratio_rows, "id BIGINT, p BIGINT, q BIGINT")
    got_spark = {
        r["id"]: r["pln"]
        for r in with_portable_ln(sdf, "p", "q", "pln").collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE r (id BIGINT, p BIGINT, q BIGINT)")
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", ratio_rows)
    sql = (
        "WITH "
        + portable_ln_duck_ctes("r", "id", "p", "q", "pln", "pl")
        + " SELECT id, pln FROM pl_out"
    )
    got_duck = dict(con.sql(sql).fetchall())

    assert set(got_spark) == set(got_duck)
    for i, p, q in ratio_rows:
        s, d = got_spark[i], got_duck[i]
        # bit-identical: struct-pack equality, not isclose
        assert s == d and math.copysign(1, s) == math.copysign(1, d), (
            i, p, q, s.hex(), d.hex(),
        )
        ref = math.log(p) - math.log(q)
        assert abs(s - ref) <= 4e-16 * max(abs(ref), 1.0), (i, p, q)


def test_portable_ln_exact_cases(spark):
    sdf = spark.createDataFrame(
        [(1, 1, 1), (2, 2, 1), (3, 4, 1), (4, 1024, 1)],
        "id BIGINT, p BIGINT, q BIGINT",
    )
    got = {
        r["id"]: r["pln"]
        for r in with_portable_ln(sdf, "p", "q", "pln").collect()
    }
    assert got[1] == 0.0  # ln 1
    assert got[2] == LN2  # power-of-two ratios reduce to k*LN2 exactly
    assert got[3] == 2 * LN2
    assert got[4] == 10 * LN2


def test_round6_floor_engine_exact(spark):
    """floor-based 6dp rounding: identical on both engines including the
    half boundary that ROUND(double, 6) gets wrong between them."""
    vals = [(1, 0.1234565), (2, 0.9999995), (3, 3.0000004999), (4, 0.0)]
    sdf = spark.createDataFrame(vals, "id BIGINT, x DOUBLE")
    from pyspark.sql import functions as F

    got_s = {
        r["id"]: r["r6"]
        for r in sdf.select(
            "id", F.expr(round6_floor_sql("x")).alias("r6")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE v (id BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO v VALUES (?, ?)", vals)
    got_d = dict(
        con.sql(f"SELECT id, {round6_floor_sql('x')} FROM v").fetchall()
    )
    assert got_s == got_d


def _py_reference_ln(p: int, q: int) -> float:
    """Pure-Python replay of the EXACT op sequence the SQL builders emit
    (shared with the driver-side constant helper) — bit-identical to
    both engines; a cheap determinism pin that needs no Spark session."""
    from de4ml_spark.operators.portable_hash import portable_ln_const

    return portable_ln_const(p, q)


def test_python_reference_matches_duck_hypothesis():
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from de4ml_spark.operators.portable_hash import portable_ln_duck_ctes

    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(
        q=st.integers(min_value=1, max_value=10**9),
        mult=st.integers(min_value=1, max_value=10**9),
        rem=st.integers(min_value=0, max_value=10**9),
    )
    def check(q, mult, rem):
        p = q * mult + min(rem, q - 1)
        sql = (
            "WITH r AS (SELECT 1 AS id, "
            f"CAST({p} AS BIGINT) AS p, CAST({q} AS BIGINT) AS q), "
            + portable_ln_duck_ctes("r", "id", "p", "q", "pln", "pl")
            + " SELECT pln FROM pl_out"
        )
        got = con.sql(sql).fetchone()[0]
        assert got == _py_reference_ln(p, q), (p, q)

    check()
