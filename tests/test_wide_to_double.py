"""wide_to_double_sql: the portable 128-bit-integer -> double
conversion must be BIT-identical between Spark (DECIMAL(38,0) path)
and DuckDB (HUGEINT path) — direct CAST is not (DuckDB's
hugeint->double is off by one ulp on e.g. 106705227903395487431), and
below 2^53 the recomposition must equal Python's exact conversion."""

from __future__ import annotations

import random
import struct

import duckdb

from de4ml_spark.operators.portable_hash import wide_to_double_sql


def _bits(x: float) -> bytes:
    return struct.pack(">d", x)


def test_cross_engine_bit_identical(spark):
    random.seed(23)
    vals = [
        106705227903395487431,  # the measured DuckDB CAST divergence
        -106705227903395487431,
        2**63,
        2**63 - 1,
        0,
        1,
        -1,
        2**90 + 2**60 + 2**30 + 1,
        2**110,
        10**34 - 1,
        -(10**34 - 1),
    ]
    vals += [random.randrange(-(10**34), 10**34) for _ in range(40)]
    sq = ", ".join(
        f"{wide_to_double_sql('CAST(%r AS DECIMAL(38,0))' % str(v), 'DIV')}"
        f" AS v{i}"
        for i, v in enumerate(vals)
    )
    dq = ", ".join(
        f"{wide_to_double_sql('CAST(%r AS HUGEINT)' % str(v), '//')} AS v{i}"
        for i, v in enumerate(vals)
    )
    sp = spark.sql(f"SELECT {sq}").collect()[0]
    du = duckdb.connect().execute(f"SELECT {dq}").fetchone()
    for i, v in enumerate(vals):
        assert _bits(sp[f"v{i}"]) == _bits(du[i]), (v, sp[f"v{i}"], du[i])
        # below 2^53 the recomposition is exact — equals Python's
        if abs(v) < 2**53:
            assert sp[f"v{i}"] == float(v), v


def test_direct_cast_divergence_is_real():
    """Pin the motivating bug: DuckDB's direct hugeint->double CAST is
    NOT the true nearest double for this value (Python/Spark round
    correctly) — the reason the primitive exists."""
    v = 106705227903395487431
    got = duckdb.connect().execute(
        f"SELECT CAST(CAST('{v}' AS HUGEINT) AS DOUBLE)"
    ).fetchone()[0]
    assert _bits(got) != _bits(float(v))


def test_wide_halfup_div_cross_engine_exact(spark):
    """wide_halfup_div_sql: exact half-up p/q with 128-bit quotients on
    both engines, equal to Python's integer formula — the quantizer for
    statistics whose terms outgrow both int64 DIV and float floor."""
    from de4ml_spark.operators.portable_hash import wide_halfup_div_sql

    random.seed(31)
    cases = [
        (10**34, 7),
        (2**100, 8),
        (10**30 + 1, 3),
        (5, 2),
        (7, 2),
        (0, 9),
        (2**89, 1),
    ]
    cases += [
        (random.randrange(0, 10**34), random.randrange(1, 10**12))
        for _ in range(30)
    ]
    sq = ", ".join(
        "CAST("
        + wide_halfup_div_sql(
            "CAST(%r AS DECIMAL(38,0))" % str(p), str(q), "DIV"
        )
        + f" AS STRING) AS v{i}"
        for i, (p, q) in enumerate(cases)
    )
    dq = ", ".join(
        "CAST("
        + wide_halfup_div_sql(
            "CAST(%r AS HUGEINT)" % str(p), str(q), "//"
        )
        + f" AS VARCHAR) AS v{i}"
        for i, (p, q) in enumerate(cases)
    )
    sp = spark.sql(f"SELECT {sq}").collect()[0]
    du = duckdb.connect().execute(f"SELECT {dq}").fetchone()
    for i, (p, q) in enumerate(cases):
        want = (2 * p + q) // (2 * q)
        assert int(sp[f"v{i}"].split(".")[0]) == want, (p, q)
        assert int(du[i]) == want, (p, q)
