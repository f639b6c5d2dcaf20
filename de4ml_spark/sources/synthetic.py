"""Deterministic synthetic data source (S12 parity).

Reference: dataops/locustfile.py:9-17 feeds ``/collect`` from River's
``synth.Agrawal(seed=1729)`` — a classic loan-approval generator. This is a
self-contained deterministic generator with the same nine-column schema and
comparable value ranges (FIXTURES.md §5); any seeded numeric generator
satisfies the parity contract, which is at the schema/distribution level.

``dirty_fraction`` injects out-of-bounds values and nulls so the
profile -> rules -> violation-counts loop has something to catch.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

AGRAWAL_SCHEMA = (
    "salary DOUBLE, commission DOUBLE, age INT, elevel INT, car INT, "
    "zipcode INT, hvalue INT, hyears INT, loan DOUBLE"
)


def agrawal_rows(n: int, seed: int = 1729, dirty_fraction: float = 0.0) -> list[tuple]:
    rng = np.random.RandomState(seed)
    salary = rng.uniform(20_000, 150_000, n)
    commission = np.where(salary >= 75_000, 0.0, rng.uniform(10_000, 75_000, n))
    age = rng.randint(20, 81, n)
    elevel = rng.randint(0, 5, n)
    car = rng.randint(1, 21, n)
    zipcode = rng.randint(0, 9, n)
    hvalue = (zipcode * 50_000 + rng.uniform(0.5, 1.5, n) * 100_000).astype(int)
    hyears = rng.randint(1, 31, n)
    loan = rng.uniform(0, 500_000, n)

    rows = []
    n_dirty = int(n * dirty_fraction)
    for i in range(n):
        row = [
            float(salary[i]), float(commission[i]), int(age[i]), int(elevel[i]),
            int(car[i]), int(zipcode[i]), int(hvalue[i]), int(hyears[i]),
            float(loan[i]),
        ]
        if i < n_dirty:
            # deterministic corruption: cycle bound-violations and nulls
            mode = i % 3
            if mode == 0:
                row[0] = -1.0  # salary below any observed minimum
            elif mode == 1:
                row[2] = 200  # age above any observed maximum
            else:
                row[8] = None  # loan null (violates required if 0%-null)
        rows.append(tuple(row))
    return rows


def agrawal_frame(
    spark: SparkSession, n: int, seed: int = 1729, dirty_fraction: float = 0.0
) -> DataFrame:
    return spark.createDataFrame(
        agrawal_rows(n, seed, dirty_fraction), AGRAWAL_SCHEMA
    )
