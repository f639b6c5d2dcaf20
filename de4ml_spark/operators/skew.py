"""Skew mitigation: salted join for hot-key joins.

Posture (SCALE.md): AQE's skew-join handling (enabled by default in
session.py) splits oversized sort-merge partitions at runtime and is the
first line of defense. Hand salting remains the escape hatch when AQE
cannot apply — broadcast-ineligible hot-key joins feeding stateful/windowed
downstreams, or deliberately partitioned writes where one key holds a
double-digit percent of all rows.

Mechanics: the big side gets a uniform random salt in [0, n_salts); the
small side is replicated n_salts times (explode over the salt range); the
join key becomes (key, salt), splitting each hot key's rows across n_salts
tasks. Row-level results are identical to the unsalted join (every big row
still meets every matching small row exactly once — on its own salt).
Shuffle volume of the small side grows by n_salts; pick n_salts ≈ the skew
factor, not more.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join with the big side salted and the small side replicated.

    Correct for join types where unmatched SMALL rows don't produce output
    (inner / left outer from the big side / left semi): replication would
    multiply unmatched-small output otherwise.
    """
    if how in ("right", "rightouter", "right_outer", "full", "fullouter", "outer"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated small "
            "side would emit unmatched rows once per salt"
        )
    keys = [on] if isinstance(on, str) else list(on)
    big_s = big.withColumn(
        SALT, F.floor(F.rand(seed) * n_salts).cast("int")
    )
    small_s = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [*keys, SALT], how).drop(SALT)
