"""Explicit key-salting for extreme join skew.

AQE's skew-join handling (on by default in the session factory) splits
oversized SHUFFLE PARTITIONS of a sort-merge join, which covers the
common case. Salting is the explicit tool for the case AQE cannot fix:
a SINGLE key so hot that even a split partition's rows all carry the
same join key and must meet the same build rows — e.g. a null-ish
sentinel id or a bot user owning 10% of a 100 TB fact table. Salting
rewrites the join key itself: the probe side scatters the hot key's
rows across ``n_salts`` sub-keys, the build side replicates its hot
rows once per sub-key, and the join becomes uniformly distributed by
construction. Replication cost is |hot build rows| x n_salts — bounded,
because only detected-hot keys replicate.

Detection is a bounded model fit (same posture as the IVF centroid
sample): one count-by-key pass keeping keys above ``hot_threshold``,
capped at the top 100 — a driver-side list of literals, not a plan
dependency. Pass ``hot_keys`` explicitly to skip the pass (the 100 TB
deployment would feed yesterday's heavy-hitter list).

Inner joins only: the salt column changes null-matching semantics for
outer joins, so the operator refuses them rather than silently
diverging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    hot_keys: list | None = None,
    hot_threshold: int = 100_000,
) -> DataFrame:
    """Inner equi-join ``big ⋈ small`` on ``key``, with detected (or
    given) hot keys salted across ``n_salts`` sub-keys. Result is
    row-identical to ``big.join(small, key)``."""
    if hot_keys is None:
        hot_keys = [
            r[0]
            for r in big.groupBy(key)
            .count()
            .filter(F.col("count") >= hot_threshold)
            .orderBy(F.desc("count"), F.asc(key))
            .limit(100)
            .collect()
            if r[0] is not None
        ]
    if not hot_keys:
        return big.join(small, key)
    is_hot = F.col(key).isin(hot_keys)
    # per-row content hash spreads a hot key's rows across salts; rows
    # with identical full content land on one salt (documented limit —
    # a table that is mostly one repeated row re-concentrates)
    bigs = big.withColumn(
        "__salt",
        F.when(
            is_hot, F.pmod(F.hash(*big.columns), F.lit(n_salts))
        ).otherwise(F.lit(0)),
    )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    smalls = small.withColumn(
        "__salt",
        F.explode(F.when(is_hot, salts).otherwise(F.array(F.lit(0)))),
    )
    return bigs.join(smalls, [key, "__salt"]).drop("__salt")
