"""Incremental view maintenance for equi-join views over versioned
tables — the batch analogue of the reference's Materialize tier
(join-service maintains a streaming join incrementally; this maintains
the same join shape from snapshot CDF deltas).

The view V = A ⋈_k B is itself a versioned table. ``maintain_join_view``
advances it from (a_from, b_from) to (a_to, b_to) WITHOUT recomputing
the join: with ``ka`` / ``kb`` the tables' primary keys and ``on`` the
join column,

    V_new = (V_old where a-key unchanged and b-key unchanged)
          ∪ A_new[changed a-keys] ⋈ B_new
          ∪ A_new[unchanged]      ⋈ B_new[changed b-keys]

(updates are delete+insert, so "changed" = inserted|updated|deleted keys
from ``snapshot_diff``; deleted keys simply never re-enter). Every term
is bounded by CHURN x join fan-out, not table size — the property that
matters when A and B are 100 TB facts and a maintenance cycle touches a
few million keys: two anti-joins against broadcastable changed-key sets
plus two churn-sized equi-joins, while a full recompute re-shuffles both
tables. Equality with the from-scratch join is pinned in
tests/test_ivm.py.

The maintained view commits as a new snapshot of its own versioned
table, so readers get atomic visibility and time travel over
maintenance cycles, like every other table in etl/versioned.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from de4ml_spark.etl import versioned as vt


def join_view(a: DataFrame, b: DataFrame, on: str) -> DataFrame:
    """The view definition: plain inner equi-join with B's columns
    prefixed to avoid collisions (deterministic column set)."""
    b_ren = b.select(
        F.col(on),
        *[
            F.col(c).alias(f"b_{c}")
            for c in b.columns
            if c != on
        ],
    )
    return a.join(b_ren, on)


def _changed_keys(
    spark: SparkSession, root: str, v_from: int, v_to: int, key: str
) -> DataFrame:
    """Distinct primary keys that changed between two snapshots (insert,
    update, or delete), as a one-column frame."""
    if v_from == v_to:
        return vt.read(spark, root, v_to).select(key).limit(0)
    return (
        vt.snapshot_diff(spark, root, v_from, v_to, key=key)
        .select(key)
        .distinct()
    )


def maintain_join_view(
    spark: SparkSession,
    a_root: str,
    b_root: str,
    view_root: str,
    on: str,
    ka: str,
    kb: str,
    a_from: int,
    a_to: int,
    b_from: int,
    b_to: int,
) -> int:
    """Advance the maintained view of ``A ⋈_on B`` from the (a_from,
    b_from) snapshot pair to (a_to, b_to) by delta-join algebra; commits
    and returns the new view version."""
    a_new = vt.read(spark, a_root, a_to)
    b_new = vt.read(spark, b_root, b_to)
    da = _changed_keys(spark, a_root, a_from, a_to, ka)
    db = _changed_keys(spark, b_root, b_from, b_to, kb)

    v_old = vt.read(spark, view_root)
    # retained: old rows whose contributing a-row AND b-row are unchanged
    retained = v_old.join(F.broadcast(da), ka, "left_anti").join(
        F.broadcast(db.withColumnRenamed(kb, f"b_{kb}") if kb != on else db),
        f"b_{kb}" if kb != on else kb,
        "left_anti",
    )
    # re-derived: changed a-rows against the full new B...
    from_da = join_view(a_new.join(F.broadcast(da), ka, "left_semi"), b_new, on)
    # ...plus unchanged a-rows against changed b-rows (no double count)
    b_changed = b_new.join(F.broadcast(db), kb, "left_semi")
    from_db = join_view(
        a_new.join(F.broadcast(da), ka, "left_anti"), b_changed, on
    )
    new_view = retained.unionByName(from_da).unionByName(from_db)
    return vt.commit(spark, view_root, new_view)


def bootstrap_join_view(
    spark: SparkSession,
    a_root: str,
    b_root: str,
    view_root: str,
    on: str,
) -> int:
    """Initial full computation of the view (the only full join ever
    run); subsequent advances go through ``maintain_join_view``."""
    return vt.commit(
        spark,
        view_root,
        join_view(vt.read(spark, a_root), vt.read(spark, b_root), on),
    )
