"""DDL generation from contracts (S10 parity).

Reference: dataops/app/api.py:24-33 builds ``CREATE TABLE agrawal(c DOUBLE
/ INT ...)`` from Pydantic field types (float -> DOUBLE else INT). Here the
contract is a StructType (possibly from JSON Schema) and the DDL is Spark
SQL; nested types serialize via the type's own DDL form.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def column_ddl(struct: T.StructType) -> str:
    return ", ".join(
        f"{f.name} {f.dataType.simpleString().upper()}"
        + ("" if f.nullable else " NOT NULL")
        for f in struct.fields
    )


def create_table_sql(
    name: str,
    struct: T.StructType,
    using: str = "PARQUET",
    location: str | None = None,
    partitioned_by: list[str] | None = None,
) -> str:
    sql = f"CREATE TABLE IF NOT EXISTS {name} ({column_ddl(struct)}) USING {using}"
    if partitioned_by:
        sql += f" PARTITIONED BY ({', '.join(partitioned_by)})"
    if location:
        sql += f" LOCATION '{location}'"
    return sql


def create_table(
    spark: SparkSession,
    name: str,
    struct: T.StructType,
    location: str | None = None,
    partitioned_by: list[str] | None = None,
) -> None:
    spark.sql(create_table_sql(name, struct, location=location, partitioned_by=partitioned_by))


# --------------------------------------------------------------------------
# Contract diff -> migration DDL (migrate.py parity).
#
# The reference diffs the new OpenAPI-derived schemas against the saved
# current version in topological dependency order and appends only the new
# flattened columns to each table's manifest (logging-service/app/
# migrate.py:40-72) — additive-only, never dropping or retyping. Here the
# contract is a StructType; the diff walks nested paths to the same
# flattened ``a__b`` names, classifies every change, and emits the ALTER
# statement for the additive part. Non-additive changes (drops, retypes)
# are reported so callers can refuse them, exactly as merge_manifests
# raises on a dropped column.
# --------------------------------------------------------------------------


def _leaf_types(struct: T.StructType, prefix: str = "") -> dict[str, str]:
    out: dict[str, str] = {}
    for f in struct.fields:
        path = prefix + f.name
        dt = f.dataType
        if isinstance(dt, T.StructType):
            out.update(_leaf_types(dt, path + "__"))
        elif isinstance(dt, T.ArrayType) and isinstance(
            dt.elementType, T.StructType
        ):
            # array<struct> flattens one level into parallel arrays
            out.update(
                {
                    path + "__" + g.name: f"array<{g.dataType.simpleString()}>"
                    for g in dt.elementType.fields
                }
            )
        else:
            out[path] = dt.simpleString()
    return out


def diff_contracts(old: T.StructType, new: T.StructType) -> dict:
    """Structured diff of two contracts over their flattened leaf paths.

    Returns ``{"added": {path: type}, "removed": {path: type},
    "retyped": {path: (old_type, new_type)}, "compatible": bool}`` where
    compatible means the change is purely additive (the only evolution the
    reference's migrate flow permits)."""
    o, n = _leaf_types(old), _leaf_types(new)
    added = {p: t for p, t in n.items() if p not in o}
    removed = {p: t for p, t in o.items() if p not in n}
    retyped = {
        p: (o[p], n[p]) for p in o.keys() & n.keys() if o[p] != n[p]
    }
    return {
        "added": added,
        "removed": removed,
        "retyped": retyped,
        "compatible": not removed and not retyped,
    }


def alter_table_sql(name: str, diff: dict) -> str | None:
    """ALTER TABLE ... ADD COLUMNS for the additive part of a contract
    diff; None when there is nothing to add. Raises on non-additive diffs
    (the caller must build a new table instead — the reference's migrate
    only ever appends columns)."""
    if not diff["compatible"]:
        raise ValueError(
            "non-additive contract change: "
            f"removed={sorted(diff['removed'])} "
            f"retyped={sorted(diff['retyped'])}"
        )
    if not diff["added"]:
        return None
    cols = ", ".join(
        f"{p} {t.upper()}" for p, t in sorted(diff["added"].items())
    )
    return f"ALTER TABLE {name} ADD COLUMNS ({cols})"
