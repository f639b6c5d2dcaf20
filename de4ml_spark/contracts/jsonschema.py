"""JSON-Schema <-> Spark StructType conversion and ``__``-flatten manifests.

Parity targets (citations relative to /root/reference/):
- Type mapping table: logging-service/app/lib/jsonschema.py:112-135
  (integer->BIGINT, number->DOUBLE, string->VARCHAR, boolean->BOOLEAN,
  free-form object->JSON, $ref->STRUCT, array->T[]).
- Flattened-column naming (``a__b`` paths): logging-service/app/migrate.py:13-29;
  consumed by the ETL flattener at logging-service/app/etl.py:43-65.
- Additive-only schema evolution (columns appended, never dropped/retyped):
  logging-service/app/migrate.py:59-72.

The reference builds DuckDB type strings; we build ``StructType`` and let
``F.from_json`` + Catalyst handle parse and projection JVM-side.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

_PRIMITIVES: dict[str, T.DataType] = {
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
}


def _resolve_ref(ref: str, defs: dict[str, Any]) -> dict[str, Any]:
    name = ref.rsplit("/", 1)[-1]
    if name not in defs:
        raise KeyError(f"unresolved $ref: {ref}")
    return defs[name]


def _to_datatype(schema: dict[str, Any], defs: dict[str, Any]) -> T.DataType:
    if "$ref" in schema:
        return _to_datatype(_resolve_ref(schema["$ref"], defs), defs)
    # escape hatch mirroring the reference's `duckdb_type` passthrough
    # (jsonschema.py:121-122): a verbatim Spark DDL type string.
    if "spark_type" in schema:
        return T._parse_datatype_string(schema["spark_type"])
    typ = schema.get("type")
    if typ == "array":
        return T.ArrayType(_to_datatype(schema.get("items", {}), defs))
    if typ == "object" or "properties" in schema:
        props = schema.get("properties")
        if not props:
            # free-form object -> raw JSON text (reference maps to JSON type)
            return T.StringType()
        required = set(schema.get("required", []))
        fields = [
            T.StructField(name, _to_datatype(sub, defs), nullable=name not in required)
            for name, sub in props.items()
        ]
        return T.StructType(fields)
    if typ in _PRIMITIVES:
        return _PRIMITIVES[typ]
    raise ValueError(f"unsupported JSON-Schema node: {schema!r}")


def struct_from_json_schema(schema: dict[str, Any]) -> T.StructType:
    """Convert a JSON Schema (with optional ``$defs``/``definitions``) to a
    ``StructType`` suitable for ``F.from_json``.
    """
    defs = {**schema.get("definitions", {}), **schema.get("$defs", {})}
    dt = _to_datatype(schema, defs)
    if not isinstance(dt, T.StructType):
        raise ValueError("top-level schema must be an object")
    return dt


def flatten_manifest(struct: T.StructType, prefix: str = "") -> list[str]:
    """Enumerate flattened ``__``-joined column paths, mirroring the
    reference's manifest generation (migrate.py:13-29).

    - nested struct leaf ``a.b``      -> ``a__b``
    - array<struct> leaf ``arr.f``    -> ``arr__f`` (parallel arrays per leaf,
      asserted shape: logging-service/tests/test_searches.py:64-67)
    - array<primitive> / primitives   -> the path itself
    """
    cols: list[str] = []
    for field in struct.fields:
        path = f"{prefix}{field.name}"
        dt = field.dataType
        if isinstance(dt, T.StructType):
            cols.extend(flatten_manifest(dt, prefix=f"{path}__"))
        elif isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
            for leaf in dt.elementType.fields:
                if isinstance(leaf.dataType, (T.StructType, T.ArrayType)):
                    raise ValueError(
                        f"nested containers inside array<struct> not supported "
                        f"at {path}.{leaf.name} (reference flattens one level)"
                    )
                cols.append(f"{path}__{leaf.name}")
        else:
            cols.append(path)
    return cols


def merge_manifests(old: list[str], new: list[str]) -> list[str]:
    """Additive-only manifest evolution (migrate.py:59-72): new columns are
    appended in order; existing columns keep their position; nothing is ever
    removed. Raises if a previously-manifested column disappeared from the
    new schema (the reference never drops/retypes columns).
    """
    new_set = set(new)
    missing = [c for c in old if c not in new_set]
    if missing:
        raise ValueError(f"additive-only evolution violated; dropped: {missing}")
    seen = set(old)
    return list(old) + [c for c in new if c not in seen]
