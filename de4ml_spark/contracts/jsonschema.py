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
    # (jsonschema.py:121-122): a Spark type string — either the JSON
    # type-name form ("integer", "decimal(12,2)"; parsed pure-Python, no
    # JVM needed) or any DDL string ("int", "map<string,int>"; needs an
    # active SparkContext for the DDL parser).
    if "spark_type" in schema:
        try:
            return T._parse_datatype_json_value(schema["spark_type"])
        except Exception:
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


_PRIMITIVES_INV: dict[type, str] = {
    T.LongType: "integer",
    T.DoubleType: "number",
    T.StringType: "string",
    T.BooleanType: "boolean",
}


def _from_datatype(dt: T.DataType) -> dict[str, Any]:
    if type(dt) in _PRIMITIVES_INV:
        return {"type": _PRIMITIVES_INV[type(dt)]}
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _from_datatype(dt.elementType)}
    if isinstance(dt, T.StructType):
        out: dict[str, Any] = {
            "type": "object",
            "properties": {
                f.name: _from_datatype(f.dataType) for f in dt.fields
            },
        }
        required = [f.name for f in dt.fields if not f.nullable]
        if required:
            out["required"] = required
        return out
    # types outside the reference's JSON-Schema surface (decimal, date,
    # timestamp, map, binary, narrow ints, ...) round-trip through the
    # ``spark_type`` escape hatch — the export-side mirror of the
    # reference's verbatim `duckdb_type` passthrough (jsonschema.py:121-122).
    # Atomic types export in JSON type-name form (parses back without a
    # JVM); anything else falls back to the DDL string.
    import json as _json

    jval = _json.loads(dt.json())
    return {"spark_type": jval if isinstance(jval, str) else dt.simpleString()}


def to_json_schema(struct: T.StructType, title: str | None = None) -> dict[str, Any]:
    """Export a ``StructType`` contract as a JSON Schema dict — the reverse
    of ``struct_from_json_schema``, mirroring the reference's contract ->
    JSON Schema export direction (Pydantic models exported through OpenAPI,
    logging-service/app/lib/jsonschema.py:59-89, driven by migrate.py:33-35).

    Nested structs are inlined (the importer accepts both inline objects
    and ``$ref``s, so inlining keeps the artifact self-contained);
    non-nullable fields become ``required``. Round-trip contract (pinned by
    property tests): ``struct_from_json_schema(to_json_schema(s)) == s``
    for every StructType, and re-export is a fixpoint."""
    out = _from_datatype(struct)
    if not isinstance(struct, T.StructType):
        raise ValueError("top-level contract must be a StructType")
    if title is not None:
        out = {"title": title, **out}
    return out


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
