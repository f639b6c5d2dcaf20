"""``__``-path flattening of typed nested records to flat columnar schema.

Parity target: the generated flatten SELECT of logging-service/app/etl.py:41-65
— struct paths become ``a__b`` columns; arrays of structs become parallel
arrays per leaf (``results__score``), the shape asserted at
logging-service/tests/test_searches.py:64-67.

The reference needs a generated DuckDB MACRO per array leaf (etl.py:55-61,
a DuckDB issue-5005 workaround). Spark projects struct-array leaves natively:
``F.col("results.score")`` IS the parallel array — so the whole flatten plan
is a single ``select`` of native column expressions, fully codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from de4ml_spark.contracts.jsonschema import flatten_manifest


def _expr_for_path(struct: T.StructType, path: str) -> Column:
    """Column expression for one ``__``-manifest entry against ``struct``.

    Resolves ``a__b__c`` greedily against actual field names (field names may
    themselves contain underscores, so we match segments against the schema
    rather than naively splitting on ``__``).
    """
    parts: list[str] = []
    node: T.DataType = struct
    rest = path
    while rest:
        if not isinstance(node, T.StructType):
            if isinstance(node, T.ArrayType) and isinstance(
                node.elementType, T.StructType
            ):
                node = node.elementType
                continue
            raise ValueError(f"cannot resolve {path!r}: {rest!r} under non-struct")
        names = sorted((f.name for f in node.fields), key=len, reverse=True)
        hit = next(
            (n for n in names if rest == n or rest.startswith(n + "__")), None
        )
        if hit is None:
            raise ValueError(f"cannot resolve {path!r}: no field matches {rest!r}")
        parts.append(hit)
        node = next(f.dataType for f in node.fields if f.name == hit)
        rest = rest[len(hit) + 2 :]
    return F.col(".".join(parts)).alias(path)


def flatten_exprs(struct: T.StructType, manifest: list[str] | None = None) -> list[Column]:
    if manifest is None:
        manifest = flatten_manifest(struct)
    return [_expr_for_path(struct, p) for p in manifest]


def flatten(df: DataFrame, struct: T.StructType, manifest: list[str] | None = None) -> DataFrame:
    """Flatten typed columns of ``df`` (whose schema is ``struct``) to the
    manifest's flat columns. A manifest longer than the schema (columns from
    a newer schema version) yields nulls for the missing paths — the
    additive-evolution read contract (migrate.py:59-72).
    """
    if manifest is None:
        manifest = flatten_manifest(struct)
    exprs: list[Column] = []
    for p in manifest:
        try:
            exprs.append(_expr_for_path(struct, p))
        except ValueError:
            exprs.append(F.lit(None).alias(p))
    return df.select(*exprs)
