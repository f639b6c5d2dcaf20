"""Profile -> regenerated contract ARTIFACT: emit a standalone Python
module (typed dataclass + field constraints + pure-python validator)
from a contract StructType and derived rules.

Reference parity: dataops/app/profile.py:50-59 regenerates
``app/contracts.py`` from the profile-derived JSON schema via
datamodel-code-generator (pydantic models with field_constraints). This
repo's engine keeps rules AS DATA (``validation.rules_from_profile`` —
the right engine design, SURVEY §3.3); this module closes the remaining
artifact gap: teams that want the checked-in, importable contract file
the reference ships get one, generated from the same rules, with zero
dependencies beyond the stdlib (the container has no pydantic — a plain
frozen dataclass plus an explicit CONSTRAINTS table carries the same
information).

The generated module round-trips: ``rules_from_module`` reloads the
emitted RULES table into the exact ``validation.Rule`` list it was
generated from (CUSTOM rules carry engine-side Column predicates and are
deliberately NOT emitted — the artifact documents the data contract, not
engine closures; the generator records their locs in SKIPPED_CUSTOM).
Its ``validate(row)`` replays REQUIRED/BOUNDS semantics row-at-a-time
(null passes bounds; required is separate) so edge services can reject
before rows ever reach Spark — the logging-service 422 path.
"""

from __future__ import annotations

from types import ModuleType

from pyspark.sql import types as T

from de4ml_spark.contracts.validation import BOUNDS, CUSTOM, REQUIRED, Rule

_PY_TYPES = {
    "long": "int",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "double": "float",
    "float": "float",
    "string": "str",
    "boolean": "bool",
    "date": "datetime.date",
    "timestamp": "datetime.datetime",
    "timestamp_ntz": "datetime.datetime",
    "binary": "bytes",
}


def _py_type(dt: T.DataType) -> str:
    return _PY_TYPES.get(dt.simpleString(), "object")


def generate_contract_module(
    name: str, struct: T.StructType, rules: list[Rule]
) -> str:
    """Source text of the regenerated contract module."""
    required = {r.loc for r in rules if r.kind == REQUIRED}
    bounds = {r.loc: (r.lo, r.hi) for r in rules if r.kind == BOUNDS}
    skipped = sorted(r.loc for r in rules if r.kind == CUSTOM)

    lines = [
        '"""AUTO-GENERATED contract module — regenerated from the profile',
        "by de4ml_spark.contracts.codegen (reference parity:",
        "dataops/app/profile.py:50-59). Do not edit by hand.",
        '"""',
        "",
        "from __future__ import annotations",
        "",
        "import datetime  # noqa: F401 — referenced by field annotations",
        "from dataclasses import dataclass",
        "from typing import Optional",
        "",
        "",
        "@dataclass(frozen=True)",
        f"class {name}:",
    ]
    if not struct.fields:
        lines.append("    pass")
    # dataclass rule: non-default fields cannot follow defaulted ones —
    # emit required fields first (a required column after a nullable one
    # in struct order would otherwise make the artifact unimportable)
    ordered = [f for f in struct.fields if f.name in required] + [
        f for f in struct.fields if f.name not in required
    ]
    for f in ordered:
        py = _py_type(f.dataType)
        ann = py if f.name in required else f"Optional[{py}]"
        default = "" if f.name in required else " = None"
        lines.append(f"    {f.name}: {ann}{default}")
    lines += [
        "",
        "",
        "CONSTRAINTS = {",
    ]
    for f in struct.fields:
        lo, hi = bounds.get(f.name, (None, None))
        lines.append(
            f"    {f.name!r}: {{'required': {f.name in required!r},"
            f" 'minimum': {lo!r}, 'maximum': {hi!r}}},"
        )
    lines += [
        "}",
        "",
        "# (loc, kind, lo, hi) tuples — reloadable via",
        "# de4ml_spark.contracts.codegen.rules_from_module",
        "RULES = [",
    ]
    for r in rules:
        if r.kind == CUSTOM:
            continue
        lines.append(f"    ({r.loc!r}, {r.kind!r}, {r.lo!r}, {r.hi!r}),")
    lines += [
        "]",
        "",
        f"SKIPPED_CUSTOM = {skipped!r}",
        "",
        "",
        "def validate(row: dict) -> list[str]:",
        '    """Violation labels loc:kind — REQUIRED/BOUNDS semantics',
        "    identical to the engine's Rule.valid_expr: null passes",
        '    bounds, required-ness is its own rule."""',
        "    out = []",
        "    for loc, kind, lo, hi in RULES:",
        "        v = row.get(loc)",
        "        if kind == 'required':",
        "            if v is None:",
        "                out.append(f'{loc}:required')",
        "        elif kind == 'bounds' and v is not None:",
        "            if (lo is not None and v < lo) or (",
        "                hi is not None and v > hi",
        "            ):",
        "                out.append(f'{loc}:bounds')",
        "    return out",
        "",
    ]
    return "\n".join(lines)


def write_contract_module(
    path: str, name: str, struct: T.StructType, rules: list[Rule]
) -> str:
    src = generate_contract_module(name, struct, rules)
    with open(path, "w") as f:
        f.write(src)
    return src


def load_module(path: str, modname: str = "generated_contract") -> ModuleType:
    """Import the generated artifact from a file path (no sys.path edits)."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    # register BEFORE exec: @dataclass resolves string annotations via
    # sys.modules[cls.__module__] at class-creation time
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def rules_from_module(mod: ModuleType) -> list[Rule]:
    """Reload the emitted RULES table into engine Rule objects."""
    return [
        Rule(loc=loc, kind=kind, lo=lo, hi=hi)
        for loc, kind, lo, hi in mod.RULES
    ]
