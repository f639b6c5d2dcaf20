"""Profile -> regenerated contract artifact (reference parity with
dataops/app/profile.py:50-59): the emitted module must import clean,
round-trip its RULES back into the engine's Rule list, and its pure-
python validate() must agree row-for-row with the Spark split_valid
path on the same rules."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from de4ml_spark.contracts.codegen import (
    generate_contract_module,
    load_module,
    rules_from_module,
    write_contract_module,
)
from de4ml_spark.contracts.validation import (
    BOUNDS,
    REQUIRED,
    Rule,
    split_valid,
)

STRUCT = T.StructType(
    [
        T.StructField("age", T.LongType()),
        T.StructField("salary", T.DoubleType()),
        T.StructField("name", T.StringType()),
    ]
)

RULES = [
    Rule(loc="age", kind=REQUIRED),
    Rule(loc="age", kind=BOUNDS, lo=0.0, hi=120.0),
    Rule(loc="salary", kind=BOUNDS, lo=0.0, hi=None),
]


def test_generated_module_roundtrip(tmp_path):
    path = str(tmp_path / "contracts_gen.py")
    src = write_contract_module(path, "AgrawalRequest", STRUCT, RULES)
    assert "AUTO-GENERATED" in src
    mod = load_module(path)
    # dataclass shape: required field positional, optional defaulted
    inst = mod.AgrawalRequest(age=30)
    assert inst.salary is None and inst.name is None
    assert mod.CONSTRAINTS["age"]["required"] is True
    assert mod.CONSTRAINTS["age"]["maximum"] == 120.0
    assert mod.CONSTRAINTS["salary"]["minimum"] == 0.0
    assert rules_from_module(mod) == RULES


def test_custom_rules_recorded_not_emitted(spark, tmp_path):
    from de4ml_spark.contracts.validation import CUSTOM

    rules = RULES + [
        Rule(loc="name", kind=CUSTOM, predicate=F.col("name") != "")
    ]
    path = tmp_path / "c2.py"
    path.write_text(generate_contract_module("M", STRUCT, rules))
    mod = load_module(str(path), modname="generated_contract_c2")
    assert mod.SKIPPED_CUSTOM == ["name"]
    assert rules_from_module(mod) == RULES  # custom not round-tripped


def test_validate_agrees_with_spark_split(spark, tmp_path):
    rows = [
        {"age": 30, "salary": 100.0, "name": "a"},    # valid
        {"age": None, "salary": 1.0, "name": "b"},    # required fail
        {"age": 130, "salary": 1.0, "name": "c"},     # bounds fail
        {"age": 20, "salary": -5.0, "name": "d"},     # bounds fail
        {"age": 40, "salary": None, "name": None},    # null passes bounds
    ]
    path = str(tmp_path / "c3.py")
    write_contract_module(path, "M", STRUCT, RULES)
    mod = load_module(path, modname="generated_contract_c3")
    py_valid = [not mod.validate(r) for r in rows]

    df = spark.createDataFrame(
        [tuple(r[f.name] for f in STRUCT.fields) for r in rows], STRUCT
    )
    valid_df, rejects_df = split_valid(df, RULES)
    spark_valid_ages = {r["age"] for r in valid_df.collect()}
    for r, ok in zip(rows, py_valid):
        assert ok == (r["age"] in spark_valid_ages), r
    assert sum(py_valid) == valid_df.count()
    assert len(rows) - sum(py_valid) == rejects_df.count()


def test_required_after_optional_field_order(tmp_path):
    """A required column AFTER a nullable one in struct order must still
    produce an importable dataclass (non-default args cannot follow
    defaulted ones — the generator reorders required-first)."""
    struct = T.StructType(
        [
            T.StructField("note", T.StringType()),   # optional
            T.StructField("id", T.LongType()),       # required, later
        ]
    )
    rules = [Rule(loc="id", kind=REQUIRED)]
    path = str(tmp_path / "c4.py")
    write_contract_module(path, "M4", struct, rules)
    mod = load_module(path, modname="generated_contract_c4")
    inst = mod.M4(7)  # positional: required field leads
    assert inst.id == 7 and inst.note is None
    assert mod.CONSTRAINTS["note"]["required"] is False
