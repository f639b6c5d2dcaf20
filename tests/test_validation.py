"""Validation rules-as-data tests (parity: reject path of
logging-service/tests/test_searches.py:71-79 + dataops counter labels
dataops/app/api.py:65-67)."""

from __future__ import annotations

from de4ml_spark.planaudit import final_plan

from pyspark.sql import functions as F

from de4ml_spark.contracts import Rule, violation_counts
from de4ml_spark.contracts.validation import split_valid


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 0.5, "a"),     # valid
            (2, 1.5, "b"),     # probability out of bounds
            (3, None, "c"),    # probability missing
            (4, 0.1, None),    # action missing
        ],
        "id BIGINT, probability DOUBLE, action STRING",
    )


RULES = [
    Rule(loc="probability", kind="required"),
    Rule(loc="probability", kind="bounds", lo=0.0, hi=1.0),
    Rule(loc="action", kind="required"),
]


def test_split_valid_rejects(spark):
    valid, rejects = split_valid(_df(spark), RULES)
    assert sorted(r["id"] for r in valid.collect()) == [1]
    rej = {r["id"]: [ (v["loc"], v["type"]) for v in r["_violations"]] for r in rejects.collect()}
    assert rej[2] == [("probability", "bounds")]
    assert rej[3] == [("probability", "required")]
    assert rej[4] == [("action", "required")]


def test_violation_counts_labels(spark):
    counts = {
        (r["loc"], r["type"]): r["n_violations"]
        for r in violation_counts(_df(spark), RULES).collect()
    }
    assert counts == {
        ("probability", "bounds"): 1,
        ("probability", "required"): 1,
        ("action", "required"): 1,
    }


def test_null_passes_bounds_but_fails_required(spark):
    # bounds rules ignore nulls; required-ness is its own rule
    only_bounds = [Rule(loc="probability", kind="bounds", lo=0.0, hi=1.0)]
    valid, rejects = split_valid(_df(spark), only_bounds)
    assert sorted(r["id"] for r in valid.collect()) == [1, 3, 4]


def test_custom_predicate_rule(spark):
    rules = [
        Rule(loc="action", kind="custom", predicate=F.col("action").isin("a", "b"))
    ]
    valid, _ = split_valid(_df(spark), rules)
    assert sorted(r["id"] for r in valid.collect()) == [1, 2]


def test_single_pass_no_shuffle(spark):
    """N rules must compile to one projection — no Exchange, no Python."""
    from de4ml_spark.contracts.validation import apply_rules

    plan = final_plan(apply_rules(_df(spark), RULES))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_custom_rule_with_pandas_udf(spark):
    """SURVEY §2.8: arbitrary Python validators plug in as Arrow-vectorized
    pandas_udf predicates when a rule isn't expressible as a Column — the
    'any custom validation rules you can imagine' capability
    (logging-service/README.md:23-26)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from de4ml_spark.contracts.validation import Rule, split_valid

    # no type hints: this module uses `from __future__ import annotations`,
    # which stringifies them and breaks pandas_udf signature inference
    def _pred(s):
        return s.map(lambda x: x is None or x != x[::-1])

    is_palindrome_free = pandas_udf(_pred, "boolean")

    df = spark.createDataFrame(
        [(1, "abc"), (2, "aba"), (3, "xy"), (4, None)],
        "id BIGINT, code STRING",
    )
    rules = [
        Rule(loc="code", kind="custom", predicate=is_palindrome_free("code")),
    ]
    valid, rejects = split_valid(df, rules)
    assert {r["id"] for r in valid.collect()} == {1, 3, 4}
    assert {r["id"] for r in rejects.collect()} == {2}


def test_finite_rule_rejects_ieee_specials(spark):
    """FINITE rule (round 14): NaN/+-Inf are explicit contract
    violations — BOUNDS alone lets NaN pass a lo-only bound because
    Spark orders NaN greater than everything. NULL passes (required-
    ness is a separate rule); the scan-side twin is load_table's
    finite-guard on events.value."""
    from de4ml_spark.contracts.validation import Rule, split_valid

    df = spark.createDataFrame(
        [
            (1, 5.0),
            (2, float("nan")),
            (3, float("inf")),
            (4, float("-inf")),
            (5, None),
        ],
        "id BIGINT, v DOUBLE",
    )
    # lo-only bound: NaN >= 0 is TRUE in Spark — bounds alone misses it
    bounds_only = [Rule(loc="v", kind="bounds", lo=0.0)]
    valid, _ = split_valid(df, bounds_only)
    assert {r["id"] for r in valid.collect()} == {1, 2, 3, 5}

    rules = bounds_only + [Rule(loc="v", kind="finite")]
    valid, rejects = split_valid(df, rules)
    assert {r["id"] for r in valid.collect()} == {1, 5}
    assert {(r["id"], r["_violations"][0]["type"]) for r in rejects.collect()} == {
        (2, "finite"),
        (3, "finite"),
        (4, "bounds"),  # -inf fails the lo bound first; finite also fires
    }


def test_rules_from_profile_emit_finite(spark):
    """Profile-derived rules include the FINITE guard for numeric
    columns so a corrupt-float shard is rejected at ingest, not
    propagated into training data."""
    from de4ml_spark.contracts.validation import rules_from_profile

    prof = [
        {
            "column_name": "v",
            "null_percentage": 10.0,
            "is_numeric": True,
            "min": 1.0,
            "max": 9.0,
        }
    ]
    kinds = {(r.loc, r.kind) for r in rules_from_profile(prof)}
    assert ("v", "bounds") in kinds and ("v", "finite") in kinds
