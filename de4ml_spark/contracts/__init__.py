from de4ml_spark.contracts.jsonschema import (
    flatten_manifest,
    merge_manifests,
    struct_from_json_schema,
)
from de4ml_spark.contracts.validation import Rule, apply_rules, violation_counts

__all__ = [
    "struct_from_json_schema",
    "flatten_manifest",
    "merge_manifests",
    "Rule",
    "apply_rules",
    "violation_counts",
]
