"""Physical-plan inspection helpers."""

from patito_spark.plans.explain import (
    executed_plan,
    formatted_explain,
    has_broadcast_join,
    has_whole_stage_codegen,
    pushed_filters,
    read_schema_columns,
    scan_count,
)

__all__ = [
    "executed_plan",
    "formatted_explain",
    "has_broadcast_join",
    "has_whole_stage_codegen",
    "pushed_filters",
    "read_schema_columns",
    "scan_count",
]
