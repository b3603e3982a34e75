"""Helpers to assert plan properties (pushdown, pruning, broadcast).

Used by tests to keep the engine honest at scale: a filter that doesn't
reach the parquet scan or a dim join that shuffles instead of broadcasting
is a correctness-of-scale bug even when results match.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame as SparkDataFrame


def _unwrap(df) -> SparkDataFrame:
    from patito_spark.dataframe import DataFrame as PatitoDataFrame

    if isinstance(df, PatitoDataFrame):
        return df.inner
    return df


def executed_plan(df, execute: bool = False) -> str:
    """The physical plan string.

    Plan metadata (PushedFilters/ReadSchema) is rendered untruncated.
    With ``execute=True`` the plan is run first (noop sink) so AQE's final
    plan — including WholeStageCodegen spans — is visible.
    """
    sdf = _unwrap(df)
    spark = sdf.sparkSession
    previous = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        if execute:
            sdf.write.format("noop").mode("overwrite").save()
        return sdf._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", previous)


def pushed_filters(df) -> list[str]:
    """Filters pushed into the datasource scan (``PushedFilters: [...]``)."""
    plan = executed_plan(df)
    out: list[str] = []
    for match in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = match.group(1).strip()
        if body:
            out.extend(part.strip() for part in body.split(","))
    return out


def read_schema_columns(df) -> set[str]:
    """Columns actually read from the datasource (``ReadSchema``)."""
    plan = executed_plan(df)
    columns: set[str] = set()
    for match in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in match.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                columns.add(name)
    return columns


def scan_count(df) -> int:
    """Number of datasource scans in the plan (re-reads of the input)."""
    return len(re.findall(r"FileScan|BatchScan", executed_plan(df)))


def has_broadcast_join(df) -> bool:
    """True if the plan contains at least one broadcast join."""
    plan = executed_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def formatted_explain(df) -> str:
    """The 'formatted' explain output (includes codegen span ids)."""
    sdf = _unwrap(df)
    jvm = sdf.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        sdf._jdf.queryExecution(), "formatted"
    )


def has_whole_stage_codegen(df) -> bool:
    """True if the plan contains whole-stage-codegen spans.

    AQE wraps the plan and defers codegen until execution, so the logical
    plan is re-planned once with AQE off purely for inspection.
    """
    sdf = _unwrap(df)
    spark = sdf.sparkSession
    previous = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # selectExpr("*") forces a fresh QueryExecution under current confs
        plan = (
            sdf.selectExpr("*")._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", previous)
    # codegen stages render as `*(N) Operator` in plan text
    return bool(re.search(r"\*\(\d+\)", plan)) or "WholeStageCodegen" in plan
