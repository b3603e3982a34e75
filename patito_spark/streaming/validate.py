"""Model-aware Structured Streaming helpers.

Batch validation can scan; a stream cannot. So on streams the model's
row-level checks compile to a *filter/annotate* projection (per-record,
fused into the stream pipeline) instead of the batch single-pass aggregate:
invalid rows are either dropped or routed by a ``__pt_valid`` flag, and
schema checks happen once at stream definition (driver-side, free).
"""

from __future__ import annotations

from typing import Optional, TYPE_CHECKING

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

if TYPE_CHECKING:
    from patito_spark.model import Model


def row_validity_column(schema: type["Model"]) -> Column:
    """Boolean Column: True where the row satisfies all model row checks.

    Reuses the validators' check compiler so stream and batch semantics
    can't drift. Uniqueness is inherently cross-row and is NOT included —
    use :func:`stateful_dedup_stream` for streaming dedup.
    """
    from patito_spark.validators import _bound_checks, _constraint_columns

    predicate = F.lit(True)
    for name, spec in schema.column_specs.items():
        col = F.col(name)
        if not spec.nullable:
            predicate = predicate & col.isNotNull()
        if spec.enum_values is not None:
            predicate = predicate & (col.isNull() | col.isin(spec.enum_values))
        checks = _bound_checks(spec, col)
        constraint_checks, needs_alias = _constraint_columns(spec)
        if needs_alias:
            raise ValueError(
                f"Streaming validation of column {spec.name!r}: `_` self-"
                "references are not supported on streams; name the column "
                "explicitly in the constraint."
            )
        checks.extend(constraint_checks)
        for check in checks:
            predicate = predicate & (col.isNull() | F.coalesce(check, F.lit(False)))
    return predicate


def read_stream(
    path_or_format: str,
    schema: type["Model"],
    spark: Optional[SparkSession] = None,
    drop_invalid: bool = False,
    format: Optional[str] = None,
    **options,
) -> DataFrame:
    """``readStream`` with the model's schema and per-record validation.

    Returns a streaming DataFrame; invalid rows are dropped
    (``drop_invalid=True``) or annotated with ``__pt_valid`` for routing to
    a dead-letter sink.
    """
    from patito_spark.session import active_session

    spark = spark or active_session()
    reader = spark.readStream.options(**options)
    if format is not None:
        stream = reader.format(format).schema(schema.spark_schema).load(
            path_or_format
        )
    else:
        stream = reader.schema(schema.spark_schema).parquet(path_or_format)
    valid = row_validity_column(schema)
    if drop_invalid:
        return stream.filter(valid)
    return stream.withColumn("__pt_valid", valid)


def windowed_aggregate(
    stream: DataFrame,
    ts_col: str,
    window_duration: str,
    *aggs: Column,
    watermark: str = "10 minutes",
    group_by: Optional[list[str]] = None,
    slide_duration: Optional[str] = None,
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation.

    The watermark bounds state: late records beyond it are dropped and
    completed windows are evicted, so state size is O(active windows), not
    O(stream length).
    """
    keys = [
        F.window(F.col(ts_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(ts_col), window_duration)
    ]
    for key in group_by or []:
        keys.append(F.col(key))
    return stream.withWatermark(ts_col, watermark).groupBy(*keys).agg(*aggs)


def stateful_dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Exactly-once-per-key dedup within the watermark horizon.

    Uses Spark's built-in ``dropDuplicatesWithinWatermark``: state holds one
    entry per key and is evicted once the watermark passes, so memory is
    bounded by the number of distinct keys per horizon — the streaming
    analogue of batch ``dedup_exact``.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
