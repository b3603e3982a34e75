"""Model-aware readers/writers (ref polars.py:614-679 generalized).

Scale notes: the model schema is handed to the Spark reader so parquet scans
prune to exactly the model's columns (``ReadSchema`` in the plan) and CSV/JSON
parsing skips schema inference (which costs an extra full pass at 100 TB).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, TYPE_CHECKING

from pyspark.sql import SparkSession

if TYPE_CHECKING:
    from patito_spark.dataframe import DataFrame
    from patito_spark.model import Model


def _session(spark: Optional[SparkSession]) -> SparkSession:
    from patito_spark.session import active_session

    return spark or active_session()


def _finalize(sdf, model: type["Model"]) -> "DataFrame":
    from patito_spark.dataframe import DataFrame as PatitoDataFrame

    return PatitoDataFrame(sdf, model=model).derive()


def read_csv(
    path: str,
    model: type["Model"],
    spark: Optional[SparkSession] = None,
    header: bool = True,
    **options: Any,
) -> "DataFrame":
    """Read CSV with the model's schema.

    With ``header=False`` the model's field order provides the column names
    (ref polars.py:614-679). ``derived_from`` fields are populated.
    """
    spark = _session(spark)
    derived = set(model.derived_columns)
    reader = spark.read.options(**options)
    if header:
        # Derived columns may be sourced from arbitrarily-named raw columns,
        # so only force dtypes of direct model columns after the read.
        sdf = reader.csv(path, header=True, inferSchema=False)
        from pyspark.sql import functions as F

        casts = [
            F.col(name).cast(spec.spark_type).alias(name)
            if name in sdf.columns and name not in derived
            else F.col(name)
            for name, spec in model.column_specs.items()
            if name in sdf.columns
        ]
        others = [F.col(c) for c in sdf.columns if c not in model.columns]
        sdf = sdf.select(*casts, *others)
    else:
        schema_fields = [
            spec.struct_field
            for name, spec in model.column_specs.items()
            if name not in derived
        ]
        from pyspark.sql.types import StructType

        sdf = reader.csv(path, header=False, schema=StructType(schema_fields))
    return _finalize(sdf, model)


def read_parquet(
    path: str,
    model: type["Model"],
    spark: Optional[SparkSession] = None,
    prune: bool = True,
    **options: Any,
) -> "DataFrame":
    """Read parquet; project to the model's columns so the scan prunes."""
    spark = _session(spark)
    sdf = spark.read.options(**options).parquet(path)
    derived = set(model.derived_columns)
    if prune:
        keep = [c for c in model.columns if c in sdf.columns and c not in derived]
        extra_sources = {
            src for src in model.derived_columns.values() if isinstance(src, str)
        }
        keep += [c for c in sdf.columns if c in extra_sources and c not in keep]
        if keep:
            sdf = sdf.select(*keep)
    return _finalize(sdf, model)


def read_orc(
    path: str,
    model: type["Model"],
    spark: Optional[SparkSession] = None,
    prune: bool = True,
    **options: Any,
) -> "DataFrame":
    """Read ORC; project to the model's columns so the scan prunes."""
    spark = _session(spark)
    sdf = spark.read.options(**options).orc(path)
    derived = set(model.derived_columns)
    if prune:
        keep = [c for c in model.columns if c in sdf.columns and c not in derived]
        extra_sources = {
            src for src in model.derived_columns.values() if isinstance(src, str)
        }
        keep += [c for c in sdf.columns if c in extra_sources and c not in keep]
        if keep:
            sdf = sdf.select(*keep)
    return _finalize(sdf, model)


def write_orc(
    df,
    path: str,
    partition_by: Optional[list[str]] = None,
    mode: str = "error",
    validate: bool = False,
    **options: Any,
) -> None:
    """Write a (model-)DataFrame to ORC, optionally validating first."""
    from patito_spark.dataframe import DataFrame as PatitoDataFrame

    if isinstance(df, PatitoDataFrame):
        if validate:
            df.validate()
        sdf = df.inner
    else:
        sdf = df
    writer = sdf.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_json(
    path: str,
    model: type["Model"],
    spark: Optional[SparkSession] = None,
    **options: Any,
) -> "DataFrame":
    """Read JSON-lines with the model schema (no inference pass)."""
    spark = _session(spark)
    derived = set(model.derived_columns)
    from pyspark.sql.types import StructType

    schema = StructType(
        [
            spec.struct_field
            for name, spec in model.column_specs.items()
            if name not in derived
        ]
    )
    sdf = spark.read.options(**options).json(path, schema=schema)
    return _finalize(sdf, model)


def write_clustered(
    df,
    path: str,
    cluster_by: "Sequence[str]",
    num_files: Optional[int] = None,
    mode: str = "error",
) -> None:
    """Range-clustered parquet write: the file-skipping layout.

    ``repartitionByRange(cluster_by)`` + ``sortWithinPartitions`` gives
    each output file a narrow, non-overlapping min/max range on the
    cluster keys, so selective reads skip whole files/row-groups via
    parquet statistics — the single biggest lever for selective scans
    over an unpartitioned 100 TB table (cheaper than directory
    partitioning when the key is high-cardinality, and composable with
    it). The sort is partition-local: one range shuffle, no global sort.
    """
    cluster_by = list(cluster_by)
    out = (
        df.repartitionByRange(num_files, *cluster_by)
        if num_files
        else df.repartitionByRange(*cluster_by)
    )
    out.sortWithinPartitions(*cluster_by).write.mode(mode).parquet(path)


def read_binary_files(
    path: str,
    glob: Optional[str] = None,
    spark: Optional[SparkSession] = None,
    with_metadata: bool = True,
    **options: Any,
):
    """Ingest raw files (images/audio/video/docs) as binary rows.

    Spark's ``binaryFile`` source: each file becomes one row of
    ``path, modificationTime, length, content (binary)`` — the input
    shape for :mod:`patito_spark.operators.multimodal` (decode /
    feature-extract run as Arrow-batched ``mapInPandas`` over
    ``content``). ``with_metadata`` appends ``file_name`` and
    ``file_ext`` columns parsed from the path (codegen projection).

    Scale notes: the source parallelizes per file and supports
    ``pathGlobFilter`` pushdown (pass ``glob``); files larger than
    ``spark.sql.sources.binaryFile.maxLength`` (default 2 GiB) raise —
    shard such assets upstream.
    """
    from pyspark.sql import functions as F

    spark = _session(spark)
    reader = spark.read.format("binaryFile").options(**options)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    sdf = reader.load(path)
    if with_metadata:
        name = F.element_at(F.split(F.col("path"), "/"), -1)
        sdf = sdf.withColumn("file_name", name).withColumn(
            "file_ext",
            F.when(
                name.contains("."),
                F.element_at(F.split(name, r"\."), -1),
            ).otherwise(F.lit(None).cast("string")),
        )
    return sdf


def write_parquet(
    df,
    path: str,
    partition_by: Optional[list[str]] = None,
    mode: str = "error",
    validate: bool = False,
    **options: Any,
) -> None:
    """Write a (model-)DataFrame to parquet, optionally validating first."""
    from patito_spark.dataframe import DataFrame as PatitoDataFrame

    if isinstance(df, PatitoDataFrame):
        if validate:
            df.validate()
        sdf = df.inner
    else:
        sdf = df
    writer = sdf.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: Optional[list[str]] = None,
    mode: str = "overwrite",
    validate: bool = False,
    **options: Any,
) -> None:
    """Write as a bucketed (and optionally sorted) catalog table.

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle (and without even a sort if ``sort_by`` matches) —
    the co-located-join strategy for fact-to-fact joins repeated across a
    pipeline, where re-shuffling 100 TB per join is the dominant cost.
    """
    from patito_spark.dataframe import DataFrame as PatitoDataFrame

    if isinstance(df, PatitoDataFrame):
        if validate:
            df.validate()
        sdf = df.inner
    else:
        sdf = df
    writer = (
        sdf.write.mode(mode)
        .options(**options)
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)
