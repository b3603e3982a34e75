"""patito_spark — data modeling, validation, and large-scale data-pipeline
operators for PySpark.

A Spark-native re-expression of the capabilities of the reference library
(`patito`: Polars + pydantic v1 + DuckDB): pydantic v2 models describe table
schemas, validation compiles to a single Spark aggregation job, and a
Relation/Database layer provides the reference's SQL-string query API on top
of Spark SQL / Catalyst.
"""

from pyspark.sql import Column, functions as F
from pyspark.sql.functions import col, lit

from patito_spark import exceptions, sql
from patito_spark.dataframe import DataFrame
from patito_spark.database import Database, Relation
from patito_spark.exceptions import DataFrameValidationError, ValidationError
from patito_spark.functions.cache import cache_scope, release_caches
from patito_spark.model import Field, Model
from patito_spark.session import active_session, get_session

# Subpackages re-exported for discoverability (pt.operators.dedup, ...).
from patito_spark import functions, operators, plans, sources, streaming  # noqa: E402

# Self-reference alias usable inside Field(constraints=...), like the
# reference's `pt.field` (ref src/patito/__init__.py:11). A sessionless SQL
# builder (sql.FieldRef), NOT a Column: classic PySpark cannot build a
# Column before a SparkContext exists, so a Column-based alias made models
# undefinable at import time (the reference's project/models.py convention)
# — and Column lacks the polars-style .sum()/.mean() the reference tutorial
# uses. Renders to SQL strings over `_`, which the validator binds to the
# field's own column.


def __getattr__(name: str):
    if name == "field":
        from patito_spark.sql import FieldRef

        return FieldRef()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__version__ = "0.1.0"

__all__ = [
    "Column",
    "DataFrame",
    "Database",
    "DataFrameValidationError",
    "F",
    "Field",
    "Model",
    "Relation",
    "ValidationError",
    "active_session",
    "cache_scope",
    "col",
    "exceptions",
    "field",
    "functions",
    "get_session",
    "lit",
    "operators",
    "plans",
    "release_caches",
    "sources",
    "sql",
    "streaming",
]
