"""Edge-case type mappings: decimal, binary, map, interval, nested models."""

import datetime as dt
from decimal import Decimal
from typing import Dict, List, Optional

import pytest
from pyspark.sql import types as T

import patito_spark as pt


class Exotic(pt.Model):
    dec: Decimal
    blob: bytes
    meta: Dict[str, int]
    delta: dt.timedelta
    nested: Optional[List[List[int]]] = None


def test_exotic_dtypes():
    assert Exotic.dtypes["dec"] == T.DecimalType(38, 18)
    assert Exotic.dtypes["blob"] == T.BinaryType()
    assert Exotic.dtypes["meta"] == T.MapType(
        T.StringType(), T.LongType(), valueContainsNull=False
    )
    assert Exotic.dtypes["delta"] == T.DayTimeIntervalType()
    assert Exotic.sql_types["nested"] == "ARRAY<ARRAY<BIGINT>>"


def test_exotic_example():
    instance = Exotic.example()
    assert instance.dec == Decimal(0)
    assert instance.blob == b""
    assert instance.meta == {}
    assert instance.nested is None


def test_exotic_validation(spark):
    df = spark.createDataFrame(
        [(Decimal("1.5"), b"x", {"a": 1}, dt.timedelta(seconds=5), [[1, 2]])],
        schema=T.StructType(
            [
                T.StructField("dec", T.DecimalType(10, 2)),
                T.StructField("blob", T.BinaryType()),
                T.StructField("meta", T.MapType(T.StringType(), T.LongType())),
                T.StructField("delta", T.DayTimeIntervalType()),
                T.StructField(
                    "nested", T.ArrayType(T.ArrayType(T.LongType()))
                ),
            ]
        ),
    )
    # any decimal precision is accepted; map/array nullability flags ignored
    Exotic.validate_df(df)


class Inner(pt.Model):
    x: int
    y: str


class Outer(pt.Model):
    id: int
    inner: Inner


def test_nested_model_schema():
    assert (
        Outer.spark_schema.simpleString()
        == "struct<id:bigint,inner:struct<x:bigint,y:string>>"
    )


def test_nested_model_validation(spark):
    df = spark.createDataFrame([(1, (2, "a"))], schema=Outer.spark_schema)
    Outer.validate_df(df)

    wrong = spark.createDataFrame(
        [(1, ("a", "b"))], schema="id long, inner struct<x string, y string>"
    )
    with pytest.raises(pt.DataFrameValidationError):
        Outer.validate_df(wrong)


def test_nested_model_example():
    instance = Outer.example()
    assert isinstance(instance.inner, Inner)
    assert instance.inner.x == -1
