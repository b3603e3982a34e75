"""The reference's own tutorial, run verbatim against patito_spark.

Source: /root/reference/docs/tutorial/dataframe-validation.rst — the
walkthrough a reference user follows first. Everything here uses the
exact spellings the tutorial shows (``pt.Model``, ``pt.Field(unique=)``,
``Literal`` enums, ``constraints=pt.field.sum() == 100.0``), with
``pt.DataFrame`` standing in for ``pl.DataFrame``. Models are defined at
module import time — BEFORE any SparkSession exists — which is the
reference's ``project/models.py`` convention and the regression that
motivated the sessionless ``FieldRef`` (a Column-based ``pt.field``
asserted on a missing SparkContext at class-definition time).
"""

from typing import Literal

import pytest

import patito_spark as pt
from patito_spark.exceptions import DataFrameValidationError


class Product(pt.Model):
    product_id: int = pt.Field(unique=True)
    name: str
    temperature_zone: Literal["dry", "cold", "frozen"]
    demand_percentage: float = pt.Field(constraints=pt.field.sum() == 100.0)


def test_singular_instance_validation():
    p = Product(
        product_id=1, name="Apple", temperature_zone="dry",
        demand_percentage=0.23,
    )
    assert p.temperature_zone == "dry"
    with pytest.raises(Exception):
        Product(
            product_id=64, name="Pizza", temperature_zone="oven",
            demand_percentage=0.12,
        )


def test_valid_dataframe_passes(spark):
    df = pt.DataFrame(
        {
            "product_id": [1, 2, 3],
            "name": ["Apple", "Milk", "Ice cubes"],
            "temperature_zone": ["dry", "cold", "frozen"],
            "demand_percentage": [23.0, 61.0, 16.0],
        }
    )
    Product.validate(df)  # returns None, raises on invalid


def test_invalid_dataframe_reports_all_three_errors(spark):
    bad = pt.DataFrame(
        {
            "product_id": [64, 64],
            "name": ["Pizza", "Cereal"],
            "temperature_zone": ["oven", "dry"],
            "demand_percentage": [0.07, 0.16],
        }
    )
    with pytest.raises(DataFrameValidationError) as exc:
        Product.validate(bad)
    msg = str(exc.value)
    assert "3 validation errors" in msg
    assert "product_id" in msg and "duplicated" in msg
    assert "temperature_zone" in msg and "oven" in msg
    assert "demand_percentage" in msg and "custom constraints" in msg


def test_field_ref_spellings_render_sql():
    assert (pt.field.sum() == 100.0) == "(sum(_) over () = 100.0)"
    assert (pt.field > 0) == "(_ > 0)"
    assert ((pt.field * 2).mean() <= 0.5) == "(avg((_ * 2)) over () <= 0.5)"
    assert pt.field.is_in(["a", "b"]) == "(_ in ('a', 'b'))"


def test_aggregate_constraint_broadcasts_like_polars(spark):
    """polars broadcasts frame aggregates over rows: EVERY row fails when
    the frame sum is off. The window spelling reproduces that."""

    class Share(pt.Model):
        v: float = pt.Field(constraints=pt.field.sum() == 1.0)

    Share.validate(pt.DataFrame({"v": [0.25, 0.75]}))
    with pytest.raises(DataFrameValidationError) as exc:
        Share.validate(pt.DataFrame({"v": [0.25, 0.5]}))
    assert "2 rows" in str(exc.value)  # both rows flagged, polars-style


def test_anonymous_column_constraints(spark):
    """ref tests/test_validators.py:506 — `_` refers to the field's own
    column; pt.field is an alias for it (both spellings)."""
    from pyspark.sql import functions as F

    class Pair(pt.Model):
        odd_number: int = pt.Field(constraints=F.col("_") % 2 == 1)
        even_number: int = pt.Field(constraints=pt.field % 2 == 0)

    pairs = pt.DataFrame({"odd_number": [1, 3, 5], "even_number": [2, 4, 6]})
    Pair.validate(pairs)
    swapped = pt.DataFrame({"odd_number": [2, 4, 6], "even_number": [1, 3, 5]})
    with pytest.raises(DataFrameValidationError):
        Pair.validate(swapped)


def test_fieldref_constraints_agree_with_duckdb(spark):
    """FieldRef renders plain ANSI SQL: the same constraint string must
    evaluate identically in Spark and DuckDB over the same rows (the
    property the correctness oracles rely on)."""
    import duckdb
    from pyspark.sql import functions as F

    values = [1.0, 2.0, 3.5, -4.0, 0.0]
    constraints = [
        pt.field > 0,
        (pt.field * 2) <= 4.0,
        pt.field.abs() >= 1.0,
        pt.field.is_in([1.0, 2.0]),
        ((pt.field + 1) % 2) != 0,
    ]
    sdf = spark.createDataFrame([(v,) for v in values], "_ double")
    con = duckdb.connect()
    for c in constraints:
        got_spark = [
            bool(r["ok"]) for r in
            sdf.select(F.expr(c).alias("ok")).collect()
        ]
        got_duck = [
            bool(row[0])
            for v in values
            for row in [con.execute(
                f"select {c.replace('_', str(v))}"
            ).fetchone()]
        ]
        assert got_spark == got_duck, c
