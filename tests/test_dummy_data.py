"""Dummy-data generation tests (mirrors ref tests/test_dummy_data.py)."""

from typing import List, Literal, Optional

import pytest

import patito_spark as pt


class Product(pt.Model):
    product_id: int = pt.Field(unique=True)
    name: str
    temperature_zone: Literal["dry", "cold", "frozen"]


def test_example_value():
    assert Product.example_value("product_id") == -1
    assert Product.example_value("name") == "dummy_string"
    assert Product.example_value("temperature_zone") == "dry"


def test_example_value_bounds():
    class M(pt.Model):
        a: int = pt.Field(ge=0)
        b: int = pt.Field(le=10)
        c: int = pt.Field(ge=0, le=10)
        d: float = pt.Field(gt=1)
        e: int = pt.Field(multiple_of=7)

    assert M.example_value("a") == 1
    assert M.example_value("b") == 9
    assert M.example_value("c") == 5
    assert M.example_value("d") == 2.0
    assert M.example_value("e") == 7


def test_example_value_string_constraints():
    class M(pt.Model):
        short: str = pt.Field(min_length=3)
        pat: str = pt.Field(pattern="^x$")

    assert M.example_value("short") == "aaa"
    with pytest.raises(NotImplementedError):
        M.example_value("pat")


def test_example():
    instance = Product.example(product_id=42)
    assert instance.product_id == 42
    assert instance.name == "dummy_string"
    assert instance.temperature_zone == "dry"
    with pytest.raises(TypeError):
        Product.example(bogus=1)


def test_examples_dataframe(spark):
    df = Product.examples({"name": ["A", "B", "C"]})
    df.validate()
    rows = df.inner.collect()
    assert len(rows) == 3
    # unique column filled with distinct values
    assert len({r.product_id for r in rows}) == 3


def test_examples_empty(spark):
    df = Product.examples()
    assert df.inner.count() == 1
    df.validate()


def test_examples_wrong_column(spark):
    with pytest.raises(TypeError):
        Product.examples({"bogus": [1]})


def test_examples_nullable_and_list(spark):
    class M(pt.Model):
        id: int = pt.Field(unique=True)
        opt: Optional[str] = None
        tags: List[str]

    df = M.examples({"id": [1, 2]})
    df.validate()


def test_pandas_examples():
    df = Product.pandas_examples({"name": ["product A", "product B"]})
    assert list(df.columns) == ["product_id", "name", "temperature_zone"]
    assert len(df) == 2
    assert (df["temperature_zone"] == "dry").all()
