"""Property-based tests: the single-pass validator must agree with a naive
per-row python re-implementation on arbitrary data."""

from typing import Optional

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

import patito_spark as pt
from patito_spark.exceptions import DataFrameValidationError


class Bounded(pt.Model):
    a: int = pt.Field(ge=-5, le=5)
    b: Optional[float] = pt.Field(None, gt=0.0)
    name: str = pt.Field(min_length=1, max_length=8)


ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-20, max_value=20),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       min_value=-10, max_value=10)),
        st.text(
            alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
            min_size=0,
            max_size=12,
        ),
    ),
    min_size=1,
    max_size=12,
)


def naive_errors(rows) -> set:
    bad = set()
    for a, b, name in rows:
        if not (-5 <= a <= 5):
            bad.add("a")
        if b is not None and not (b > 0.0):
            bad.add("b")
        if not (1 <= len(name) <= 8):
            bad.add("name")
    return bad


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS)
def test_validator_matches_naive(spark, rows):
    df = spark.createDataFrame(rows, schema="a long, b double, name string")
    expected = naive_errors(rows)
    try:
        Bounded.validate_df(df)
        actual = set()
    except DataFrameValidationError as exc:
        actual = {e["loc"][0] for e in exc.errors()}
    assert actual == expected


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.integers(min_value=0, max_value=5), min_size=1, max_size=10
    )
)
def test_uniqueness_matches_naive(spark, values):
    class U(pt.Model):
        v: int = pt.Field(unique=True)

    df = spark.createDataFrame([(v,) for v in values], schema="v long")
    has_dups = len(set(values)) != len(values)
    try:
        U.validate_df(df)
        assert not has_dups
    except DataFrameValidationError:
        assert has_dups
