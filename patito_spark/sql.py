"""SQL generation utilities (reference: src/patito/sql.py, 89 LOC).

The generated strings are ANSI SQL accepted by Spark SQL (`F.expr` /
`selectExpr`) and by DuckDB, so the same `Case` object works in queries and
their oracle SQL.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

SQLLiteral = Union[str, float, int, None]


def sql_repr(value: SQLLiteral) -> str:
    """Convert a python value to an equivalent SQL literal string."""
    return "null" if value is None else repr(value)


class Case:
    """An SQL ``CASE`` expression mapping one column's values to another's.

    Example::

        Case(on_column="a", mapping={1: "one"}, default="other", as_column="b")
        # -> "case a when 1 then 'one' else 'other' end as b"
    """

    def __init__(
        self,
        on_column: str,
        mapping: Dict[SQLLiteral, SQLLiteral],
        default: SQLLiteral,
        as_column: Optional[str] = None,
    ) -> None:
        self.on_column = on_column
        self.as_column = as_column
        self.mapping = {
            sql_repr(key): sql_repr(value) for key, value in mapping.items()
        }
        self.default_value = sql_repr(default)
        self.sql_string = f"case {self.on_column} " + (
            " ".join(
                f"when {key} then {value}" for key, value in self.mapping.items()
            )
            + f" else {self.default_value} end"
        )
        if self.as_column:
            self.sql_string += f" as {as_column}"

    def __str__(self) -> str:
        return self.sql_string


class FieldRef:
    """Sessionless self-reference for ``Field(constraints=...)``
    (the reference's ``pt.field``, ref src/patito/__init__.py:11).

    Classic PySpark cannot construct a ``Column`` before a SparkContext
    exists, and ``Column`` has no polars-style aggregation methods — so
    ``pt.field`` is this lightweight SQL builder instead: models stay
    definable at import time (the reference's ``project/models.py``
    convention), and the tutorial spelling ``pt.field.sum() == 100.0``
    works verbatim. Expressions render to SQL strings over the ``_``
    placeholder, which the validator binds to the field's own column;
    both Spark SQL and DuckDB parse the result, so oracle replays are
    unaffected.

    Comparisons return the final SQL string (what ``constraints=``
    stores); arithmetic and aggregations return new ``FieldRef``s so
    they chain: ``(pt.field * 2).mean() <= 0.5``.
    """

    def __init__(self, expr: str = "_") -> None:
        self._expr = expr

    # -- aggregations (polars-Expr spellings) -------------------------- #
    # polars BROADCASTS frame aggregates back over rows (every row of an
    # invalid frame fails `pl.col(c).sum() == 100`); the Spark spelling
    # of that semantics is an unpartitioned window — `sum(_) over ()` —
    # which stays legal inside the validator's row-level projection.
    def _agg(self, name: str) -> "FieldRef":
        return FieldRef(f"{name}({self._expr}) over ()")

    def sum(self) -> "FieldRef":
        return self._agg("sum")

    def mean(self) -> "FieldRef":
        return self._agg("avg")

    def min(self) -> "FieldRef":
        return self._agg("min")

    def max(self) -> "FieldRef":
        return self._agg("max")

    def count(self) -> "FieldRef":
        return self._agg("count")

    # -- row-level functions ------------------------------------------- #
    def abs(self) -> "FieldRef":
        return FieldRef(f"abs({self._expr})")

    def is_in(self, values) -> str:
        rendered = ", ".join(sql_repr(v) for v in values)
        return f"({self._expr} in ({rendered}))"

    def is_not_null(self) -> str:
        return f"({self._expr} is not null)"

    # -- arithmetic ---------------------------------------------------- #
    def _arith(self, op: str, other, reverse: bool = False) -> "FieldRef":
        rhs = other._expr if isinstance(other, FieldRef) else sql_repr(other)
        lhs, rhs = (rhs, self._expr) if reverse else (self._expr, rhs)
        return FieldRef(f"({lhs} {op} {rhs})")

    def __add__(self, o):
        return self._arith("+", o)

    def __radd__(self, o):
        return self._arith("+", o, reverse=True)

    def __sub__(self, o):
        return self._arith("-", o)

    def __rsub__(self, o):
        return self._arith("-", o, reverse=True)

    def __mul__(self, o):
        return self._arith("*", o)

    def __rmul__(self, o):
        return self._arith("*", o, reverse=True)

    def __truediv__(self, o):
        return self._arith("/", o)

    def __rtruediv__(self, o):
        return self._arith("/", o, reverse=True)

    def __mod__(self, o):
        return self._arith("%", o)

    # -- comparisons: terminal, render the constraint string ----------- #
    def _cmp(self, op: str, other) -> str:
        rhs = other._expr if isinstance(other, FieldRef) else sql_repr(other)
        return f"({self._expr} {op} {rhs})"

    def __eq__(self, o):  # type: ignore[override]
        return self._cmp("=", o)

    def __ne__(self, o):  # type: ignore[override]
        return self._cmp("!=", o)

    def __lt__(self, o):
        return self._cmp("<", o)

    def __le__(self, o):
        return self._cmp("<=", o)

    def __gt__(self, o):
        return self._cmp(">", o)

    def __ge__(self, o):
        return self._cmp(">=", o)

    __hash__ = None  # type: ignore[assignment]

    def __repr__(self) -> str:
        return f"FieldRef({self._expr!r})"

    def __str__(self) -> str:
        return self._expr
