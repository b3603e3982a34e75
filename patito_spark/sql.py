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
