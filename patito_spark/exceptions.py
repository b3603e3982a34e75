"""Error taxonomy for patito_spark.

Mirrors the reference taxonomy (reference: src/patito/exceptions.py:1-43)
but is self-contained: pydantic v2 forbids subclassing its ValidationError,
so we aggregate errors ourselves with the same rendering style.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class ErrorWrapper:
    """A single column-level validation failure."""

    exc: Exception
    loc: str

    @property
    def type_label(self) -> str:
        exc_type = type(self.exc)
        if issubclass(exc_type, WrongColumnsError):
            return f"type_error.{exc_type.__name__.replace('Error', '').lower()}"
        if issubclass(exc_type, ColumnDTypeError):
            return "type_error.columndtype"
        if issubclass(exc_type, MissingValuesError):
            return "value_error.missingvalues"
        if issubclass(exc_type, RowValueError):
            return "value_error.rowvalue"
        return "value_error"


class DataFrameValidationError(ValueError):
    """Aggregated exception raised when a DataFrame does not match its model.

    Renders like pydantic v1 ValidationError (reference behaviour,
    src/patito/pydantic.py:702-713)::

        3 validation errors for Product
        is_for_sale
          Missing column (type=type_error.missingcolumns)
    """

    def __init__(self, errors: list[ErrorWrapper], model: type) -> None:
        self._errors = errors
        self.model = model
        super().__init__(str(self))

    def errors(self) -> list[dict]:
        return [
            {"loc": (e.loc,), "msg": str(e.exc), "type": e.type_label}
            for e in self._errors
        ]

    def error_count(self) -> int:
        return len(self._errors)

    def __str__(self) -> str:
        n = len(self._errors)
        lines = [
            f"{n} validation error{'' if n == 1 else 's'} for {self.model.__name__}"
        ]
        for error in self._errors:
            lines.append(error.loc)
            lines.append(f"  {error.exc} (type={error.type_label})")
        return "\n".join(lines)


# Keep the reference alias so user code reads the same.
ValidationError = DataFrameValidationError


class WrongColumnsError(TypeError):
    """Validation exception for column name mismatches."""


class MissingColumnsError(WrongColumnsError):
    """A dataframe is missing one or more columns."""


class SuperflousColumnsError(WrongColumnsError):
    """A dataframe has one or more non-specified columns."""


class MissingValuesError(ValueError):
    """A dataframe has non-nullable columns with nulls."""


class ColumnDTypeError(TypeError):
    """A dataframe has one or more columns with wrong dtypes."""


class RowValueError(ValueError):
    """A dataframe has a row with an impermissible value."""


class RowDoesNotExist(RuntimeError):
    """A single row was expected, but none were returned."""


class MultipleRowsReturned(RuntimeError):
    """A single row was expected, but several were returned."""
