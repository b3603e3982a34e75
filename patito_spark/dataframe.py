"""Model-aware DataFrame wrapper over ``pyspark.sql.DataFrame``.

Re-expresses the reference DataFrame/LazyFrame surface (reference:
src/patito/polars.py, 711 LOC) for Spark. Spark DataFrames are already lazy,
so the reference's DataFrame/LazyFrame split collapses into one class; every
transformation stays declarative and is optimized by Catalyst.

The wrapper delegates unknown attributes to the underlying Spark DataFrame
and re-wraps DataFrame results, so the full PySpark API remains available
with the model riding along::

    Product.DataFrame(...).filter("price > 0").validate()
"""

from __future__ import annotations

import functools
from typing import Any, Iterable, Optional, TYPE_CHECKING, Union

from pyspark.sql import Column, DataFrame as SparkDataFrame, functions as F
from pyspark.sql import types as T

from patito_spark.exceptions import MultipleRowsReturned, RowDoesNotExist

if TYPE_CHECKING:
    from pyspark.sql import SparkSession

    from patito_spark.model import Model


def _to_spark_df(data: Any, model: Optional[type["Model"]], spark) -> SparkDataFrame:
    """Build a Spark DataFrame from python data (dict of lists / list of dicts)."""
    from patito_spark.session import active_session

    spark = spark or active_session()
    if data is None:
        if model is None:
            raise TypeError("DataFrame() without data requires a model.")
        return spark.createDataFrame([], schema=model.spark_schema)
    if isinstance(data, SparkDataFrame):
        return data
    if isinstance(data, DataFrame):
        return data.inner
    if isinstance(data, dict):
        columns = list(data.keys())
        lengths = {len(v) for v in data.values()}
        if len(lengths) > 1:
            raise ValueError(f"Columns have unequal lengths: {lengths}")
        height = lengths.pop() if lengths else 0
        rows = [tuple(data[column][i] for column in columns) for i in range(height)]
    elif isinstance(data, Iterable):
        rows = list(data)
        if rows and isinstance(rows[0], dict):
            columns = list(rows[0].keys())
            rows = [tuple(r.get(c) for c in columns) for r in rows]
        else:
            columns = list(model.columns) if model is not None else None
    else:
        raise TypeError(f"Cannot construct DataFrame from {type(data)}.")
    if not rows:
        if model is None:
            raise TypeError("Empty DataFrame requires a model for its schema.")
        return spark.createDataFrame([], schema=model.spark_schema)
    # Types are inferred from the values (like the reference constructor);
    # `.cast()` or `.validate()` reconcile against the model afterwards.
    # Passing explicit column names preserves declaration order.
    if columns is not None:
        return spark.createDataFrame(rows, schema=columns)
    return spark.createDataFrame(rows)


class DataFrame:
    """A Spark DataFrame with an optional associated model."""

    model: Optional[type["Model"]] = None

    def __init__(
        self,
        data: Any = None,
        model: Optional[type["Model"]] = None,
        spark: Optional["SparkSession"] = None,
    ) -> None:
        model = model if model is not None else type(self).model
        if isinstance(data, SparkDataFrame):
            inner = data
        elif isinstance(data, DataFrame):
            inner = data.inner
        else:
            inner = _to_spark_df(data, model, spark)
        object.__setattr__(self, "_df", inner)
        object.__setattr__(self, "model", model)

    # ------------------------------------------------------------------ #
    # Plumbing                                                            #
    # ------------------------------------------------------------------ #
    @property
    def inner(self) -> SparkDataFrame:
        """The underlying ``pyspark.sql.DataFrame``."""
        return self._df

    def _wrap(self, df: SparkDataFrame) -> "DataFrame":
        return DataFrame(df, model=self.model)

    def __getattr__(self, name: str) -> Any:
        attr = getattr(self._df, name)
        if isinstance(attr, SparkDataFrame):
            return self._wrap(attr)
        if callable(attr):

            @functools.wraps(attr)
            def wrapper(*args: Any, **kwargs: Any) -> Any:
                args = tuple(
                    a.inner if isinstance(a, DataFrame) else a for a in args
                )
                kwargs = {
                    k: (v.inner if isinstance(v, DataFrame) else v)
                    for k, v in kwargs.items()
                }
                result = attr(*args, **kwargs)
                if isinstance(result, SparkDataFrame):
                    return self._wrap(result)
                return result

            return wrapper
        return attr

    def __repr__(self) -> str:
        model_name = self.model.__name__ if self.model else None
        return f"DataFrame[model={model_name}]({self._df})"

    def __dir__(self):
        return sorted(set(list(super().__dir__()) + dir(self._df)))

    def lazy(self) -> "DataFrame":
        """No-op for porting convenience: Spark DataFrames are already lazy.

        The reference splits eager DataFrame / lazy LazyFrame (ref
        polars.py:35-100); in Spark every transformation is lazy until an
        action, so ``lazy()``/``collect()`` round-trips are free.
        """
        return self

    def with_column(self, name: str, column: Any) -> "DataFrame":
        """polars-style alias for ``withColumn`` (ref polars.py ports)."""
        return self._wrap(self._df.withColumn(name, column))

    def with_columns(self, *columns: Any, **named: Any) -> "DataFrame":
        """polars-style multi-column add.

        Positional arguments are aliased Columns appended to the frame;
        keyword arguments add-or-replace by name (``withColumn``
        semantics) — use kwargs when overwriting an existing column.
        """
        out = self._df
        if columns:
            out = out.select("*", *columns)
        for name, column in named.items():
            out = out.withColumn(name, column)
        return self._wrap(out)

    def collect(self, **kwargs: Any) -> "DataFrame":
        """Return the model-aware wrapper, mirroring LazyFrame.collect().

        In the reference, ``collect()`` ends a lazy chain and returns the
        *model-aware DataFrame* (ref polars.py:68-133) — so ported
        ``df.lazy()...collect().validate()`` chains must get the wrapper
        back, not a list of rows (Spark's row-collect stays available as
        ``df.inner.collect()``). Optimizer flags from the reference
        signature are accepted and ignored: Catalyst always optimizes.
        """
        return DataFrame(self._df, model=self.model)

    # ------------------------------------------------------------------ #
    # Model-aware API (ref polars.py:175-679)                             #
    # ------------------------------------------------------------------ #
    def set_model(self, model: type["Model"]) -> "DataFrame":
        """Associate a model with this dataframe (ref polars.py:175)."""
        return DataFrame(self._df, model=model)

    def filter(self, condition: Any) -> "DataFrame":
        """Model-preserving filter (ref polars.py ``LazyFrame.filter``
        passthrough). Accepts a Column or SQL-string predicate; the
        attached model survives, so ``validate()`` still works
        downstream. Explicit (rather than ``__getattr__`` delegation)
        for IDE/API discoverability — behavior is identical.
        """
        return self._wrap(self._df.filter(condition))

    def select(self, *cols: Any) -> "DataFrame":
        """Model-preserving projection (ref polars.py ``select``
        passthrough). Explicit counterpart of the delegated method; the
        model is kept attached — call ``validate()`` only while the
        model's required columns are still present.
        """
        return self._wrap(self._df.select(*cols))

    def validate(self, **kwargs: Any) -> "DataFrame":
        """Validate schema + contents against the model; returns self."""
        if self.model is None:
            raise TypeError(
                f"You must invoke {type(self).__name__}.set_model() "
                f"before invoking {type(self).__name__}.validate()."
            )
        self.model.validate_df(self._df, **kwargs)
        return self

    def cast(self, strict: bool = False) -> "DataFrame":
        """Cast columns to the model's dtypes (ref polars.py:243).

        With ``strict=False`` columns already holding a *valid* (if not
        default) dtype are left untouched; ``strict=True`` forces the
        default dtype. Compiles to a single projection — no shuffle.
        """
        self._require_model("cast")
        specs = self.model.column_specs
        df_types = {f.name: f.dataType for f in self._df.schema.fields}
        projections: list[Column] = []
        for name in self._df.columns:
            spec = specs.get(name)
            if spec is None:
                projections.append(F.col(name))
            elif spec.dtype_override is not None:
                projections.append(F.col(name).cast(spec.dtype_override).alias(name))
            elif not strict and any(
                df_types[name] == valid for valid in spec.valid_spark_types
            ):
                projections.append(F.col(name))
            else:
                projections.append(F.col(name).cast(spec.spark_type).alias(name))
        return self._wrap(self._df.select(*projections))

    def drop(
        self, columns: Optional[Union[str, Iterable[str]]] = None
    ) -> "DataFrame":
        """Drop given columns, or all columns not in the model (ref polars.py:295)."""
        if columns is not None:
            to_drop = [columns] if isinstance(columns, str) else list(columns)
        else:
            self._require_model("drop")
            to_drop = list(set(self._df.columns) - set(self.model.columns))
        return self._wrap(self._df.drop(*to_drop))

    def derive(self) -> "DataFrame":
        """Populate ``Field(derived_from=...)`` columns (ref polars.py:389)."""
        self._require_model("derive")
        df = self._df
        for name, spec in self.model.column_specs.items():
            if spec.derived_from is None:
                continue
            derived_from = spec.derived_from
            if isinstance(derived_from, str):
                expression = F.col(derived_from)
            elif isinstance(derived_from, Column):
                expression = derived_from
            else:
                raise TypeError(
                    f"Can not derive dataframe column from type {type(derived_from)}."
                )
            df = df.withColumn(name, expression.cast(spec.spark_type))
        return self._wrap(df)

    def fill_null(
        self,
        value: Any = None,
        strategy: Optional[str] = None,
    ) -> "DataFrame":
        """Fill nulls; ``strategy="defaults"`` uses model defaults (ref polars.py:443)."""
        if strategy == "defaults":
            self._require_model("fill_null")
            df = self._df
            replacements = {
                name: default
                for name, default in self.model.defaults.items()
                if default is not None and name in df.columns
            }
            projections = [
                (
                    F.coalesce(
                        F.col(c),
                        F.lit(replacements[c]).cast(df.schema[c].dataType),
                    ).alias(c)
                    if c in replacements
                    else F.col(c)
                )
                for c in df.columns
            ]
            return self._wrap(df.select(*projections))
        if strategy is not None:
            raise ValueError(
                f"Unsupported fill_null strategy {strategy!r}; Spark-side "
                "filling supports value= or strategy='defaults'."
            )
        return self._wrap(self._df.fillna(value))

    def get(self, predicate: Optional[Union[Column, str]] = None) -> Any:
        """Fetch the single row matching ``predicate`` as a model instance.

        Raises ``RowDoesNotExist`` / ``MultipleRowsReturned`` (ref
        polars.py:512-592). Uses ``take(2)`` so at most two rows ever reach
        the driver regardless of table size.
        """
        df = self._df if predicate is None else self._df.filter(predicate)
        rows = df.take(2)
        if len(rows) == 0:
            raise RowDoesNotExist(f"{type(self).__name__}.get() yielded 0 rows.")
        if len(rows) > 1:
            raise MultipleRowsReturned(
                f"{type(self).__name__}.get() yielded 2+ rows."
            )
        data = rows[0].asDict(recursive=True)
        if self.model is not None:
            return self.model(**data)
        from patito_spark.model import Model

        dynamic = Model.with_fields(
            **{k: (Any, None) for k in data}
        )
        return dynamic.model_construct(**data)

    def _require_model(self, method: str) -> None:
        if self.model is None:
            raise TypeError(
                f"You must invoke set_model() before invoking {method}()."
            )

    # ------------------------------------------------------------------ #
    # Model-aware readers (ref polars.py:614-679); see also sources/      #
    # ------------------------------------------------------------------ #
    @classmethod
    def read_csv(
        cls,
        path: str,
        spark: Optional["SparkSession"] = None,
        header: bool = True,
        **options: Any,
    ) -> "DataFrame":
        """Read CSV applying the model's schema, names, and derivations."""
        from patito_spark.sources.readers import read_csv as _read_csv

        model = cls.model
        if model is None:
            raise TypeError("read_csv requires a model-bound DataFrame class.")
        return _read_csv(path, model=model, spark=spark, header=header, **options)

    @classmethod
    def read_parquet(
        cls,
        path: str,
        spark: Optional["SparkSession"] = None,
        **options: Any,
    ) -> "DataFrame":
        """Read parquet with model column pruning + derivations."""
        from patito_spark.sources.readers import read_parquet as _read_parquet

        model = cls.model
        if model is None:
            raise TypeError("read_parquet requires a model-bound DataFrame class.")
        return _read_parquet(path, model=model, spark=spark, **options)

    def write_parquet(
        self,
        path: str,
        partition_by: Optional[list] = None,
        mode: str = "error",
        validate: bool = False,
        **options: Any,
    ) -> None:
        """Write to parquet, optionally validating against the model first."""
        from patito_spark.sources.readers import write_parquet as _write_parquet

        _write_parquet(
            self,
            path,
            partition_by=partition_by,
            mode=mode,
            validate=validate,
            **options,
        )
