"""Time-series operators: time buckets, hypertable-style cascade rollups,
gap filling.

The "continuous aggregate" pattern from time-series stores (TimescaleDB
hypertable rollups, Druid granularities) re-expressed Spark-first:

* :func:`time_bucket` — arithmetic bucket expression, codegen-fused.
* :func:`cascade_rollup` — multi-resolution aggregates where each coarser
  resolution re-aggregates the *previous rollup*, not the raw data: the
  raw table is scanned ONCE, every further level works on group-count
  rows. This needs decomposable aggregates (count/sum/min/max; avg via
  sum+count) — the same restriction real rollup systems have.
* :func:`fill_gaps` — dense per-group time axis via ``sequence`` explode
  of each group's own range, left-joined back; gap rows carry NULLs (or
  zeros) so window interpolation can run downstream.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, functions as F

#: Aggregates that can be merged level-to-level in a rollup cascade.
_DECOMPOSABLE = {"count", "sum", "min", "max"}


def time_bucket(ts: Union[str, Column], width: int) -> Column:
    """Bucket start for a numeric (epoch-like) time column.

    ``floor`` division so negative epochs round down, times the width so
    the bucket is expressed in the input's own units (like TimescaleDB's
    ``time_bucket``).
    """
    col = F.col(ts) if isinstance(ts, str) else ts
    return (F.floor(col / width) * width).cast("long")


def cascade_rollup(
    df: DataFrame,
    ts_col: str,
    widths: Sequence[int],
    aggs: dict[str, tuple[str, str]],
    group_cols: Optional[Sequence[str]] = None,
    materialize: bool = True,
) -> DataFrame:
    """Multi-resolution time rollup: one raw scan, then cascade merges.

    ``widths`` are bucket sizes in the time column's units, finest first;
    every width must divide the next (1 min → 1 h → 1 d), which is what
    makes level-to-level re-aggregation exact. ``aggs`` maps output name
    -> (column, fn) with fn in count/sum/min/max/avg.

    Returns the union over resolutions:
    ``resolution (width), bucket_start, <group_cols...>, <agg outputs>``.

    Scale shape: the raw table is aggregated once at the finest width
    (map-side combined — the only shuffle proportional to data size);
    each coarser level re-aggregates the previous level's ~|buckets|
    rows. A naive per-resolution scan would read the raw data
    ``len(widths)`` times — and so would this cascade's union if the
    intermediate levels weren't materialized (Catalyst does not share
    common subplans across union branches), so every non-final level is
    ``cache()``d; pass ``materialize=False`` to opt out (e.g. when the
    caller persists levels itself).
    """
    group_cols = list(group_cols or [])
    widths = list(widths)
    if not widths:
        raise ValueError("cascade_rollup needs at least one bucket width")
    for fine, coarse in zip(widths, widths[1:]):
        if coarse % fine != 0:
            raise ValueError(
                f"width {coarse} is not a multiple of {fine}; cascade "
                "re-aggregation would split buckets"
            )
    for name, (_, fn) in aggs.items():
        if fn not in _DECOMPOSABLE | {"avg"}:
            raise ValueError(
                f"{fn!r} is not decomposable across rollup levels; "
                "supported: count/sum/min/max/avg"
            )

    # Internal partial state: avg decomposes to (sum, count).
    def partial_exprs():
        out = []
        for name, (col, fn) in aggs.items():
            if fn == "avg":
                out.append(F.sum(col).alias(f"__{name}_sum"))
                out.append(F.count(col).alias(f"__{name}_cnt"))
            elif fn == "count":
                out.append(F.count(col).alias(f"__{name}_p"))
            else:
                out.append(getattr(F, fn)(col).alias(f"__{name}_p"))
        return out

    def merge_exprs():
        out = []
        for name, (_, fn) in aggs.items():
            if fn == "avg":
                out.append(F.sum(f"__{name}_sum").alias(f"__{name}_sum"))
                out.append(F.sum(f"__{name}_cnt").alias(f"__{name}_cnt"))
            elif fn in ("count", "sum"):
                out.append(F.sum(f"__{name}_p").alias(f"__{name}_p"))
            else:
                out.append(getattr(F, fn)(f"__{name}_p").alias(f"__{name}_p"))
        return out

    def finalize(level: DataFrame, width: int) -> DataFrame:
        final = [
            F.lit(width).alias("resolution"),
            F.col("__bucket").alias("bucket_start"),
            *group_cols,
        ]
        for name, (_, fn) in aggs.items():
            if fn == "avg":
                final.append(
                    (F.col(f"__{name}_sum") / F.col(f"__{name}_cnt")).alias(name)
                )
            else:
                final.append(F.col(f"__{name}_p").alias(name))
        return level.select(*final)

    finest = (
        df.withColumn("__bucket", time_bucket(ts_col, widths[0]))
        .groupBy("__bucket", *group_cols)
        .agg(*partial_exprs())
    )
    levels = [finest]
    for width in widths[1:]:
        prev = levels[-1]
        if materialize:
            # tracked, not a raw .cache(): level caches must be
            # releasable by release_caches()/cache_scope — an untracked
            # cache outlives the call and, because Spark keys caches by
            # plan structure, silently serves the next structurally
            # identical invocation (the cache-hit-floor failure mode the
            # bench guards against).
            from patito_spark.functions.cache import tracked_persist

            levels[-1] = prev = tracked_persist(prev)
        levels.append(
            prev.withColumn("__bucket", time_bucket(F.col("__bucket"), width))
            .groupBy("__bucket", *group_cols)
            .agg(*merge_exprs())
        )
    out = finalize(levels[0], widths[0])
    for level, width in zip(levels[1:], widths[1:]):
        out = out.unionByName(finalize(level, width))
    return out


def fill_gaps(
    df: DataFrame,
    bucket_col: str,
    step: int,
    group_cols: Optional[Sequence[str]] = None,
    fill: Optional[dict] = None,
    materialize: bool = False,
) -> DataFrame:
    """Densify a bucketed series: emit a row for every ``step`` between
    each group's min and max bucket.

    Missing buckets carry NULL (or ``fill[col]``) for non-key columns —
    the shape window interpolation / charting needs. The dense axis is
    generated per group with ``sequence`` + ``explode`` (no driver-side
    range, no cross join); a group's axis length is (max-min)/step + 1.

    ``bucket_col`` values are expected on the min-anchored ``step`` grid
    (as produced by :func:`time_bucket`); the join is a FULL OUTER so an
    off-grid row is *kept* alongside the dense axis rather than silently
    dropped, but it does not suppress the grid row it falls between.

    The input feeds two plan branches (the bounds agg and the join);
    ``materialize=True`` persists it so the source is scanned once —
    the 100 TB path. The cache is tracked: released by
    ``patito_spark.release_caches()`` (or ``df.unpersist()``); default
    ``False`` re-scans lazily.
    """
    group_cols = list(group_cols or [])
    if materialize:
        from patito_spark.functions.cache import tracked_persist

        df = tracked_persist(df)
    bounds = df.groupBy(*group_cols).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    axis = bounds.select(
        *group_cols,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
        ).alias(bucket_col),
    )
    out = axis.join(df, on=[*group_cols, bucket_col], how="outer")
    if fill:
        out = out.na.fill(fill)
    return out
