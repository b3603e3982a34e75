"""Skew mitigation: salting for hot keys in aggregations and joins.

AQE's skew-join handling splits oversized *partitions*; salting goes
further and splits oversized *keys*, which AQE cannot (all rows of one key
hash to one reducer). These helpers keep the salt deterministic (hash of a
carrier column, never ``rand()``) so results are reproducible and retries
are safe.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

# Aggregations that can be computed in two phases: partial per (key, salt),
# then merged per key. (avg is handled by sum/count decomposition.)
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_on: Optional[str] = None,
) -> DataFrame:
    """Two-phase aggregation that splits hot grouping keys across reducers.

    ``aggs`` maps output name -> (column, fn) with fn in sum/count/min/max/
    avg. Phase 1 groups by (keys..., salt) — a hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 merges the per-salt partials. Result
    is identical to a direct groupBy (asserted in tests), cost is one extra
    (tiny) shuffle of ``|groups| × salt_buckets`` rows.

    Args:
        salt_on: column whose hash provides the salt; defaults to the first
            non-key column (deterministic, unlike rand()).
    """
    keys = list(keys)
    if salt_on is None:
        candidates = [c for c in df.columns if c not in keys]
        if not candidates:
            raise ValueError("salted_aggregate needs a non-key column to salt on")
        salt_on = candidates[0]

    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt_buckets))
    )

    partial_exprs = []
    merge_exprs = []
    for out_name, (col_name, fn) in aggs.items():
        if fn == "avg":
            partial_exprs.append(F.sum(col_name).alias(f"__{out_name}_sum"))
            partial_exprs.append(F.count(col_name).alias(f"__{out_name}_cnt"))
            merge_exprs.append(
                (
                    F.sum(f"__{out_name}_sum") / F.sum(f"__{out_name}_cnt")
                ).alias(out_name)
            )
            continue
        if fn not in _MERGEABLE:
            raise ValueError(
                f"Aggregation {fn!r} is not mergeable across salt buckets; "
                "supported: sum/count/min/max/avg."
            )
        partial_fn, merge_fn = _MERGEABLE[fn]
        partial_exprs.append(partial_fn(col_name).alias(f"__{out_name}_p"))
        merge_exprs.append(merge_fn(f"__{out_name}_p").alias(out_name))

    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*merge_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    hot_keys: Optional[Sequence] = None,
    salt_buckets: int = 8,
    how: str = "inner",
    left_salt_on: Optional[str] = None,
) -> DataFrame:
    """Equi-join where hot left-side keys are split across salt buckets.

    The right side's hot-key rows are replicated ``salt_buckets`` times
    (explode of a literal range — cheap when hot keys are few); hot left
    rows get a deterministic salt in [0, salt_buckets). Cold keys join with
    salt 0 and zero replication, so the overhead is proportional to hot-key
    volume only.

    Args:
        hot_keys: the skewed join-key values (single-column join). If None,
            they are detected with one approximate frequency pass (keys
            above 2% of rows).
    """
    if len(list(on)) != 1:
        raise ValueError("salted_join currently supports single-column keys")
    key = list(on)[0]

    if hot_keys is None:
        total = left.count()
        detected = (
            left.groupBy(key)
            .count()
            .filter(F.col("count") > max(total * 0.02, 1000))
            .select(key)
            .collect()
        )
        hot_keys = [r[0] for r in detected]
    hot_keys = list(hot_keys)
    if not hot_keys:
        return left.join(right, on=key, how=how)

    if left_salt_on is None:
        candidates = [c for c in left.columns if c != key]
        if not candidates:
            raise ValueError("salted_join needs a non-key left column to salt on")
        left_salt_on = candidates[0]

    is_hot_l = F.col(key).isin(hot_keys)
    salted_left = left.withColumn(
        "__salt",
        F.when(
            is_hot_l,
            F.pmod(F.xxhash64(F.col(left_salt_on)), F.lit(salt_buckets)),
        ).otherwise(F.lit(0)),
    )

    is_hot_r = F.col(key).isin(hot_keys)
    salted_right = right.withColumn(
        "__salts",
        F.when(
            is_hot_r, F.sequence(F.lit(0), F.lit(salt_buckets - 1))
        ).otherwise(F.array(F.lit(0))),
    ).withColumn("__salt", F.explode("__salts")).drop("__salts")

    joined = salted_left.join(salted_right, on=[key, "__salt"], how=how)
    return joined.drop("__salt")
