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


def _key_counts(
    df: DataFrame, key: str, fraction: float, seed: int
) -> DataFrame:
    """Lazy per-key counts over a row sample (``fraction >= 1`` = no sample).

    Exactness is irrelevant here — hot-key detection is a planning
    heuristic, and salting preserves join semantics whichever keys are
    picked — so a plain seeded row sample is fine (no need for the
    hash-keyed reproducible sampling the data operators use).
    """
    src = df if fraction >= 1.0 else df.sample(fraction=fraction, seed=seed)
    return src.groupBy(key).agg(F.count(F.lit(1)).alias("__n"))


def detect_hot_keys(
    df: DataFrame,
    key: str,
    threshold_fraction: float = 0.02,
    min_count: int = 1000,
    sample_fraction: float = 0.01,
    min_sample_rows: int = 100_000,
    max_hot_keys: int = 64,
    seed: int = 42,
) -> list:
    """Estimate the skewed values of ``key`` from a bounded sample.

    Scale shape: ONE pass over ``sample_fraction`` of the rows (falling
    back to a full pass only when the sample is too small to trust, i.e.
    the data itself is small), a map-side-combined count shuffle of the
    sampled keys, and a driver transfer capped at ``max_hot_keys`` rows —
    never an unbounded ``collect()`` and never two extra full scans. When
    more than ``max_hot_keys`` keys clear the threshold, the heaviest ones
    win and a warning is emitted (at that point the data is closer to
    uniform-heavy than skewed, and explicit ``hot_keys`` or a plain
    shuffle join is the better tool).

    A key is hot when its (sampled) count exceeds
    ``max(sampled_total * threshold_fraction, min_count * fraction)``.
    """
    import warnings

    def _detect(fraction: float) -> tuple[int, list]:
        # localCheckpoint materializes the (small) per-key counts so the
        # total-rows agg and the threshold filter don't rescan the input.
        counts = _key_counts(df, key, fraction, seed).localCheckpoint()
        total = counts.agg(F.sum("__n")).collect()[0][0] or 0
        floor = max(total * threshold_fraction, min_count * fraction)
        rows = (
            counts.filter(F.col("__n") > floor)
            .orderBy(F.col("__n").desc())
            .limit(max_hot_keys + 1)
            .collect()
        )
        return total, [r[0] for r in rows]

    total, found = _detect(sample_fraction)
    if total < min_sample_rows and sample_fraction < 1.0:
        # Sample too small to estimate frequencies — the input itself is
        # small, so an exact pass is cheap.
        total, found = _detect(1.0)
    if len(found) > max_hot_keys:
        warnings.warn(
            f"detect_hot_keys: more than {max_hot_keys} keys cleared the "
            "skew threshold; keeping the heaviest ones. Pass explicit "
            "hot_keys (or don't salt) for uniform-heavy key distributions.",
            RuntimeWarning,
            stacklevel=2,
        )
        found = found[:max_hot_keys]
    return found


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
            :func:`detect_hot_keys` estimates them from a bounded sample
            (keys above ~2% of rows); pass them explicitly when you already
            know the skew profile — detection still costs a sampling pass.
    """
    if len(list(on)) != 1:
        raise ValueError("salted_join currently supports single-column keys")
    key = list(on)[0]

    if hot_keys is None:
        hot_keys = detect_hot_keys(left, key)
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
