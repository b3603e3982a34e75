"""Distributed cardinality sketches.

KMV (k-minimum-values) distinct-count sketch, Spark-first:

* hash every value once (codegen), keep the k smallest distinct hashes
  per group. Spark's ``WindowGroupLimit`` pushes the per-group top-k
  *map-side*, so each partition contributes at most k rows per group to
  the shuffle — the sketch property (bounded state, mergeable by
  keeping the k smallest of a union) maps exactly onto partial
  aggregation.
* estimate: with k-th smallest hash ``h_k`` of a uniform hash over
  ``[0, H)``, distinct ≈ ``(k - 1) * H / h_k`` (Bar-Yossef et al. 2002);
  groups with fewer than k distinct hashes report the exact count.

Unlike HLL (``approx_count_distinct``), the KMV state and estimate are
plain arithmetic over hash values — with the portable hash the WHOLE
sketch (state and estimate) is reproducible by any SQL engine, so the
driver oracle value-checks it bit-for-bit.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from patito_spark.functions.hashing import PORTABLE_HEX_CHARS, hash64

#: Hash-space size per mode (xxhash64 is signed-shifted into [0, 2^64)).
_HASH_SPACE = {
    "portable": float(1 << (4 * PORTABLE_HEX_CHARS)),
    "xxhash64": float(1 << 64),
}


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Optional[Sequence[str]] = None,
    k: int = 256,
    hash_mode: str = "portable",
) -> DataFrame:
    """Approximate distinct ``value_col`` per group via a KMV sketch.

    Returns ``<group_cols...>, n_kept, kth_hash, distinct_est`` where
    ``distinct_est`` is exact when the group has < k distinct values.
    Standard error ≈ 1/sqrt(k-2) (~6% at k=256).

    Deterministic: same data + k + hash_mode → identical estimate on any
    engine (no RNG, no merge-order dependence — the k smallest of a set
    are the k smallest regardless of partitioning).
    """
    if hash_mode not in _HASH_SPACE:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    group_cols = list(group_cols or [])
    space = _HASH_SPACE[hash_mode]

    hashed = df.select(
        *group_cols, hash64(F.col(value_col).cast("string"), mode=hash_mode).alias("__h")
    )
    if hash_mode == "xxhash64":
        # shift signed xxhash64 into [0, 2^64) so "smallest" is uniform
        hashed = hashed.withColumn(
            "__h", F.col("__h").cast("decimal(20,0)") + F.lit(1 << 63)
        )
    distinct = hashed.distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("__h").asc())
    kept = distinct.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    sketch = kept.groupBy(*group_cols).agg(
        F.count("*").alias("n_kept"),
        F.max("__h").alias("kth_hash"),
    )
    return sketch.select(
        *group_cols,
        "n_kept",
        F.col("kth_hash").cast("double").alias("kth_hash"),
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) * F.lit(space) / F.col("kth_hash").cast("double")
        )
        .alias("distinct_est"),
    )


# ---------------------------------------------------------------------- #
# HLL sketch tables (DataSketches HLL via Spark built-ins)                #
# ---------------------------------------------------------------------- #


def hll_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Optional[Sequence[str]] = None,
    lg_k: int = 12,
    sketch_col: str = "hll",
) -> DataFrame:
    """Per-group Apache DataSketches HLL sketch (binary, mergeable).

    The *sketch table* pattern: distinct counts don't add, so the
    pre-aggregation you can store and re-slice is the SKETCH, not the
    number. One hash-aggregate over the raw data (map-side combined,
    JVM `hll_sketch_agg` — no Python in the path) yields
    ``<group_cols...>, <sketch_col>``; write it to parquet, then answer
    any coarser grouping later with :func:`hll_merge` — without
    rescanning the raw table. Relative error ≈ 1.04/sqrt(2^lg_k)
    (~1.6% at the default lg_k=12, 2-8 KB per sketch).

    For a single-resolution approximate number, plain
    ``approx_count_distinct`` is simpler; for a bit-reproducible,
    SQL-replayable estimate use :func:`kmv_distinct`. This family earns
    its keep when sketches are STORED and re-merged.
    """
    group_cols = list(group_cols or [])
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lg_k)).alias(
            sketch_col
        )
    )


def hll_merge(
    df: DataFrame,
    group_cols: Optional[Sequence[str]] = None,
    sketch_col: str = "hll",
    estimate: bool = True,
) -> DataFrame:
    """Re-aggregate a sketch table to a coarser grouping.

    ``hll_union_agg`` merges sub-population sketches at full precision
    (same ``lg_k``): ``hll_merge(hourly, ["day"])`` answers the day with
    the SAME error bound as sketching the raw day directly — the
    cascade property additive rollups get for free, recovered for
    distinct counts. (The union path may change the sketch's internal
    representation, so the estimate can differ from the direct sketch's
    by a fraction of the error bound — measured <1% at lg_k=12 — but
    never degrades with the number of merge levels.) With
    ``estimate=True`` appends ``distinct_est`` (long) next to the
    merged sketch.
    """
    group_cols = list(group_cols or [])
    merged = df.groupBy(*group_cols).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )
    if not estimate:
        return merged
    return merged.withColumn(
        "distinct_est", F.hll_sketch_estimate(sketch_col)
    )


def hll_distinct_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    widths: Sequence[int],
    group_cols: Optional[Sequence[str]] = None,
    lg_k: int = 12,
    materialize: bool = True,
) -> DataFrame:
    """Multi-resolution DISTINCT-count rollup: one raw scan, sketch
    cascade above it.

    ``cascade_rollup`` covers decomposable aggregates (count/sum/...);
    ``count_distinct`` is NOT decomposable — a naive cascade would need
    one raw scan per resolution. Sketches restore the cascade: the raw
    table is sketched once at the finest width (the only shuffle
    proportional to data size); each coarser level unions the previous
    level's ~|buckets| sketches. Same width-divisibility contract and
    level materialization as ``cascade_rollup``.

    Returns ``resolution, bucket_start, <group_cols...>, distinct_est``.
    """
    from patito_spark.operators.timeseries import time_bucket

    group_cols = list(group_cols or [])
    widths = list(widths)
    if not widths:
        raise ValueError("hll_distinct_rollup needs at least one width")
    for fine, coarse in zip(widths, widths[1:]):
        if coarse % fine != 0:
            raise ValueError(
                f"width {coarse} is not a multiple of {fine}; cascade "
                "re-aggregation would split buckets"
            )

    finest = hll_sketch(
        df.withColumn("__bucket", time_bucket(ts_col, widths[0])),
        value_col,
        ["__bucket", *group_cols],
        lg_k=lg_k,
        sketch_col="__hll",
    )
    levels = [finest]
    for width in widths[1:]:
        prev = levels[-1]
        if materialize:
            # tracked like cascade_rollup's levels: releasable by
            # release_caches(), no silent cache-hit on re-invocation.
            from patito_spark.functions.cache import tracked_persist

            levels[-1] = prev = tracked_persist(prev)
        levels.append(
            hll_merge(
                prev.withColumn("__bucket", time_bucket(F.col("__bucket"), width)),
                ["__bucket", *group_cols],
                sketch_col="__hll",
                estimate=False,
            )
        )

    def finalize(level: DataFrame, width: int) -> DataFrame:
        return level.select(
            F.lit(width).alias("resolution"),
            F.col("__bucket").alias("bucket_start"),
            *group_cols,
            F.hll_sketch_estimate("__hll").alias("distinct_est"),
        )

    out = finalize(levels[0], widths[0])
    for level, width in zip(levels[1:], widths[1:]):
        out = out.unionByName(finalize(level, width))
    return out


# ---------------------------------------------------------------------- #
# Count-min frequency sketch                                              #
# ---------------------------------------------------------------------- #


def cms_frequencies(
    df: DataFrame,
    value_col: str,
    items: Sequence,
    eps: float = 1e-4,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Estimated occurrence counts for a watchlist of ``items`` with ONE
    shuffle-free aggregate over the corpus.

    Exact per-item counts need a ``groupBy(value)`` shuffle keyed by a
    potentially huge domain; the count-min sketch collapses the whole
    pass to a single global aggregate (JVM ``count_min_sketch``,
    map-side partial merge — the reduce moves one ``d×w`` counter table
    per partition, independent of row count or domain size). The driver
    then probes the merged sketch for just the watchlist.

    Guarantees (standard CMS): ``estimate ≥ true`` always, and
    ``estimate ≤ true + eps·N`` with probability ``confidence`` (N =
    total rows). Width ``w = ceil(2/eps)``, depth ``d =
    ceil(ln(1/(1-confidence)))``.

    The probe uses Spark's own ``CountMinSketch.readFrom`` (py4j,
    driver-side — the sketch is a few hundred KB), so build and probe
    hashing can never drift. Values are compared as strings (the sketch
    is built over ``cast(value_col as string)``).

    Returns a small driver-built DataFrame ``item string, estimate long``.
    """
    spark = df.sparkSession
    row = df.agg(
        F.count_min_sketch(
            F.col(value_col).cast("string"),
            F.lit(float(eps)),
            F.lit(float(confidence)),
            F.lit(seed),
        ).alias("cms")
    ).first()
    jvm = spark.sparkContext._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(row["cms"])
    )
    out = [(str(it), int(sketch.estimateCount(str(it)))) for it in items]
    return spark.createDataFrame(out, "item string, estimate long")
