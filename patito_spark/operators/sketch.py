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
