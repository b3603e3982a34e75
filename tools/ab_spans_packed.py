"""One-process interleaved A/B: duplicate_span_intervals first_mode
'struct' (min(struct(id,pos)) -> SortAggregate, full gram-stream sorts
on both sides of the stats exchange) vs 'packed' (min((id<<32)|pos) ->
HashAggregate). Equality cross-checked on the entry-shaped corpus
before timing (the lanes must be row-identical for non-negative ids).

Usage: python tools/ab_spans_packed.py [--runs 7] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    import __spark_entry__ as em
    from patito_spark.functions.cache import release_caches
    from patito_spark.operators.spans import duplicate_span_intervals

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("ab-spans-packed")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
        )
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(mode):
        docs = em._t(spark, args.sf_dir, "documents")
        return duplicate_span_intervals(
            docs, span_tokens=4, hash_mode="portable", first_mode=mode
        ).select(
            "doc_id",
            F.col("span_start").cast("long"),
            F.col("span_end").cast("long"),
        )

    a = sorted(tuple(r) for r in run("struct").collect())
    release_caches()
    b = sorted(tuple(r) for r in run("packed").collect())
    release_caches()
    if a != b:
        print(f"MISMATCH: {len(a)} vs {len(b)} rows")
        sys.exit(1)
    print(f"equality OK over {len(a)} interval rows")

    lanes = [("struct", "struct"), ("packed", "packed")]
    for _, m in lanes:  # warm
        run(m).write.format("noop").mode("overwrite").save()
        release_caches()
    times = {label: [] for label, _ in lanes}
    for _ in range(args.runs):
        for label, m in lanes:
            t0 = time.perf_counter()
            run(m).write.format("noop").mode("overwrite").save()
            times[label].append(time.perf_counter() - t0)
            release_caches()
    for label, _ in lanes:
        ts = times[label]
        print(
            f"{label}: median {statistics.median(ts):.3f} "
            f"min {min(ts):.3f} all {[round(t, 3) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
