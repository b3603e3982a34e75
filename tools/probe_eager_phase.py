"""Split each entry's wall time into CONSTRUCTION (the entry function
call — where eager driver actions live) vs EXECUTION (the noop sink of
the returned plan). Entries whose construction phase is a large share
are candidates for guide §2.6 job overlap or action fusion.

Usage: python tools/probe_eager_phase.py entry[,entry...] [--runs 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as em
    from patito_spark.functions.cache import release_caches

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("probe-eager")
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

    queries = em.queries()
    names = [n for n in args.entries.split(",") if n in queries]
    for name in names:  # warm
        queries[name](spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        release_caches()

    for name in names:
        best_c = best_e = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = queries[name](spark, args.sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            best_c, best_e = min(best_c, t1 - t0), min(best_e, t2 - t1)
            release_caches()
        print(
            f"{name}: construct {best_c:.3f}s  execute {best_e:.3f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
