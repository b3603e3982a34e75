"""One-process interleaved A/B race: dedup_simhash (Spark) vs its DuckDB
oracle at sf1 — the round-14 quiet-window discipline (VERDICT r13 #2).

The round-13 window measured the UNTOUCHED entry at 2.62x its baseline
while its oracle got faster; the attribution was host drift but, unlike
text_profile, no same-process race pinned it. This runs both engines
alternately inside ONE process (same host pressure for both), warms each
engine first (two untimed passes — the subset-JVM cold-start asymmetry
documented in BASELINE.md round 13), then takes N timed passes each,
strictly interleaved duck -> spark -> duck -> spark.

Spark materializes via the noop sink (bench.py's convention: plan cost,
not Arrow transfer); tracked operator caches are released between runs so
best-of never times a cache hit. DuckDB materializes via .df().

Usage: python tools/race_simhash.py [--runs 7] [--sf-dir DIR]
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
    ap.add_argument("--sf-dir", default="/root/repo/.localdata/sf1")
    ap.add_argument("--entry", default="dedup_simhash")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as em
    from patito_spark.functions.cache import release_caches

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("race-simhash")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in em.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )
    sql = em.oracle_sql()[args.entry]
    q = em.queries()[args.entry]

    def run_spark() -> float:
        t0 = time.perf_counter()
        q(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_caches()
        return dt

    def run_duck() -> float:
        t0 = time.perf_counter()
        con.execute(sql).df()
        return time.perf_counter() - t0

    # warm-up: two untimed passes per engine (JIT/codegen + buffer pools)
    for _ in range(2):
        run_duck()
        run_spark()

    ducks, sparks = [], []
    for i in range(args.runs):
        ducks.append(run_duck())
        sparks.append(run_spark())
        print(
            f"round {i + 1}: duck {ducks[-1]:.3f}s  spark {sparks[-1]:.3f}s",
            flush=True,
        )

    d_min, s_min = min(ducks), min(sparks)
    d_med, s_med = statistics.median(ducks), statistics.median(sparks)
    print(f"\nduck  min {d_min:.3f}  median {d_med:.3f}")
    print(f"spark min {s_min:.3f}  median {s_med:.3f}")
    print(f"ratio (min)    {s_min / d_min:.2f}x")
    print(f"ratio (median) {s_med / d_med:.2f}x")


if __name__ == "__main__":
    main()
