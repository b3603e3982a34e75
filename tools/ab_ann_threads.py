"""One-process interleaved A/B: ann_search's four probe branches built
serially (current entry) vs concurrently from a driver thread pool
(guide §2.6 — overlap independent jobs).

The four modes are independent until the final union; each branch's
construction runs 1-2 small driver actions (the 8-query toPandas
batches), which today serialize. Threads overlap those actions; the
returned DataFrame (and thus the plan and the oracle hash) is byte-
identical — only the eager construction phase changes.

Usage: python tools/ab_ann_threads.py [--runs 7] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    import __spark_entry__ as em
    from patito_spark.functions.cache import release_caches

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("ab-ann-threads")
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

    def threaded(spark, sf_dir):
        branches = {
            "lsh": em.ann_lsh,
            "ivf": em.ann_ivf,
            "sq8": em.ann_sq8,
            "pca": em.ann_pca,
        }
        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = {
                m: pool.submit(fn, spark, sf_dir)
                for m, fn in branches.items()
            }
            dfs = {m: f.result() for m, f in futs.items()}
        tagged = [
            dfs[m].select(
                F.lit(m).alias("method"), "query_id", "neighbor_id",
                "cosine", "rank",
            )
            for m in ("lsh", "ivf", "sq8", "pca")
        ]
        out = tagged[0]
        for t in tagged[1:]:
            out = out.unionByName(t)
        return out

    variants = {"serial": em.ann_search, "threaded": threaded}

    # warm: indexes build once, codegen caches fill
    for fn in variants.values():
        for _ in range(2):
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            release_caches()

    times: dict[str, list[float]] = {k: [] for k in variants}
    for i in range(args.runs):
        for label, fn in variants.items():
            start = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            t = time.perf_counter() - start
            times[label].append(t)
            release_caches()
            print(f"pass {i + 1} {label}: {t:.3f}s", flush=True)

    for label, ts in times.items():
        print(
            f"{label}: best {min(ts):.3f}  median {statistics.median(ts):.3f}"
            f"  all {[round(t, 3) for t in ts]}"
        )


if __name__ == "__main__":
    main()
