"""Interleaved race (round-16 verdict item 7): canonicalize_url's fused
tracking-param alternation (ONE regexp_replace with 12 alternated
names) vs the pre-round-15 sequential chain (12 anchored
regexp_replace passes), in the url_pipeline entry shape. The driver's
r15 bench measured the fused pass -10.5% (inside noise, no floor
breach) — this race settles it; revert the fusion if it loses.

The OLD canonicalize_url is loaded from a git blob (urls.py is
import-free beyond pyspark/typing). Equality cross-checked first.

Usage: python tools/ab_urls_alt.py [--runs 7] [--old-ref ec5aca9~1]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_old(ref: str):
    src = subprocess.run(
        ["git", "show", f"{ref}:patito_spark/operators/urls.py"],
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    path = "/tmp/_ab_urls_old.py"
    with open(path, "w") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location("_ab_urls_old", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--old-ref", default="ec5aca9~1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    import __spark_entry__ as em
    from patito_spark.functions.cache import release_caches
    from patito_spark.operators.urls import canonicalize_url as canon_new
    from patito_spark.operators.urls import dedup_urls

    canon_old = load_old(args.old_ref).canonicalize_url

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("ab-urls-alt")
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

    def urls_df():
        docs = em._t(spark, args.sf_dir, "documents")
        page = (F.col("doc_id") % 40).cast("string")
        qid = (F.col("doc_id") % 5).cast("string")
        return docs.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit("HTTP://WWW.Example.COM/"),
                    F.col("source"),
                    F.lit("/Page"),
                    page,
                    F.lit("/"),
                ),
            )
            .when(
                F.col("doc_id") % 3 == 1,
                F.concat(
                    F.lit("https://shop.example.com:443/item?id="),
                    qid,
                    F.lit("&utm_source=feed&utm_campaign=q"),
                    page,
                    F.lit("&fbclid=x"),
                    page,
                ),
            )
            .otherwise(
                F.concat(
                    F.lit("https://CDN.Example.com:8080/asset"),
                    page,
                    F.lit("#frag"),
                )
            )
            .alias("url"),
        )

    def run(canon):
        urls = urls_df()
        with_canon = urls.withColumn("canon", canon(F.col("url")))
        deduped = dedup_urls(
            with_canon, keep="min_id", canonical_col="canon"
        ).select(F.lit("dedup").alias("mode"), "doc_id", "url", "canon")
        all_rows = with_canon.select(
            F.lit("canon").alias("mode"), "doc_id", "url", "canon"
        )
        return all_rows.unionByName(deduped)

    a = sorted(tuple(r) for r in run(canon_old).collect())
    release_caches()
    b = sorted(tuple(r) for r in run(canon_new).collect())
    release_caches()
    if a != b:
        print(f"MISMATCH: {len(a)} vs {len(b)} rows")
        sys.exit(1)
    print(f"equality OK over {len(a)} rows")

    lanes = [("old-chain", canon_old), ("new-fused", canon_new)]
    for _, c in lanes:  # warm
        run(c).write.format("noop").mode("overwrite").save()
        release_caches()
    times = {label: [] for label, _ in lanes}
    for _ in range(args.runs):
        for label, c in lanes:
            t0 = time.perf_counter()
            run(c).write.format("noop").mode("overwrite").save()
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
