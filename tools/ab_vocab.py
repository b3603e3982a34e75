"""One-process interleaved A/B: build_vocab's explode + two-exchange
cascade vs riding _doc_token_counts_arrow (the round-15 tf_idf/BM25
kernel): per-doc token counts are doc-local, so the first aggregate
needs no shuffle — the Arrow stage emits distinct (doc, token, n) rows
map-only and ONE token-level exchange finishes the vocabulary.

Cross-checks exact row equality (token, count, doc_freq, rank) first.

Usage: python tools/ab_vocab.py [--runs 7] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_arrow_vocab(df, top_n=500):
    from pyspark.sql import Window, functions as F

    from patito_spark.operators.text import _doc_token_counts_arrow

    counts = _doc_token_counts_arrow(df, "text", "doc_id", "__dl")
    vocab = counts.groupBy("token").agg(
        F.sum("__n").alias("count"), F.count("*").alias("doc_freq")
    )
    vocab = vocab.orderBy(
        F.col("count").desc(), F.col("token").asc()
    ).limit(top_n)
    w = Window.orderBy(F.col("count").desc(), F.col("token").asc())
    return vocab.withColumn("rank", F.row_number().over(w).cast("long"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as em
    from patito_spark.functions.cache import release_caches
    from patito_spark.operators.text import build_vocab

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("ab-vocab")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def docs():
        return em._t(spark, args.sf_dir, "documents")

    def old_fn():
        return build_vocab(docs(), top_n=500)

    def new_fn():
        return build_arrow_vocab(docs(), top_n=500)

    a = sorted(map(tuple, old_fn().collect()))
    b = sorted(map(tuple, new_fn().collect()))
    if a != b:
        print(f"MISMATCH rows old={len(a)} new={len(b)}")
        for x, y in list(zip(a, b))[:5]:
            if x != y:
                print("old", x, "new", y)
        sys.exit(1)
    print(f"equality OK over {len(a)} vocab rows")

    for fn in (old_fn, new_fn):
        fn().write.format("noop").mode("overwrite").save()
        release_caches()
    times = {"old": [], "new": []}
    for _ in range(args.runs):
        for label, fn in (("old", old_fn), ("new", new_fn)):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[label].append(time.perf_counter() - t0)
            release_caches()
    for label in ("old", "new"):
        ts = times[label]
        print(f"{label}: median {statistics.median(ts):.3f} "
              f"min {min(ts):.3f} all {[round(t, 3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
