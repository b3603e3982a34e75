"""Stage-chain profile of the dedup_simhash entry at sf1 (round-14
verdict #2 follow-up: the interleaved race pinned ~3.2x, not host drift).

Times cumulative prefixes of the pipeline in one process, best-of-N each,
so the marginal cost of every stage is visible:

  sigs      simhash_signatures (explode + 64-sum hash agg + pack)
  persist   + tracked_persist materialization
  usigs     + distinct signatures
  keyed     + 70-mask posexplode + fused window bucket guard
  join      + combination self-join + bit_count verify + distinct
  full      the entry end-to-end (expansion joins included)

Usage: python tools/profile_simhash_stages.py [--runs 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/repo/.localdata/sf1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    import __spark_entry__ as em
    from patito_spark.functions.cache import release_caches
    from patito_spark.operators.dedup import (
        hamming_combination_masks,
        simhash_signatures,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("profile-simhash")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = em._t(spark, args.sf_dir, "documents")

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def timed(name, build):
        best = None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            noop(build())
            dt = time.perf_counter() - t0
            release_caches()
            best = dt if best is None else min(best, dt)
        print(f"{name:10s} {best:.3f}s", flush=True)

    def sigs():
        return simhash_signatures(docs, hash_mode="portable")

    masks = hamming_combination_masks(8, 4)
    print(f"masks: {len(masks)}")

    def usigs():
        return sigs().select(F.col("__sig").alias("__usig")).distinct()

    def keyed():
        u = usigs()
        from pyspark.sql import Window

        left = u.select(
            F.col("__usig").alias("sig_a"),
            F.posexplode(
                F.array(
                    *[
                        F.col("__usig").bitwiseAND(F.lit(m).cast("long"))
                        for m in masks
                    ]
                )
            ).alias("__combo", "__key"),
        )
        w = Window.partitionBy("__combo", "__key")
        return (
            left.withColumn("__n", F.count(F.lit(1)).over(w))
            .filter((F.col("__n") > 1) & (F.col("__n") <= 100_000))
            .drop("__n")
        )

    def join():
        left = keyed()
        right = left.select(
            F.col("__combo").alias("__combo_r"),
            F.col("__key").alias("__key_r"),
            F.col("sig_a").alias("sig_b"),
        )
        return (
            left.join(
                right,
                on=[
                    left.__combo == right.__combo_r,
                    left.__key == right.__key_r,
                    left.sig_a < right.sig_b,
                ],
            )
            .withColumn(
                "hamming",
                F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))),
            )
            .filter(F.col("hamming") <= 4)
            .select("sig_a", "sig_b", "hamming")
            .distinct()
        )

    def full():
        return em.queries()["dedup_simhash"](spark, args.sf_dir)

    # warm-up
    noop(full())
    release_caches()

    timed("sigs", sigs)
    timed("usigs", usigs)
    timed("keyed", keyed)
    timed("join", join)
    timed("full", full)

    # how big is each intermediate?
    n_docs = docs.count()
    n_sigs = sigs().count()
    n_usigs = usigs().count()
    n_keyed = keyed().count()
    print(f"docs {n_docs}  sigs {n_sigs}  usigs {n_usigs}  keyed {n_keyed}")


if __name__ == "__main__":
    main()
