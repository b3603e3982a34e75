"""Order-5 .arpa decade row (round-14 verdict #7): the committed
round-13 arpa decade used an order-2 artifact; CCNet's production gate
pays the full 2N-1 = 9 broadcast-join chain of a 5-gram model. This
times arpa_logloss(order=5) across the sf1 -> sf3 decade with an
artifact built FROM the corpus itself (distinct 1..5-grams of the
doc_id % 23 subcorpus, hash-scored — the _arpa_lm_for construction
widened to order 5), so every order gets realistic hit rates instead
of all-miss fall-through.

Usage: python tools/profile_arpa5.py [--runs 3]
Prints one markdown row for docs/scaling.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = {
    "sf1": "/root/repo/.localdata/sf1",
    "sf3": "/root/repo/.localdata/sf3",
}


def build_lm(spark, docs, order: int = 5):
    from pyspark.sql import functions as F

    from patito_spark.functions.hashing import portable_hash64
    from patito_spark.operators.arpa import UNK, ArpaLm
    from patito_spark.operators.dedup import shingles

    sub = docs.filter(F.col("doc_id") % 23 == 0)
    seq = F.concat(F.lit("<s> "), F.col("text"))
    tables, counts = {}, {}
    for k in range(1, order + 1):
        grams = (
            sub.select(F.explode(shingles(seq, n=k)).alias("gram"))
            .filter(F.size(F.split(F.col("gram"), " ")) == k)
            .filter(F.col("gram") != UNK)
            .distinct()
        )
        h = portable_hash64(F.col("gram"))
        bo = (
            (-(h % 500)).cast("double") / F.lit(1000.0)
            if k < order
            else F.lit(None).cast("double")
        )
        t = grams.select(
            "gram",
            (F.lit(-1.0) - (h % 1000).cast("double") / F.lit(1000.0)).alias(
                "logp"
            ),
            bo.alias("bo"),
        )
        if k == 1:
            t = t.unionByName(
                spark.createDataFrame(
                    [(UNK, -3.5, None)], "gram string, logp double, bo double"
                )
            )
        t = t.persist()
        tables[k] = t
        counts[k] = t.count()
    return ArpaLm(tables, counts, -3.5)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    a = ap.parse_args()

    from patito_spark.functions.cache import release_caches
    from patito_spark.operators.arpa import arpa_logloss
    from patito_spark.session import get_session

    spark = get_session("profile-arpa5")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for sf, d in SF_DIRS.items():
        if not os.path.isdir(d):
            print(f"skip {sf}: {d} missing (tools/gen_sf_scale.py)")
            continue
        docs = spark.read.parquet(f"{d}/documents.parquet")
        n = docs.count()
        lm = build_lm(spark, docs, order=5)
        ngrams = sum(lm.counts.values())
        best = float("inf")
        for _ in range(a.runs):
            t0 = time.perf_counter()
            arpa_logloss(docs, lm, order=5).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
            release_caches()
        lm.unpersist()
        results[sf] = (n, ngrams, best)
        print(f"{sf}: {n} docs, {ngrams} model grams, {best:.2f}s")

    if "sf1" in results and "sf3" in results:
        n1, g1, t1 = results["sf1"]
        n3, g3, t3 = results["sf3"]
        print("\n| family | sf1 (n, s) | sf3 (3n, s) | growth @3x |")
        print(
            f"| arpa_logloss (order-5 corpus-gram model, {g1}/{g3} grams) "
            f"| {n1} / {t1:.2f}s | {n3} / {t3:.2f}s | {t3 / t1:.2f}x |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
