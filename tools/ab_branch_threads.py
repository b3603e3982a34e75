"""One-process interleaved A/B: union-of-independent-branch entries
built serially (current) vs with their branch constructions overlapped
from a driver thread pool (guide §2.6) — the ann_search follow-up.

Twins return byte-identical plans (same branch builders, same tags,
same union order); only the eager construction phase is reordered.

Usage: python tools/ab_branch_threads.py [--runs 7] [--sf-dir DIR]
       [--only entry,entry]
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
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    import __spark_entry__ as em
    from patito_spark.functions.cache import release_caches

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("ab-branch-threads")
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

    def unigram_ppl_threaded(spark, sf_dir):
        from patito_spark.operators.arpa import arpa_logloss
        from patito_spark.operators.text import lm_quality_scores

        docs = em._t(spark, sf_dir, "documents")
        target = docs.filter(F.col("doc_id") % 17 == 0)
        lm = em._arpa_lm_for(spark, sf_dir)
        with ThreadPoolExecutor(max_workers=2) as pool:
            fs = pool.submit(
                lm_quality_scores, docs, target,
                kneser_ney=True, trigram=True,
            )
            fa = pool.submit(
                arpa_logloss, docs, lm, order=3, bos=True
            )
            s, a_raw = fs.result(), fa.result()
        a = a_raw.select(
            "doc_id",
            F.round("arpa_ce", 4).alias("arpa_ce_r"),
            F.round("arpa_ppl", 4).alias("arpa_ppl_r"),
        )
        return s.select(
            "doc_id",
            "n_tokens",
            F.round("cross_entropy", 4).alias("cross_entropy_r"),
            F.round("perplexity", 4).alias("perplexity_r"),
            F.round("log_ratio", 4).alias("log_ratio_r"),
            F.round("dsir_weight", 4).alias("dsir_weight_r"),
            F.round("bigram_ce", 4).alias("bigram_ce_r"),
            F.round("bigram_ppl", 4).alias("bigram_ppl_r"),
            F.round("kn_ce", 4).alias("kn_ce_r"),
            F.round("kn_ppl", 4).alias("kn_ppl_r"),
            F.round("trigram_ce", 4).alias("trigram_ce_r"),
            F.round("trigram_ppl", 4).alias("trigram_ppl_r"),
        ).join(a, "doc_id")

    def jaccard_pairs_threaded(spark, sf_dir):
        from patito_spark.operators.dedup import ngram_jaccard_pairs
        from patito_spark.operators.winnow import winnow_pairs

        docs = em._t(spark, sf_dir, "documents")
        with ThreadPoolExecutor(max_workers=2) as pool:
            fj = pool.submit(
                ngram_jaccard_pairs, docs,
                threshold=0.82, ngram=1, scope=F.col("doc_id") < 150,
            )
            fw = pool.submit(
                winnow_pairs, docs.filter(F.col("doc_id") < 2000),
                k=5, w=4, min_shared=2, with_containment=True,
                hash_mode="portable",
            )
            jac_raw, win_raw = fj.result(), fw.result()
        jac = jac_raw.select(
            F.lit("jaccard").alias("mode"),
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            "jaccard",
            F.lit(None).cast("long").alias("shared_fps"),
            F.lit(None).cast("double").alias("containment"),
        )
        win = win_raw.select(
            F.lit("winnow").alias("mode"),
            F.col("id_a").cast("long"),
            F.col("id_b").cast("long"),
            F.lit(None).cast("double").alias("jaccard"),
            F.col("shared_fps").cast("long"),
            "containment",
        )
        return jac.unionByName(win)

    def embedding_threaded(spark, sf_dir):
        with ThreadPoolExecutor(max_workers=2) as pool:
            fe = pool.submit(em.dedup_embedding, spark, sf_dir)
            fl = pool.submit(em.dedup_embedding_lsh, spark, sf_dir)
            exact_raw, lsh_raw = fe.result(), fl.result()
        exact = exact_raw.select(
            F.lit("exact").alias("mode"), "id_a", "id_b", "cosine"
        )
        lsh = lsh_raw.select(
            F.lit("lsh").alias("mode"), "id_a", "id_b", "cosine"
        )
        return exact.unionByName(lsh)

    cases = {
        "text_unigram_ppl": (em.text_unigram_ppl, unigram_ppl_threaded),
        "dedup_jaccard_pairs": (
            em.dedup_jaccard_pairs, jaccard_pairs_threaded,
        ),
        "dedup_embedding": (em.dedup_embedding_both, embedding_threaded),
    }
    if args.only:
        keep = set(args.only.split(","))
        cases = {k: v for k, v in cases.items() if k in keep}

    for name, (serial_fn, threaded_fn) in cases.items():
        for fn in (serial_fn, threaded_fn):  # warm
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            release_caches()
        times: dict[str, list[float]] = {"serial": [], "threaded": []}
        for i in range(args.runs):
            for label, fn in (
                ("serial", serial_fn), ("threaded", threaded_fn),
            ):
                start = time.perf_counter()
                fn(spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[label].append(time.perf_counter() - start)
                release_caches()
        for label, ts in times.items():
            print(
                f"{name} {label}: best {min(ts):.3f}  "
                f"median {statistics.median(ts):.3f}  "
                f"all {[round(t, 3) for t in ts]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
