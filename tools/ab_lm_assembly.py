"""One-process interleaved A/B: lm_quality_scores score-table assembly,
round-15 shape (8 joins in trigram+KN+target mode: bi + uni_w +
uni_prev + tri_lm + ctx + kn_hist + kn_cont + t_lm onto the triple
base) vs the round-16 fusion (word-level stats joined twice, bigram /
trigram LM sides as LOCAL expressions of the base row when their caps
did not fire -> 4 joins, and 2 small aggregates instead of 3).

The OLD implementation is loaded from a git blob (pass --old-ref, e.g.
the commit before the fusion landed) as a standalone module — text.py
only uses absolute lazy imports, so the old module body runs unchanged.

Cross-checks exact 4-dp-rounded score equality on the entry-shaped
corpus before timing (the driver hash-compares at 4 dp).

Usage: python tools/ab_lm_assembly.py [--runs 7] [--sf-dir DIR]
       [--old-ref REV]
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
        ["git", "show", f"{ref}:patito_spark/operators/text.py"],
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    path = "/tmp/_ab_lm_old_text.py"
    with open(path, "w") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location("_ab_lm_old_text", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--old-ref", default="b82e0cd")
    ap.add_argument("--skip-eq", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    import __spark_entry__ as em
    from patito_spark.functions.cache import release_caches
    from patito_spark.operators.text import lm_quality_scores as lm_new

    old_mod = load_old(args.old_ref)
    lm_old = old_mod.lm_quality_scores

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("ab-lm-assembly")
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

    def docs_df():
        return em._t(spark, args.sf_dir, "documents")

    def run(fn):
        docs = docs_df()
        target = docs.filter(F.col("doc_id") % 17 == 0)
        out = fn(docs, target, kneser_ney=True, trigram=True)
        cols = [
            "doc_id",
            "n_tokens",
            "cross_entropy",
            "perplexity",
            "log_ratio",
            "dsir_weight",
            "bigram_ce",
            "bigram_ppl",
            "kn_ce",
            "kn_ppl",
            "trigram_ce",
            "trigram_ppl",
        ]
        return out.select(
            "doc_id",
            "n_tokens",
            *[
                F.round(c, 4).alias(c)
                for c in cols
                if c not in ("doc_id", "n_tokens")
            ],
        )

    if not args.skip_eq:
        a = {r["doc_id"]: tuple(r) for r in run(lm_old).collect()}
        release_caches()
        b = {r["doc_id"]: tuple(r) for r in run(lm_new).collect()}
        release_caches()
        if a != b:
            diff = [k for k in a if a.get(k) != b.get(k)]
            print(f"MISMATCH on {len(diff)} docs; first:")
            for k in diff[:3]:
                print(k, a.get(k), "VS", b.get(k))
            sys.exit(1)
        print(f"equality OK over {len(a)} docs (4-dp rounded)")

    lanes = [("old", lm_old), ("new", lm_new)]
    for _, fn in lanes:  # warm
        run(fn).write.format("noop").mode("overwrite").save()
        release_caches()
    times = {label: [] for label, _ in lanes}
    for _ in range(args.runs):
        for label, fn in lanes:
            t0 = time.perf_counter()
            run(fn).write.format("noop").mode("overwrite").save()
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
