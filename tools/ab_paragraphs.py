"""One-process interleaved A/B: paragraph_passes (current — stats
aggregates carry the paragraph text through two exchanges as
min(struct(.., paragraph)) SortAggregates) vs a keys-only redesign
(guide §8 "decide with small rows, move big rows once"): the winner
decision shuffles (para_key, id, para_idx) with all-primitive
aggregate buffers (HashAggregate-eligible min / min_by / count), and
the paragraph text crosses exactly ONE exchange — the survivors join
back onto the docs, where a positional array filter rebuilds the text
from one split() evaluation per row.

Cross-checks exact (mode, id) -> text equality on the entry-shaped
sf corpus before timing.

NOTE (round 16): the keys-only design won its round-15 sf1 race
(2.912 -> 2.678 median) but the DRIVER's bench reproduced a 1.35x
floor breach at sf0.1 and the round-15 end-of-round gated sf1 race had
the struct lane winning 6/6 — the committed `paragraph_passes` default
is the STRUCT lane again, with the keys-only design available as
`engine="keys"`. `build_old` below is the struct lane ("old"),
`build_new`/"hint" the keys lane; "new" times the committed default.

Usage: python tools/ab_paragraphs.py [--runs 7] [--sf-dir DIR] [--phase]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_old(df, min_docs=3, join_sep="\n\n", id_col="doc_id",
              text_col="text", mode_col="mode"):
    """The pre-redesign paragraph_passes body (struct-carrying stats:
    min(struct(.., paragraph)) SortAggregates, text on every
    exchange), preserved for the committed race."""
    from pyspark.sql import functions as F

    from patito_spark.functions.cache import tracked_persist
    from patito_spark.operators.paragraphs import split_paragraphs

    paras = split_paragraphs(df, id_col, text_col)
    per_doc = paras.groupBy("para_key", id_col).agg(
        F.min(F.struct("para_idx", "paragraph")).alias("__d")
    )
    stats = per_doc.groupBy("para_key").agg(
        F.min(
            F.struct(
                F.col(id_col),
                F.col("__d.para_idx").alias("para_idx"),
                F.col("__d.paragraph").alias("paragraph"),
            )
        ).alias("__f"),
        F.count(F.lit(1)).alias("__n_docs"),
    )
    stats = tracked_persist(stats)
    dedup_kept = stats.select(
        F.col(f"__f.{id_col}").alias(id_col),
        F.col("__f.para_idx").alias("para_idx"),
        F.col("__f.paragraph").alias("paragraph"),
    ).withColumn("__mode", F.lit("dedup"))
    common = stats.filter(F.col("__n_docs") >= min_docs).select("para_key")
    boiler_kept = (
        paras.join(common, on="para_key", how="left_anti")
        .select(id_col, "para_idx", "paragraph")
        .withColumn("__mode", F.lit("boiler"))
    )
    kept = dedup_kept.unionByName(boiler_kept)
    rebuilt = kept.groupBy("__mode", id_col).agg(
        F.concat_ws(
            join_sep,
            F.array_sort(
                F.collect_list(F.struct("para_idx", "paragraph"))
            ).getField("paragraph"),
        ).alias("__rebuilt")
    )
    return rebuilt.select(
        F.col("__mode").alias(mode_col),
        F.col(id_col),
        F.col("__rebuilt").alias(text_col),
    )


def build_new(df, min_docs=3, sep_pattern=r"\n{2,}", join_sep="\n\n",
              id_col="doc_id", text_col="text", min_chars=1,
              normalize=True, mode_col="mode"):
    from pyspark.sql import functions as F

    from patito_spark.functions.cache import tracked_persist
    from patito_spark.operators.paragraphs import _norm_key

    keys = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep_pattern)).alias(
                "para_idx", "paragraph"
            ),
        )
        .select(
            id_col,
            "para_idx",
            _norm_key(F.col("paragraph"), normalize).alias("para_key"),
        )
        .filter(F.length("para_key") >= max(min_chars, 1))
    )
    per_doc = keys.groupBy("para_key", id_col).agg(
        F.min("para_idx").alias("__pidx")
    )
    stats = per_doc.groupBy("para_key").agg(
        F.min(id_col).alias("__wid"),
        F.min_by("__pidx", F.col(id_col)).alias("__widx"),
        F.count(F.lit(1)).alias("__n_docs"),
    )
    stats = tracked_persist(stats)
    dedup_kept = stats.select(
        F.col("__wid").alias(id_col), F.col("__widx").alias("para_idx")
    ).withColumn("__mode", F.lit("dedup"))
    common = stats.filter(F.col("__n_docs") >= min_docs).select("para_key")
    boiler_kept = (
        keys.join(common, on="para_key", how="left_anti")
        .select(id_col, "para_idx")
        .withColumn("__mode", F.lit("boiler"))
    )
    kept = dedup_kept.unionByName(boiler_kept)
    surv = kept.groupBy("__mode", id_col).agg(
        F.collect_list("para_idx").alias("__idxs")
    )
    rebuilt = (
        df.select(id_col, text_col)
        .join(surv.hint("shuffle_hash"), on=id_col, how="inner")
        .select(
            F.col("__mode").alias(mode_col),
            F.col(id_col),
            F.concat_ws(
                join_sep,
                F.filter(
                    F.split(F.col(text_col), sep_pattern),
                    lambda x, i: F.array_contains(F.col("__idxs"), i),
                ),
            ).alias(text_col),
        )
    )
    return rebuilt.select(mode_col, id_col, text_col)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--phase", action="store_true",
                    help="also time the split/stats sub-phases of old")
    ap.add_argument("--three", action="store_true",
                    help="race old vs committed vs keys+shuffle_hash hint")
    ap.add_argument("--lanes", default="",
                    help="comma list from old,new,hint (overrides --three)")
    ap.add_argument("--skip-eq", action="store_true",
                    help="skip the equality cross-check (already proven)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    import __spark_entry__ as em
    from patito_spark.functions.cache import release_caches
    from patito_spark.operators.paragraphs import (
        paragraph_passes,
        split_paragraphs,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("ab-paragraphs")
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

    def docs_df():
        return em._t(spark, args.sf_dir, "documents").select(
            "doc_id",
            F.concat(
                F.lit("Intro shared "),
                (F.col("doc_id") % 7).cast("string"),
                F.lit("\n\n"),
                F.col("text"),
                F.lit("\n\nCommon Footer Follow Us"),
            ).alias("text"),
        )

    def old_fn():
        return build_old(docs_df(), min_docs=3)

    def new_fn():
        if os.environ.get("AB_PARA_INLINE"):
            return build_new(docs_df(), min_docs=3)
        # the committed implementation
        return paragraph_passes(docs_df(), min_docs=3).select(
            "mode", "doc_id", "text"
        )

    def hint_fn():
        # keys-only build with the survivors join pinned to shuffled-hash
        # (build_new carries the hint inline)
        return build_new(docs_df(), min_docs=3)

    # ---- exact equality first ----
    if args.skip_eq:
        a = {}
    else:
        a = {(r["mode"], r["doc_id"]): r["text"] for r in old_fn().collect()}
    release_caches()
    if args.skip_eq:
        b = {}
    else:
        b = {(r["mode"], r["doc_id"]): r["text"] for r in new_fn().collect()}
        release_caches()
    if a != b:
        only_a = set(a) - set(b)
        only_b = set(b) - set(a)
        diff = [k for k in (set(a) & set(b)) if a[k] != b[k]]
        print(f"MISMATCH: only_old={len(only_a)} only_new={len(only_b)} "
              f"text_diff={len(diff)}")
        for k in list(only_a)[:3]:
            print("only_old", k)
        for k in list(only_b)[:3]:
            print("only_new", k)
        for k in diff[:3]:
            print("diff", k, repr(a[k])[:120], "VS", repr(b[k])[:120])
        sys.exit(1)
    print(f"equality OK over {len(a)} (mode, doc) rows")

    if args.phase:
        for label, fn in (
            ("split_only", lambda: split_paragraphs(docs_df())),
            ("old_full", old_fn),
            ("new_full", new_fn),
        ):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
                release_caches()
            print(f"phase {label}: {[round(t, 3) for t in ts]}")

    # ---- interleaved race ----
    all_lanes = {"old": old_fn, "new": new_fn, "hint": hint_fn}
    if args.lanes:
        lanes = [(n, all_lanes[n]) for n in args.lanes.split(",")]
    elif args.three:
        lanes = [("old", old_fn), ("new", new_fn), ("hint", hint_fn)]
    else:
        lanes = [("old", old_fn), ("new", new_fn)]
    for _, fn in lanes:  # warm
        fn().write.format("noop").mode("overwrite").save()
        release_caches()
    times = {label: [] for label, _ in lanes}
    for i in range(args.runs):
        for label, fn in lanes:
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[label].append(time.perf_counter() - t0)
            release_caches()
    for label, _ in lanes:
        ts = times[label]
        print(f"{label}: median {statistics.median(ts):.3f} "
              f"min {min(ts):.3f} all {[round(t, 3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
