"""A/B: the lm_quality_scores trigram LM-BUILD aggregate — codegen
explode(arrays_zip)+groupBy vs a map-side Arrow partial-count kernel
feeding the SAME (p2, prev, w) exchange.

The candidate mirrors `_doc_token_counts_arrow` (round 15): a
document's triples live entirely in its own input row, so the map
side can pre-collapse them at C speed per batch; the corpus-level
triple aggregate still needs its one exchange, but it sums int64
partials, so the resulting triple table is bit-identical.

Usage: python tools/ab_triple_counts.py [--sf-dir ...] [--runs 7]
       [--check]   # exact row-equality sweep instead of timing
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_old(spark, sf_dir):
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from patito_spark.operators.text import tokens

    raw = em._t(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks)
    nulls1 = F.array(F.lit(None).cast("string"))
    nulls2 = F.array(F.lit(None).cast("string"), F.lit(None).cast("string"))
    positioned = raw.select(
        F.col("doc_id"),
        F.explode(
            F.arrays_zip(
                F.slice(F.concat(nulls2, toks), F.lit(1), n),
                F.slice(F.concat(nulls1, toks), F.lit(1), n),
                toks,
            )
        ).alias("pos"),
    ).select(
        "doc_id",
        F.col("pos").getField("0").alias("__p2"),
        F.col("pos").getField("1").alias("__w_prev"),
        F.col("pos").getField("2").alias("__w"),
    )
    return positioned.groupBy("__p2", "__w_prev", "__w").agg(
        F.count("*").alias("__tri_n")
    )


def _corpus_triple_counts_arrow(df, text_col):
    """The MEASURED-NEGATIVE candidate (kept here so the race is
    reproducible; not shipped in the operator): per-batch partial
    (p2, prev, w) counts at C speed, feeding the same corpus-level
    sum exchange. Exact row equality with the explode build was
    verified (--check, 28,137 triple rows at sf0.1), but the lane
    LOSES at both scales — the exchange it cannot remove stays, and
    Arrow pays object-column serialization on three wide string
    columns while codegen explode + partial hash agg is already
    cheap. sf0.1: old 0.411 / new 0.465 median; sf1: old 0.681 /
    new 0.910 (interleaved best-of-7 each)."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("__p2", StringType()),
            StructField("__w_prev", StringType()),
            StructField("__w", StringType()),
            StructField("__tri_n", LongType()),
        ]
    )

    def kernel(batches):
        from itertools import chain

        import numpy as np
        import pandas as pd

        for pdf in batches:
            texts = pdf[text_col]
            valid = texts.notna()
            if not valid.any():
                continue
            tok_lists = texts[valid].str.split(" ")
            lens = tok_lists.str.len().to_numpy(dtype=np.int64)
            flat = np.asarray(
                list(chain.from_iterable(tok_lists)), dtype=object
            )
            total = len(flat)
            if total == 0:
                continue
            codes, uniques = pd.factorize(flat)
            uniq_arr = np.asarray(uniques, dtype=object)
            n_u = len(uniq_arr)
            codes = codes.astype(np.int64, copy=False)
            starts = np.cumsum(lens) - lens
            pos = np.arange(total, dtype=np.int64) - np.repeat(
                starts, lens
            )
            prevc = np.concatenate(([np.int64(-1)], codes[:-1]))
            prevc[pos < 1] = -1
            p2c = np.concatenate(([np.int64(-1)] * 2, codes[:-2]))
            p2c[pos < 2] = -1
            if (n_u + 1) * (n_u + 1) * n_u < 2**62:
                keys = ((p2c + 1) * (n_u + 1) + (prevc + 1)) * n_u + codes
                uk, cnt = np.unique(keys, return_counts=True)
                wc = uk % n_u
                rest = uk // n_u
                pc = rest % (n_u + 1) - 1
                qc = rest // (n_u + 1) - 1
            else:
                g = (
                    pd.DataFrame({"q": p2c, "p": prevc, "w": codes})
                    .groupby(["q", "p", "w"], sort=False)
                    .size()
                    .reset_index(name="n")
                )
                qc = g["q"].to_numpy(np.int64)
                pc = g["p"].to_numpy(np.int64)
                wc = g["w"].to_numpy(np.int64)
                cnt = g["n"].to_numpy(np.int64)
            out_p2 = uniq_arr[np.clip(qc, 0, None)]
            out_p2[qc < 0] = None
            out_prev = uniq_arr[np.clip(pc, 0, None)]
            out_prev[pc < 0] = None
            yield pd.DataFrame(
                {
                    "__p2": out_p2,
                    "__w_prev": out_prev,
                    "__w": uniq_arr[wc],
                    "__tri_n": cnt.astype(np.int64),
                }
            )

    return df.select(text_col).mapInPandas(kernel, out_schema)


def build_new(spark, sf_dir):
    from pyspark.sql import functions as F

    import __spark_entry__ as em

    raw = em._t(spark, sf_dir, "documents")
    part = _corpus_triple_counts_arrow(raw, "text")
    return part.groupBy("__p2", "__w_prev", "__w").agg(
        F.sum("__tri_n").alias("__tri_n")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("ab-triple-counts")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.check:
        old = build_old(spark, args.sf_dir)
        new = build_new(spark, args.sf_dir)
        a = old.exceptAll(new).count()
        b = new.exceptAll(old).count()
        n_old, n_new = old.count(), new.count()
        print(
            f"rows old={n_old} new={n_new} old-new={a} new-old={b} "
            f"{'EQUAL' if a == b == 0 and n_old == n_new else 'DIFF'}"
        )
        return

    def run(side):
        df = (build_old if side == "old" else build_new)(spark, args.sf_dir)
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    run("old"), run("new")  # warm both lanes
    olds, news = [], []
    for i in range(args.runs):
        olds.append(run("old"))
        news.append(run("new"))
    olds.sort(), news.sort()
    med = lambda xs: xs[len(xs) // 2]
    wins = sum(1 for o, n in zip(sorted(olds), sorted(news)) if n < o)
    print(
        f"old median {med(olds):.3f}s  new median {med(news):.3f}s  "
        f"new wins {wins}/{args.runs}  (old {['%.3f' % x for x in olds]}  "
        f"new {['%.3f' % x for x in news]})"
    )


if __name__ == "__main__":
    main()
