"""SemDeDup scaling profile: wall vs corpus size at auto cell count.

Pair-work model: auto cells ≈ sqrt(n), expected cell ≈ sqrt(n), so
within-cell exact scoring is O(cell²) per cell × cells = O(n^1.5) —
the published method's inherent cost (every in-cluster pair is scored
exactly), bounded per-task by n_blocks. This tool measures the actual
wall-clock marginal per doubling (asymptote 2^1.5 ≈ 2.83) plus pair
counts, so docs/scaling.md carries numbers, not just the model.

Usage: python tools/profile_semdedup.py [--sizes 10000,20000,40000,80000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import types as T


def corpus(spark, n, dim=16, dup_frac=0.05):
    """n unit vectors; the last dup_frac duplicate earlier ids exactly
    (seed-derived, so generation is distributed and reproducible)."""
    n_dup = int(n * dup_frac)
    cut = n - n_dup

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = np.empty((len(ids), dim))
            for j, i in enumerate(ids):
                src = int(i - cut) if i >= cut else int(i)
                v = np.random.RandomState(src).normal(size=dim)
                vecs[j] = v / np.linalg.norm(v)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    return spark.range(n).mapInPandas(gen, schema)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10000,20000,40000,80000")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from patito_spark.operators.semdedup import semantic_dedup_pairs
    from patito_spark.operators.similarity import auto_n_centroids
    from patito_spark.session import get_session

    spark = get_session("profile_semdedup")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for _ in range(args.runs):          # interleaved best-of-N
        for n in sizes:
            df = corpus(spark, n).persist()
            df.count()
            t0 = time.perf_counter()
            pairs = semantic_dedup_pairs(df, threshold=0.999).count()
            wall = time.perf_counter() - t0
            df.unpersist()
            rows.append(
                {
                    "n": n,
                    "cells": min(
                        auto_n_centroids(n), max(2, n // 4)
                    ),
                    "pairs": pairs,
                    "wall_s": round(wall, 2),
                }
            )
    best = {}
    for r in rows:
        k = r["n"]
        if k not in best or r["wall_s"] < best[k]["wall_s"]:
            best[k] = r
    out = [best[n] for n in sizes]
    for prev, cur in zip(out, out[1:]):
        cur["marginal"] = round(cur["wall_s"] / prev["wall_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
