"""Round-13 family decade profiles: winnow (production mode, unscoped),
pretrained-.arpa scoring, unigram tokenizer training.

The driver slots measure oracle-replayable shapes (portable hashes,
fixed scopes); this tool measures the PRODUCTION shapes across a 3x
data growth (sf1 -> sf3, tools/gen_sf_scale.py outputs) so
docs/scaling.md gets honest decade rows for the new operators:

* winnow_pairs over the FULL documents table, crc32poly hashes,
  min_shared=2 (candidate generation + guarded pairing end-to-end);
* arpa_logloss order-5 against a synthetic 60k-line artifact (the
  distinct-tuple aggregate + 9 broadcast lookups + corpus join);
* train_unigram (vocab 512, seed 20k) — corpus pass scales with data,
  EM scales with DISTINCT word forms (bounded), so growth should be
  strongly sublinear.

Usage: python tools/profile_r13.py [--runs 3] [--skip a,b]
Prints one markdown row per (family, sf) and the @3x growth factors.
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


def _arpa_lines(n_grams: int = 60_000) -> str:
    lines = ["\\data\\", "", "\\1-grams:", "-3.0\t<unk>",
             "-0.5\t<s>\t-0.2"]
    # unigrams over the synthetic vocabulary shapes w0..w? used by the
    # testdata generator's documents; bigrams from a deterministic walk
    for i in range(2000):
        lines.append(f"-1.{i % 9}\tw{i}\t-0.1")
    lines.append("")
    lines.append("\\2-grams:")
    for i in range(n_grams):
        lines.append(f"-0.{(i % 8) + 1}\tw{i % 2000} w{(i * 7) % 2000}")
    lines.append("")
    lines.append("\\end\\")
    return "\n".join(lines) + "\n"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--skip", default="")
    a = ap.parse_args()
    skip = set(a.skip.split(",")) if a.skip else set()

    from patito_spark.functions.cache import release_caches
    from patito_spark.session import get_session

    spark = get_session("profile-r13")
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    arpa_path = os.path.join(tempfile.mkdtemp(), "profile.arpa")
    with open(arpa_path, "w") as fh:
        fh.write(_arpa_lines())

    def timed(fn) -> float:
        best = float("inf")
        for _ in range(a.runs):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
            release_caches()
        return best

    results: dict = {}
    for sf, d in SF_DIRS.items():
        if not os.path.isdir(d):
            print(f"skip {sf}: {d} missing (tools/gen_sf_scale.py)")
            continue
        docs = spark.read.parquet(f"{d}/documents.parquet")
        n = docs.count()

        if "winnow" not in skip:
            from patito_spark.operators.winnow import winnow_pairs

            t = timed(
                lambda: winnow_pairs(docs, min_shared=2)
                .write.format("noop").mode("overwrite").save()
            )
            results.setdefault("winnow_pairs (full table, crc32poly)", {})[
                sf
            ] = (n, t)
            print(f"winnow {sf}: {n} docs {t:.2f}s")

        if "arpa" not in skip:
            from patito_spark.operators.arpa import arpa_logloss, load_arpa

            lm = load_arpa(spark, arpa_path)
            t = timed(
                lambda: arpa_logloss(docs, lm)
                .write.format("noop").mode("overwrite").save()
            )
            lm.unpersist()
            results.setdefault("arpa_logloss (order-2 synthetic model)", {})[
                sf
            ] = (n, t)
            print(f"arpa {sf}: {n} docs {t:.2f}s")

        if "unigram" not in skip:
            from patito_spark.operators.unigram import train_unigram

            t = timed(
                lambda: train_unigram(
                    docs, vocab_size=512, seed_size=20_000,
                    max_piece_len=6, max_word_types=50_000,
                )
            )
            results.setdefault("train_unigram (512 pieces)", {})[sf] = (n, t)
            print(f"unigram {sf}: {n} docs {t:.2f}s")

    print("\n| family | sf1 (n, s) | sf3 (3n, s) | growth @3x |")
    print("| --- | --- | --- | --- |")
    for fam, per in results.items():
        if "sf1" in per and "sf3" in per:
            n1, t1 = per["sf1"]
            n3, t3 = per["sf3"]
            print(
                f"| {fam} | {n1} / {t1:.2f}s | {n3} / {t3:.2f}s "
                f"| {t3 / t1:.2f}x |"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
