"""Benchmark-contamination detection for training corpora.

A document is contaminated when it shares long n-grams with an evaluation
benchmark — the standard decontamination test (e.g. GPT-3's 13-gram
filter) run before training. Expressed Spark-first:

* both corpora run through the SAME shingle pipeline as MinHash
  (:func:`patito_spark.operators.dedup.shingle_hash_rows` — codegen
  lead-window n-grams, one 64-bit hash per distinct gram);
* the benchmark side is tiny by definition (an eval set), so the overlap
  resolves as a **broadcast** hash equi-join on the gram hash — the
  corpus is never shuffled;
* one map-side-combined aggregate counts distinct shared grams per
  corpus document.

``hash_mode="portable"`` makes the whole pipeline SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from patito_spark.operators.dedup import shingle_hash_rows


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_shared: int = 1,
    hash_mode: str = "xxhash64",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Corpus documents sharing ≥ ``min_shared`` distinct n-grams with the
    benchmark.

    Returns ``doc_id, n_shared_grams`` (one row per contaminated corpus
    document). Grams are word ``n``-grams; documents shorter than ``n``
    tokens contribute their whole text as one gram (so short exact copies
    are still caught).
    """
    # distinct=False on BOTH sides: the corpus side's duplicates collapse
    # in the post-join count_distinct (so the full corpus gram stream is
    # never shuffled — the contract of this operator), and the benchmark
    # side dedups on __h alone below.
    corpus_grams = shingle_hash_rows(
        corpus, id_col=id_col, text_col=text_col, n=n, hash_mode=hash_mode,
        distinct=False,
    )
    bench_grams = shingle_hash_rows(
        benchmark, id_col=id_col, text_col=text_col, n=n, hash_mode=hash_mode,
        distinct=False,
    ).select("__h").distinct()
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    shared = corpus_grams.join(bench_grams, on="__h")
    return (
        shared.groupBy(F.col("__id").alias(id_col))
        .agg(F.count_distinct("__h").alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= min_shared)
    )
