"""ngram_contamination vs hand-checked overlaps."""

import pytest
from pyspark.sql import functions as F

from patito_spark.operators.contamination import ngram_contamination


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),  # contains benchmark 5-gram
            (101, "completely unrelated text with no overlap at all"),
            (102, "quick brown fox jumps over and over again today"),  # shares as well
            (103, "short doc"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture()
def bench_docs(spark):
    return spark.createDataFrame(
        [(1, "the quick brown fox jumps over a fence")],
        "doc_id long, text string",
    )


def test_contamination_detects_shared_grams(corpus, bench_docs):
    out = ngram_contamination(corpus, bench_docs, n=5)
    got = {r["doc_id"]: r["n_shared_grams"] for r in out.collect()}
    # benchmark 5-grams: 'the quick brown fox jumps', 'quick brown fox jumps over', ...
    assert 100 in got and got[100] >= 2
    assert 102 in got and got[102] >= 1  # 'quick brown fox jumps over'
    assert 101 not in got
    assert 103 not in got


def test_contamination_min_shared(corpus, bench_docs):
    out = ngram_contamination(corpus, bench_docs, n=5, min_shared=2)
    got = {r["doc_id"] for r in out.collect()}
    assert 100 in got
    assert 102 not in got  # only one shared 5-gram


def test_contamination_short_doc_whole_text(spark):
    corpus = spark.createDataFrame([(1, "tiny doc")], "doc_id long, text string")
    benchmark = spark.createDataFrame([(2, "tiny doc")], "doc_id long, text string")
    out = ngram_contamination(corpus, benchmark, n=8)
    assert out.count() == 1  # whole-text fallback catches short exact copies


def test_contamination_plan_broadcasts_benchmark(corpus, bench_docs):
    out = ngram_contamination(corpus, bench_docs, n=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
