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
    out = ngram_contamination(corpus, bench_docs, n=5, strategy="join")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_contamination_strategies_agree(corpus, bench_docs):
    """set (default), join+map and join+window must all agree."""
    results = []
    for kw in (
        dict(strategy="set"),
        dict(strategy="join", gram_mode="map"),
        dict(strategy="join", gram_mode="window"),
    ):
        results.append(
            {
                r["doc_id"]: r["n_shared_grams"]
                for r in ngram_contamination(
                    corpus, bench_docs, n=5, **kw
                ).collect()
            }
        )
    assert results[0] == results[1] == results[2], results


def test_contamination_set_strategy_no_shuffle(corpus, bench_docs):
    """strategy='set': the corpus plan is a single map-only Arrow stage —
    no Exchange, no join, nothing but scan → mapInPandas."""
    out = ngram_contamination(corpus, bench_docs, n=5, strategy="set")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan, plan


def test_contamination_set_strategy_cap(corpus, bench_docs):
    """strategy='set' past the broadcast cap fails loudly; 'auto' falls
    back to the join shape instead."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_broadcast_grams"):
        ngram_contamination(
            corpus, bench_docs, n=5, strategy="set", max_broadcast_grams=2
        )
    out = ngram_contamination(
        corpus, bench_docs, n=5, strategy="auto", max_broadcast_grams=2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # fell back to the join strategy
    got = {r["doc_id"]: r["n_shared_grams"] for r in out.collect()}
    want = {
        r["doc_id"]: r["n_shared_grams"]
        for r in ngram_contamination(
            corpus, bench_docs, n=5, strategy="set"
        ).collect()
    }
    assert got == want


def test_contamination_join_map_mode_single_corpus_exchange(
    corpus, bench_docs
):
    """join+map: per-row array_distinct hashing removes both the
    lead()-window token sort and the count_distinct pre-dedup exchange —
    the corpus stream passes exactly one shuffle (the per-doc count);
    the second Exchange below is the tiny benchmark-side gram distinct."""
    out = ngram_contamination(
        corpus, bench_docs, n=5, strategy="join", gram_mode="map"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Window" not in plan, plan
