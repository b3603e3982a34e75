"""update_corpus: each admission stage drops exactly what it should."""

import pytest
from pyspark.sql import functions as F

from patito_spark.operators.incremental import update_corpus

BODY = "the quick brown fox jumps over the lazy dog again and again today"


@pytest.fixture()
def history(spark):
    return spark.createDataFrame(
        [
            (1, BODY + " one", "https://example.com/a"),
            (2, "completely different historical content here", "https://example.com/b"),
        ],
        "doc_id long, text string, url string",
    )


def ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_all_stages(spark, history):
    incoming = spark.createDataFrame(
        [
            # refetch: same canonical URL as history doc 1 (tracking junk)
            (10, "brand new words entirely", "https://www.example.com/a?utm_source=x"),
            # exact content match of history doc 2, new URL
            (11, "completely different historical content here", "https://example.com/c"),
            # near-dup of history doc 1 (one word changed), new URL
            (12, BODY + " two", "https://example.com/d"),
            # genuinely new
            (13, "fresh unrelated article about spark physical plans", "https://example.com/e"),
            # within-batch near-dup pair: only one survives
            (14, "unique batch content shared by the pair of docs", "https://example.com/f"),
            (15, "unique batch content shared by the pair of docs", "https://example.com/g"),
        ],
        "doc_id long, text string, url string",
    )
    out = update_corpus(
        history, incoming, url_col="url", neardup_threshold=0.6,
        within_batch_threshold=0.6,
    )
    got = ids(out["admitted"])
    # 10 refetch-dropped, 11 exact-dropped, 12 neardup-dropped,
    # 14/15 collapse to one.
    assert 13 in got
    assert 10 not in got and 11 not in got and 12 not in got
    assert len([i for i in got if i in (14, 15)]) == 1
    assert [s for s, _ in out["stages"]] == [
        "refetch_drop",
        "exact_content_drop",
        "neardup_vs_history",
        "within_batch_dedup",
    ]


def test_stages_skippable(spark, history):
    incoming = spark.createDataFrame(
        [(20, BODY + " two", "https://example.com/zz")],
        "doc_id long, text string, url string",
    )
    # With every optional stage off, only exact-content dedup runs and
    # the near-dup survives.
    out = update_corpus(
        history, incoming, url_col=None, neardup_threshold=None,
        within_batch_threshold=None,
    )
    assert ids(out["admitted"]) == [20]
    assert [s for s, _ in out["stages"]] == ["exact_content_drop"]


def test_no_url_column_needed(spark):
    history = spark.createDataFrame(
        [(1, "historical text body")], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [(2, "historical text body"), (3, "new text body")],
        "doc_id long, text string",
    )
    out = update_corpus(history, incoming, neardup_threshold=None,
                        within_batch_threshold=None)
    assert ids(out["admitted"]) == [3]


def test_plan_only_until_materialized(spark, history):
    """No stage except within-batch dedup runs jobs at build time."""
    incoming = spark.createDataFrame(
        [(30, "some incoming text", "https://example.com/x")],
        "doc_id long, text string, url string",
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    update_corpus(history, incoming, url_col="url",
                  within_batch_threshold=None)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
