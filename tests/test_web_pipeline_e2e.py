"""End-to-end web-corpus pipeline: the round-9 operator surface composed.

Raw crawl (docs + URLs) → incremental admission against history
(update_corpus) → boilerplate/paragraph/quality gates + near-dup dedup
(prepare_training_corpus) → weighted domain mixing (mix_corpora) →
sequence packing. Each stage is unit-tested on its own; this test pins
that they compose — schemas line up, laziness holds until the explicit
actions, and the expected documents flow through.
"""

from pyspark.sql import functions as F

from patito_spark.operators.incremental import update_corpus
from patito_spark.operators.mixing import mix_corpora
from patito_spark.operators.packing import pack_sequences
from patito_spark.operators.pipeline import prepare_training_corpus


def test_web_pipeline_end_to_end(spark):
    footer = "subscribe to our newsletter for daily updates and offers"
    history = spark.createDataFrame(
        [
            (1, "an old article already in the corpus about engines",
             "https://example.com/old", "web"),
        ],
        "doc_id long, text string, url string, domain string",
    )
    crawl = spark.createDataFrame(
        [
            # refetch of history (tracking param variant) -> dropped
            (10, "an old article already in the corpus about engines",
             "https://www.example.com/old?utm_source=feed", "web"),
            # three new pages sharing a boilerplate footer
            (11, f"fresh piece on query optimizers and join orders\n\n{footer}",
             "https://example.com/a", "web"),
            (12, f"notes about shuffle partitioning at scale\n\n{footer}",
             "https://example.com/b", "web"),
            (13, f"profiling adaptive execution in practice\n\n{footer}",
             "https://example.com/c", "web"),
            # a book document, different domain label
            (14, "chapter one of a long book about distributed systems design",
             "https://books.example.org/ch1", "books"),
            # too short after gating
            (15, "tiny", "https://example.com/t", "web"),
            # carries a verbatim copy of doc 11's opening run -> span-cut
            (16, "fresh piece on query optimizers and join orders stolen "
                 "plus an original closing thought on cost models",
             "https://example.com/d", "web"),
        ],
        "doc_id long, text string, url string, domain string",
    )

    admitted = update_corpus(
        history, crawl, url_col="url", neardup_threshold=0.6,
        within_batch_threshold=None,
    )["admitted"]

    prepared = prepare_training_corpus(
        admitted,
        min_tokens=4,
        dedup_threshold=0.7,
        boilerplate_min_docs=3,
        dedup_span_tokens=6,
    )["documents"]
    docs = {r["doc_id"]: r for r in prepared.collect()}
    # 10 refetch-dropped, 15 length-gated; footer removed from 11-13.
    assert sorted(docs) == [11, 12, 13, 14, 16]
    assert all("subscribe" not in r["text"] for r in docs.values())
    assert docs[14]["domain"] == "books"
    # ExactSubstr stage: doc 16 keeps only its novel tail; doc 11 (first
    # occurrence of the shared run) is untouched.
    assert "query optimizers" in docs[11]["text"]
    assert "query optimizers" not in docs[16]["text"]
    assert "closing thought" in docs[16]["text"]

    mixed = mix_corpora(
        {
            "web": prepared.filter(F.col("domain") == "web"),
            "books": prepared.filter(F.col("domain") == "books"),
        },
        weights={"web": 1, "books": 1},
        token_budget=100,  # oversized vs both domains -> epochs repeat
    )["mixed"]

    with_len = mixed.select(
        F.concat_ws(
            ":",
            "mix_source",
            F.col("doc_id").cast("string"),
            F.col("epoch").cast("string"),
        ).alias("uid"),
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    packed = pack_sequences(
        with_len, id_col="uid", length_col="n_tok", max_len=64
    )
    agg = packed.agg(
        F.sum("n_docs").alias("docs"),
        F.sum("total_tokens").alias("toks"),
    ).first()
    # Every mixture row packs exactly once; token mass conserved.
    assert agg["docs"] == mixed.count()
    assert (
        agg["toks"]
        == with_len.agg(F.sum("n_tok")).first()[0]
    )
