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


def test_crawl_ingestion_end_to_end(spark, tmp_path):
    """WARC archive bytes -> read_warc -> extract_html_text ->
    prepare_training_corpus: the ingestion front of the pipeline."""
    import gzip

    from patito_spark.operators.text import extract_html_text
    from patito_spark.sources import read_warc

    def page(title, body_sentences):
        paras = "".join(f"<p>{s}</p>" for s in body_sentences)
        return (
            f"<html><head><title>{title}</title>"
            "<style>.x{color:red}</style>"
            "<script>trackVisitor('LEAKME');</script></head>"
            f"<body><h1>{title}</h1>{paras}"
            "<div>footer boilerplate subscribe now</div></body></html>"
        )

    def record(uri, html, status=200):
        body = html.encode()
        block = (
            f"HTTP/1.1 {status} {'OK' if status == 200 else 'NF'}\r\n"
            "Content-Type: text/html\r\n\r\n"
        ).encode() + body
        head = (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{abs(hash(uri))}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "WARC-Date: 2026-08-15T00:00:00Z\r\n"
            f"Content-Length: {len(block)}\r\n\r\n"
        ).encode()
        return head + block + b"\r\n\r\n"

    sentences = [
        "a long article about distributed query planning and execution",
        "it discusses joins aggregates and the optimizer in detail",
    ]
    archive = b"".join(
        gzip.compress(r)
        for r in (
            record("http://site-a.example/art", page("Article", sentences)),
            # near-duplicate page on another host -> deduped
            record("http://mirror-b.example/art", page("Article", sentences)),
            record("http://site-c.example/other", page(
                "Other", ["completely different content on stream "
                          "processing with watermarks and state stores"])),
            record("http://gone.example/404", "<html>not found</html>", 404),
        )
    )
    d = tmp_path / "segments"
    d.mkdir()
    (d / "seg-00001.warc.gz").write_bytes(archive)

    crawl = (
        read_warc(str(d), glob="*.warc.gz", spark=spark)
        .filter(F.col("http_status") == 200)
        .select(
            F.col("target_uri").alias("url"),
            extract_html_text(F.decode("payload", "UTF-8")).alias("text"),
        )
        .withColumn("doc_id", F.xxhash64("url"))
    )
    docs = prepare_training_corpus(
        crawl, min_tokens=5, dedup_threshold=0.6,
    )["documents"].collect()
    texts = {r["url"]: r["text"] for r in docs}
    # 404 gone; one of the two mirrored pages deduped away
    assert len(texts) == 2
    assert sum("site-a" in u or "mirror-b" in u for u in texts) == 1
    assert any("site-c" in u for u in texts)
    # no JS/CSS leakage through extraction, real content intact
    joined = " ".join(texts.values())
    assert "LEAKME" not in joined and "color" not in joined
    assert "query planning" in joined or "stream" in joined
