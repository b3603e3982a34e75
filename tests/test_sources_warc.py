"""WARC ingestion: record framing, HTTP envelope split, gzip members,
record-type filter, truncation guard."""

import gzip

import pytest

from patito_spark.sources.warc import parse_warc_bytes, read_warc


def _record(rtype, uri, body, record_id="<urn:uuid:1>", http=True,
            extra_headers=()):
    if rtype == "response" and http:
        block = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=UTF-8\r\n"
            b"X-Ignored: yes\r\n\r\n" + body
        )
    else:
        block = body
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Record-ID: " + record_id.encode(),
        b"WARC-Date: 2026-08-15T00:00:00Z",
    ]
    if uri:
        headers.append(b"WARC-Target-URI: " + uri.encode())
    headers += [h.encode() for h in extra_headers]
    headers.append(b"Content-Length: " + str(len(block)).encode())
    return b"\r\n".join(headers) + b"\r\n\r\n" + block + b"\r\n\r\n"


def _warc_bytes():
    return (
        _record("warcinfo", None, b"software: test\r\n")
        + _record("request", "http://a.example/", b"GET / HTTP/1.1\r\n")
        + _record("response", "http://a.example/", b"<html>hello a</html>")
        + _record("response", "http://b.example/", b"<html>hello b</html>",
                  record_id="<urn:uuid:2>")
    )


def test_parse_warc_bytes_frames_and_http_split():
    recs = list(parse_warc_bytes(_warc_bytes(), record_types=None))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response", "response"]
    resp = recs[2]
    assert resp["target_uri"] == "http://a.example/"
    assert resp["payload"] == b"<html>hello a</html>"  # envelope stripped
    assert resp["http_status"] == 200
    assert resp["http_content_type"] == "text/html; charset=UTF-8"
    assert resp["warc_date"] == "2026-08-15T00:00:00Z"
    # default filter keeps responses only
    only = list(parse_warc_bytes(_warc_bytes()))
    assert len(only) == 2 and {r["warc_type"] for r in only} == {"response"}
    # trailing garbage ends iteration, never raises
    assert len(list(parse_warc_bytes(_warc_bytes() + b"garbage"))) == 2


def test_parse_truncation_guard():
    big = _record("response", "http://big.example/", b"x" * 1000)
    (rec,) = parse_warc_bytes(big, max_payload_bytes=100)
    assert rec["truncated"] is True
    assert len(rec["payload"]) == 100
    assert rec["payload_length"] == 1000


def test_read_warc_plain_and_gzip(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc").write_bytes(_warc_bytes())
    # .warc.gz: every record its own gzip member (the spec's layout)
    members = b"".join(
        gzip.compress(_record("response", f"http://gz{i}.example/",
                              f"<html>gz {i}</html>".encode(),
                              record_id=f"<urn:uuid:gz{i}>"))
        for i in range(3)
    )
    (d / "b.warc.gz").write_bytes(members)

    out = read_warc(str(d), spark=spark)
    rows = out.collect()
    assert len(rows) == 5  # 2 plain + 3 gzip responses
    by_uri = {r["target_uri"]: r for r in rows}
    assert by_uri["http://gz1.example/"]["payload"] == b"<html>gz 1</html>"
    assert by_uri["http://a.example/"]["http_status"] == 200
    assert all(not r["truncated"] for r in rows)
    assert all(r["warc_file"] for r in rows)
    # glob filter narrows to one archive
    gz_only = read_warc(str(d), glob="*.warc.gz", spark=spark)
    assert gz_only.count() == 3


def test_read_warc_feeds_text_pipeline(spark, tmp_path):
    from pyspark.sql import functions as F

    d = tmp_path / "crawl2"
    d.mkdir()
    (d / "c.warc").write_bytes(_warc_bytes())
    docs = (
        read_warc(str(d), spark=spark)
        .select(
            F.col("target_uri").alias("url"),
            F.decode("payload", "UTF-8").alias("text"),
        )
    )
    got = {r["url"]: r["text"] for r in docs.collect()}
    assert got["http://b.example/"] == "<html>hello b</html>"


def test_read_warc_stream_available_now(spark, tmp_path):
    from patito_spark.sources.warc import read_warc_stream

    d = tmp_path / "stream-crawl"
    d.mkdir()
    (d / "a.warc").write_bytes(_warc_bytes())
    members = b"".join(
        gzip.compress(_record("response", f"http://s{i}.example/",
                              f"<html>s {i}</html>".encode(),
                              record_id=f"<urn:uuid:s{i}>"))
        for i in range(2)
    )
    (d / "b.warc.gz").write_bytes(members)

    stream = read_warc_stream(str(d), spark=spark)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("warc_stream_sink")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM warc_stream_sink").collect()
    assert len(rows) == 4  # 2 plain responses + 2 gzip responses
    uris = {r["target_uri"] for r in rows}
    assert "http://s0.example/" in uris and "http://a.example/" in uris


def test_streaming_ingestion_front_composes(spark, tmp_path):
    """read_warc_stream -> filter_urls -> extract_html_text on ONE
    stream: the gates are pure projections/filters, so the whole
    ingestion front applies to a readStream unchanged."""
    from pyspark.sql import functions as F

    from patito_spark.operators.text import extract_html_text
    from patito_spark.operators.urls import filter_urls
    from patito_spark.sources.warc import read_warc_stream

    d = tmp_path / "front"
    d.mkdir()
    html = ("<html><head><script>bad()</script></head>"
            "<body><p>kept page body</p></body></html>")
    archive = (
        _record("response", "https://keep.example/page", html.encode())
        + _record("response", "https://cdn.example/style.css",
                  b"body { color: red }", record_id="<urn:uuid:css>")
    )
    (d / "c.warc").write_bytes(archive)

    docs = (
        read_warc_stream(str(d), spark=spark)
        .filter(F.col("http_status") == 200)
        .transform(lambda s: filter_urls(s, url_col="target_uri"))
        .select(
            F.col("target_uri").alias("url"),
            extract_html_text(F.decode("payload", "UTF-8")).alias("text"),
        )
    )
    assert docs.isStreaming
    q = (
        docs.writeStream.format("memory").queryName("t_ingest_front")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM t_ingest_front").collect()
    assert len(rows) == 1  # .css gated out pre-decode
    assert rows[0]["url"] == "https://keep.example/page"
    assert rows[0]["text"] == "kept page body"


def test_truncated_gzip_member_keeps_decoded_records(spark, tmp_path):
    """A mid-member truncation costs the damaged tail only — never the
    task (4 retries would otherwise fail the whole job / wedge the
    streaming checkpoint on the same file forever)."""
    d = tmp_path / "damaged"
    d.mkdir()
    good = gzip.compress(_record("response", "http://ok.example/",
                                 b"<html>ok</html>"))
    lost = gzip.compress(_record("response", "http://lost.example/",
                                 b"<html>lost</html>"))
    # cut INTO the deflate stream (half the member), not just the trailer
    (d / "t.warc.gz").write_bytes(good + lost[: len(lost) // 2])
    rows = read_warc(str(d), glob="t.warc.gz", spark=spark).collect()
    uris = [r["target_uri"] for r in rows]
    assert "http://ok.example/" in uris  # good member always survives
    assert set(uris) <= {"http://ok.example/", "http://lost.example/"}

    (d / "u.warc.gz").write_bytes(good + b"not gzip at all")
    rows2 = read_warc(str(d), glob="u.warc.gz", spark=spark).collect()
    assert [r["target_uri"] for r in rows2] == ["http://ok.example/"]


def _wet_record(uri, text, record_id="<urn:uuid:w1>", lang=None):
    extra = ["WARC-Refers-To: <urn:uuid:source-" + record_id.strip("<>") + ">",
             "Content-Type: text/plain"]
    if lang:
        extra.append("WARC-Identified-Content-Language: " + lang)
    return _record("conversion", uri, text.encode("utf-8"),
                   record_id=record_id, http=False, extra_headers=extra)


def _wet_bytes():
    return (
        _record("warcinfo", None, b"software: test-wet\r\n")
        + _wet_record("http://a.example/page", "Hello paragraph one.\n\n"
                      "Second paragraph with more words here.",
                      record_id="<urn:uuid:w1>", lang="eng")
        + _wet_record("http://b.example/other", "Ein anderes Dokument mit "
                      "genug Text zum Behalten im Korpus.",
                      record_id="<urn:uuid:w2>", lang="deu")
    )


def test_read_wet_records_plain_and_gzip(spark, tmp_path):
    from patito_spark.sources.warc import read_wet

    d = tmp_path / "wet"
    d.mkdir()
    (d / "a.warc.wet").write_bytes(_wet_bytes())
    members = b"".join(
        gzip.compress(_wet_record(f"http://gz{i}.example/", f"gz text {i}",
                                  record_id=f"<urn:uuid:g{i}>", lang="eng"))
        for i in range(3)
    )
    (d / "b.warc.wet.gz").write_bytes(members)

    rows = read_wet(str(d), spark=spark).collect()
    assert len(rows) == 5  # warcinfo filtered; 2 plain + 3 gzip conversions
    by_uri = {r["target_uri"]: r for r in rows}
    a = by_uri["http://a.example/page"]
    assert a["text"].startswith("Hello paragraph one.")
    assert a["content_language"] == "eng"
    assert a["refers_to"] == "<urn:uuid:source-urn:uuid:w1>"
    assert by_uri["http://b.example/other"]["content_language"] == "deu"
    assert by_uri["http://gz2.example/"]["text"] == "gz text 2"
    assert all(not r["truncated"] for r in rows)
    # WARC reader on the same file keeps the payload as bytes
    from patito_spark.sources.warc import read_warc

    warc_rows = read_warc(str(d), glob="a.warc.wet", spark=spark,
                          record_types=("conversion",)).collect()
    assert {bytes(r["payload"]).decode() for r in warc_rows} == {
        r["text"] for r in rows if r["wet_file"].endswith("a.warc.wet")
    }


def test_read_wet_truncation_and_bad_utf8(spark, tmp_path):
    from patito_spark.sources.warc import read_wet

    d = tmp_path / "wet-trunc"
    d.mkdir()
    body = b"ok \xff\xfe broken utf8 " + b"x" * 500
    rec = _record("conversion", "http://t.example/", body, http=False)
    (d / "t.warc.wet").write_bytes(rec)
    (row,) = read_wet(str(d), spark=spark, max_payload_bytes=100).collect()
    assert row["truncated"] is True
    assert row["text_length"] == len(body)
    assert "�" in row["text"]  # replacement, not a crash
    assert len(row["text"]) <= 100


def test_read_wet_feeds_training_pipeline(spark, tmp_path):
    """The WET promise: rows go straight into prepare_training_corpus
    with no HTML-extraction stage — e2e from synthesized .wet.gz."""
    from pyspark.sql import functions as F

    from patito_spark.operators.pipeline import prepare_training_corpus
    from patito_spark.sources.warc import read_wet

    d = tmp_path / "wet-e2e"
    d.mkdir()
    long_text = ("useful sentence with several words repeated nowhere "
                 "else in this corpus number %d and then some filler")
    members = b"".join(
        gzip.compress(_wet_record(f"https://site{i}.example/p", long_text % i,
                                  record_id=f"<urn:uuid:e{i}>", lang="eng"))
        for i in range(4)
    )
    # an exact duplicate of doc 0 under a different URI, to be deduped
    members += gzip.compress(_wet_record("https://mirror.example/p",
                                         long_text % 0,
                                         record_id="<urn:uuid:dup>",
                                         lang="eng"))
    (d / "crawl.warc.wet.gz").write_bytes(members)

    docs = read_wet(str(d), spark=spark).select(
        F.col("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        "text",
    )
    out = prepare_training_corpus(docs, min_tokens=5, dedup_threshold=0.7)
    kept = out["documents"].collect()
    assert len(kept) == 4  # the mirror duplicate collapsed
    assert {r["doc_id"] for r in kept} <= {f"<urn:uuid:e{i}>" for i in range(4)} | {"<urn:uuid:dup>"}
    assert all(r["url"] for r in kept)  # non-text columns preserved


def test_read_wet_stream_available_now(spark, tmp_path):
    from patito_spark.sources.warc import read_wet_stream

    d = tmp_path / "wet-stream"
    d.mkdir()
    (d / "a.warc.wet").write_bytes(_wet_bytes())
    stream = read_wet_stream(str(d), spark=spark)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory").queryName("wet_stream_sink")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "wet-ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM wet_stream_sink").collect()
    assert {r["target_uri"] for r in rows} == {
        "http://a.example/page", "http://b.example/other"}
