"""WARC (Web ARChive) ingestion: crawl files → document rows.

The entry point of a web-crawl training pipeline: Common-Crawl-style
``.warc`` / ``.warc.gz`` files become one row per record with the
headers a corpus pipeline keys on (target URI, date, content type,
HTTP status) plus the raw payload bytes. Downstream is the existing
chain: HTML→text extraction, ``update_corpus`` admission, the
``prepare_training_corpus`` gates.

Format (ISO 28500): a WARC file is a sequence of records, each

    WARC/1.0\r\n
    <Name>: <value>\r\n ...
    \r\n
    <Content-Length bytes of block>
    \r\n\r\n

and a ``.warc.gz`` stores every record as its own gzip member —
Python's ``gzip`` reads multi-member streams transparently, so one
sequential decompress walks the whole file. Parsing is pure stdlib
inside an Arrow-batched ``mapInPandas``; records stream out in bounded
batches, so executor memory holds one decompressed file plus one
output batch, never the whole archive's rows.

Scale notes: Spark's ``binaryFile`` source parallelizes per FILE —
gzip members are not seekable mid-stream, which is why crawl corpora
ship as many ~1 GiB WARCs rather than one large one. Size executor
memory for (compressed + decompressed) of a single archive, or split
upstream. Oversized payloads are truncated at ``max_payload_bytes``
(flagged in the ``truncated`` column) instead of OOMing the batch.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterable, Iterator, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "read_warc",
    "read_warc_stream",
    "read_wet",
    "read_wet_stream",
    "parse_warc_bytes",
]

_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType(), False),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("http_content_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("payload_length", T.LongType(), True),
        T.StructField("truncated", T.BooleanType(), False),
    ]
)


def _parse_headers(block: bytes) -> dict:
    headers: dict = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            name, _, value = line.partition(b":")
            headers[name.strip().lower().decode("latin-1")] = (
                value.strip().decode("latin-1", "replace")
            )
    return headers


def parse_warc_bytes(
    data: bytes,
    warc_file: str = "",
    record_types: Optional[Sequence[str]] = ("response",),
    max_payload_bytes: int = 2_000_000,
) -> Iterator[dict]:
    """Yield one dict per WARC record from raw (decompressed) bytes.

    For ``response`` records the HTTP envelope is split off: ``payload``
    is the HTTP BODY, with the status line and entity Content-Type
    surfaced as columns. Other record types (``warcinfo``, ``request``,
    ``metadata``, ``conversion``...) pass their block through as-is.
    Malformed trailing garbage ends iteration rather than raising —
    truncated crawls are a fact of life.
    """
    want = {t.lower() for t in record_types} if record_types else None
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0 or not data.startswith(b"WARC/", pos):
            break
        headers = _parse_headers(data[pos:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        block_start = head_end + 4
        block = data[block_start : block_start + length]
        pos = block_start + length
        rtype = headers.get("warc-type", "").lower()
        if want is not None and rtype not in want:
            continue
        status = None
        http_ctype = None
        payload = block
        if rtype == "response" and block.startswith(b"HTTP/"):
            env_end = block.find(b"\r\n\r\n")
            if env_end >= 0:
                status_line, _, header_rest = block[:env_end].partition(b"\r\n")
                parts = status_line.split(None, 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                http_ctype = _parse_headers(header_rest).get("content-type")
                payload = block[env_end + 4 :]
        truncated = len(payload) > max_payload_bytes
        # refers_to / content_language ride along for the WET reader
        # (absent from the WARC _SCHEMA, so the WARC path drops them).
        yield {
            "warc_file": warc_file,
            "record_id": headers.get("warc-record-id"),
            "warc_type": rtype or None,
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": status,
            "http_content_type": http_ctype,
            "payload": payload[:max_payload_bytes],
            "payload_length": len(payload),
            "truncated": truncated,
            "refers_to": headers.get("warc-refers-to"),
            "content_language": headers.get(
                "warc-identified-content-language"
            ),
        }


def _maybe_gunzip(fpath: str, data: bytes) -> bytes:
    """Decompress multi-member gzip, keeping everything decodable.

    Truncated members (EOFError) and corrupt trailing bytes
    (BadGzipFile/OSError) end decompression instead of raising — one
    damaged archive in a many-thousand-file crawl must cost its own
    tail records, not the whole job (and in a stream, not wedge the
    checkpoint on a permanently-failing file). Mirrors
    :func:`parse_warc_bytes`'s tolerance at the framing layer.
    """
    if not (fpath.endswith(".gz") or data[:2] == b"\x1f\x8b"):
        return data
    # Member-by-member via zlib (wbits=31 = gzip wrapper), NOT
    # gzip.GzipFile.read(): GzipFile validates lazily across members
    # and one read() call that crosses the damage discards everything
    # it had already decompressed, including earlier GOOD members.
    import zlib

    out = bytearray()
    buf = data
    while buf:
        d = zlib.decompressobj(31)
        try:
            out += d.decompress(buf)
            out += d.flush()
        except zlib.error:
            break  # corrupt member/garbage: keep what we have
        if not d.eof:
            break  # truncated final member: its partial plaintext kept
        buf = d.unused_data
    return bytes(out)


def _make_parse_fn(
    record_types: Optional[Sequence[str]],
    max_payload_bytes: int,
    batch_rows: int,
):
    """The shared mapInPandas closure for batch and streaming readers."""
    import pandas as pd

    def parse(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = _maybe_gunzip(fpath, bytes(content))
                rows: list = []
                for rec in parse_warc_bytes(
                    data,
                    warc_file=fpath,
                    record_types=record_types,
                    max_payload_bytes=max_payload_bytes,
                ):
                    rows.append(rec)
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(rows, columns=_SCHEMA.names)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=_SCHEMA.names)

    return parse


def read_warc(
    path: str,
    glob: Optional[str] = None,
    spark: Optional[SparkSession] = None,
    record_types: Optional[Sequence[str]] = ("response",),
    max_payload_bytes: int = 2_000_000,
    batch_rows: int = 256,
) -> DataFrame:
    """Read ``.warc`` / ``.warc.gz`` archives as one row per record.

    ``record_types`` filters record kinds before any bytes are copied
    (default keeps only ``response`` — the fetched pages); ``None``
    keeps everything. See the module docstring for the schema and the
    per-file parallelism caveat.
    """
    from patito_spark.sources.readers import read_binary_files

    files = read_binary_files(
        path, glob=glob, spark=spark, with_metadata=False
    ).select("path", "content")
    return files.mapInPandas(
        _make_parse_fn(record_types, max_payload_bytes, batch_rows),
        schema=_SCHEMA,
    )


_WET_SCHEMA = T.StructType(
    [
        T.StructField("wet_file", T.StringType(), False),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("refers_to", T.StringType(), True),
        T.StructField("content_language", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("text_length", T.LongType(), True),
        T.StructField("truncated", T.BooleanType(), False),
    ]
)


def _parse_wet_bytes(
    data: bytes, wet_file: str, max_payload_bytes: int
) -> Iterator[dict]:
    """WET records from decompressed bytes: a WET file IS a WARC file
    whose ``conversion`` records carry the pre-extracted page text as a
    UTF-8 ``text/plain`` payload. Reuses :func:`parse_warc_bytes` for
    the framing; surfaces the WET-specific headers (``WARC-Refers-To``
    — the source response record — and Common Crawl's
    ``WARC-Identified-Content-Language``)."""
    for rec in parse_warc_bytes(
        data,
        warc_file=wet_file,
        record_types=("conversion",),
        max_payload_bytes=max_payload_bytes,
    ):
        yield {
            "wet_file": rec["warc_file"],
            "record_id": rec["record_id"],
            "target_uri": rec["target_uri"],
            "warc_date": rec["warc_date"],
            "refers_to": rec["refers_to"],
            "content_language": rec["content_language"],
            "text": rec["payload"].decode("utf-8", "replace"),
            "text_length": rec["payload_length"],
            "truncated": rec["truncated"],
        }


def _make_wet_parse_fn(max_payload_bytes: int, batch_rows: int):
    import pandas as pd

    def parse(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = _maybe_gunzip(fpath, bytes(content))
                rows: list = []
                for rec in _parse_wet_bytes(data, fpath, max_payload_bytes):
                    rows.append(rec)
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(rows, columns=_WET_SCHEMA.names)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=_WET_SCHEMA.names)

    return parse


def read_wet(
    path: str,
    glob: Optional[str] = None,
    spark: Optional[SparkSession] = None,
    max_payload_bytes: int = 2_000_000,
    batch_rows: int = 256,
) -> DataFrame:
    """Read Common-Crawl ``.wet`` / ``.wet.gz`` archives as one TEXT row
    per page.

    WET is the pre-extracted sidecar most public corpus recipes start
    from (CCNet, C4, RefinedWeb all begin at WET or an equivalent):
    WARC framing, one ``conversion`` record per fetched page, payload =
    the page's extracted plain text. Rows arrive ready for the text
    pipeline — ``target_uri`` feeds :func:`..operators.urls.filter_urls`
    / ``dedup_urls``, ``text`` feeds ``prepare_training_corpus`` with
    no HTML-extraction stage.

    Schema: ``wet_file, record_id, target_uri, warc_date, refers_to,
    content_language, text, text_length, truncated``. Decoding is
    UTF-8-with-replacement (the WET contract is UTF-8; damaged bytes
    cost characters, not records). Same per-FILE parallelism and
    executor-memory sizing as :func:`read_warc`.
    """
    from patito_spark.sources.readers import read_binary_files

    files = read_binary_files(
        path, glob=glob, spark=spark, with_metadata=False
    ).select("path", "content")
    return files.mapInPandas(
        _make_wet_parse_fn(max_payload_bytes, batch_rows),
        schema=_WET_SCHEMA,
    )


def read_wet_stream(
    path: str,
    glob: Optional[str] = None,
    spark: Optional[SparkSession] = None,
    max_payload_bytes: int = 2_000_000,
    batch_rows: int = 256,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming :func:`read_wet`: new WET archives become text rows as
    they land (the crawl-as-it-arrives front of the streaming admission
    chain — see :func:`read_warc_stream` for checkpoint/trigger
    semantics)."""
    from patito_spark.sources.readers import _session

    spark = _session(spark)
    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType(), False),
            T.StructField("modificationTime", T.TimestampType(), False),
            T.StructField("length", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    reader = spark.readStream.format("binaryFile").schema(binary_schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(
        _make_wet_parse_fn(max_payload_bytes, batch_rows),
        schema=_WET_SCHEMA,
    )


def read_warc_stream(
    path: str,
    glob: Optional[str] = None,
    spark: Optional[SparkSession] = None,
    record_types: Optional[Sequence[str]] = ("response",),
    max_payload_bytes: int = 2_000_000,
    batch_rows: int = 256,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming :func:`read_warc`: new archives in ``path`` become
    record rows as they land.

    The ingestion-time front of the streaming half — feed the result
    into ``dedup_urls_stream`` / ``streaming_dedup_lsh`` for
    crawl-as-it-arrives admission. Spark's streaming ``binaryFile``
    source tracks processed files in the checkpoint, so each archive
    is parsed exactly once; ``max_files_per_trigger`` bounds per-batch
    work (one archive decompresses fully in memory — same sizing rule
    as the batch reader). The parse is the same stateless
    ``mapInPandas``, so the output supports every trigger mode
    including ``availableNow`` backfills.
    """
    from patito_spark.sources.readers import _session

    spark = _session(spark)
    # streaming file sources require an explicit schema; binaryFile's
    # is fixed by the format
    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType(), False),
            T.StructField("modificationTime", T.TimestampType(), False),
            T.StructField("length", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    reader = spark.readStream.format("binaryFile").schema(binary_schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(
        _make_parse_fn(record_types, max_payload_bytes, batch_rows),
        schema=_SCHEMA,
    )
