"""Structured Streaming integration."""

from patito_spark.streaming.dedup import (
    dedup_conversations_stream,
    dedup_paragraphs_stream,
    dedup_urls_stream,
    streaming_dedup_lsh,
)
from patito_spark.streaming.validate import (
    read_stream,
    session_window_aggregate,
    sessionize_stream,
    stateful_dedup_stream,
    stream_stream_join,
    streaming_apply_changes,
    windowed_aggregate,
    write_stream_merge,
    write_stream_validated,
)

__all__ = [
    "read_stream",
    "session_window_aggregate",
    "sessionize_stream",
    "stateful_dedup_stream",
    "stream_stream_join",
    "streaming_apply_changes",
    "dedup_conversations_stream",
    "dedup_paragraphs_stream",
    "dedup_urls_stream",
    "streaming_dedup_lsh",
    "windowed_aggregate",
    "write_stream_merge",
    "write_stream_validated",
]
