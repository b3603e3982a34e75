"""Model-aware sources and sinks."""

from patito_spark.sources.readers import (
    read_csv,
    read_binary_files,
    read_json,
    read_orc,
    read_parquet,
    write_bucketed,
    write_clustered,
    write_orc,
    write_parquet,
    write_training_shards,
)
from patito_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    read_warc_stream,
    read_wet,
    read_wet_stream,
)

__all__ = [
    "read_csv",
    "read_binary_files",
    "read_json",
    "read_orc",
    "read_parquet",
    "parse_warc_bytes",
    "read_warc",
    "read_warc_stream",
    "read_wet",
    "read_wet_stream",
    "write_bucketed",
    "write_clustered",
    "write_orc",
    "write_parquet",
    "write_training_shards",
]
