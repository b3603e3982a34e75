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

__all__ = [
    "read_csv",
    "read_binary_files",
    "read_json",
    "read_orc",
    "read_parquet",
    "write_bucketed",
    "write_clustered",
    "write_orc",
    "write_parquet",
    "write_training_shards",
]
