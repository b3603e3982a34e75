"""Large-scale training-data-pipeline operators.

Everything here is expressed with built-in DataFrame operations (JVM-side,
Catalyst-optimized); Python/Arrow paths are used only where Spark genuinely
lacks the primitive (multimodal decode stubs).
"""

from patito_spark.operators import (
    contamination,
    conversations,
    dedup,
    graph,
    incremental,
    mixing,
    multimodal,
    packing,
    paragraphs,
    pipeline,
    quality_model,
    sampling,
    selection,
    semdedup,
    similarity,
    sketch,
    skew,
    spans,
    temporal,
    text,
    timeseries,
    tokenizer,
    urls,
)

__all__ = [
    "contamination",
    "conversations",
    "dedup",
    "graph",
    "incremental",
    "mixing",
    "multimodal",
    "packing",
    "paragraphs",
    "pipeline",
    "quality_model",
    "sampling",
    "selection",
    "semdedup",
    "similarity",
    "sketch",
    "skew",
    "spans",
    "temporal",
    "text",
    "timeseries",
    "tokenizer",
    "urls",
]
