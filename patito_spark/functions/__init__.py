"""Expression-level helper functions (all JVM-side, codegen-friendly)."""

from patito_spark.functions.vector import cosine_similarity, dot_product, l2_norm

__all__ = ["cosine_similarity", "dot_product", "l2_norm"]
