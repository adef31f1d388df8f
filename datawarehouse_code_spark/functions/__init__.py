from datawarehouse_code_spark.functions.scalars import (
    cosine_similarity,
    dot_product,
    l2_norm,
    quarter_start_month,
    surrogate_hash_key,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "quarter_start_month",
    "surrogate_hash_key",
]
