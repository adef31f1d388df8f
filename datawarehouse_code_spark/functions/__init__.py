from datawarehouse_code_spark.functions.scalars import (
    cosine_similarity,
    date_key,
    dot_product,
    l2_norm,
    quarter_start_month,
    surrogate_hash_key,
    surrogate_hash_key128,
)

__all__ = [
    "cosine_similarity",
    "date_key",
    "dot_product",
    "l2_norm",
    "quarter_start_month",
    "surrogate_hash_key",
    "surrogate_hash_key128",
]
