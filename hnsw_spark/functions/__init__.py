from hnsw_spark.functions.similarity import (
    cosine_similarity,
    dot_product,
    euclidean_distance,
    euclidean_similarity,
    get_metric,
    l2_norm,
)

__all__ = [
    "dot_product",
    "cosine_similarity",
    "euclidean_distance",
    "euclidean_similarity",
    "l2_norm",
    "get_metric",
]
