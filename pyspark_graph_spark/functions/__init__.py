from pyspark_graph_spark.functions.text import (
    content_fingerprint,
    language_guess,
    normalized_text,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)
from pyspark_graph_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "content_fingerprint",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "language_guess",
    "normalized_text",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "token_count",
    "tokens",
    "word_shingles",
]
