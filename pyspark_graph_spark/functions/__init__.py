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
from pyspark_graph_spark.functions.lm import unigram_scores
from pyspark_graph_spark.functions.sampling import (
    deterministic_sample,
    quota_sample,
    stratified_sample,
)
from pyspark_graph_spark.functions.shuffle import assign_shards, write_shards
from pyspark_graph_spark.functions.sketch import kmv_distinct

__all__ = [
    "content_fingerprint",
    "unigram_scores",
    "deterministic_sample",
    "quota_sample",
    "stratified_sample",
    "assign_shards",
    "write_shards",
    "kmv_distinct",
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
