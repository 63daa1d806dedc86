from pyspark_graph_spark.dedup.embedding import EmbeddingDedup
from pyspark_graph_spark.dedup.exact import ExactDedup
from pyspark_graph_spark.dedup.incremental import IncrementalDedup
from pyspark_graph_spark.dedup.minhash import MinHashLSH
from pyspark_graph_spark.dedup.ngram import NgramJaccardDedup
from pyspark_graph_spark.dedup.simhash import SimHashDedup
from pyspark_graph_spark.dedup.spans import duplicate_spans

__all__ = [
    "EmbeddingDedup",
    "ExactDedup",
    "IncrementalDedup",
    "MinHashLSH",
    "NgramJaccardDedup",
    "SimHashDedup",
    "duplicate_spans",
]
