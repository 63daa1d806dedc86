from pyspark_graph_spark.dedup.embedding import EmbeddingDedup
from pyspark_graph_spark.dedup.exact import ExactDedup
from pyspark_graph_spark.dedup.incremental import IncrementalDedup
from pyspark_graph_spark.dedup.minhash import MinHashLSH
from pyspark_graph_spark.dedup.ngram import NgramJaccardDedup
from pyspark_graph_spark.dedup.simhash import SimHashDedup
from pyspark_graph_spark.dedup.spans import duplicate_spans
from pyspark_graph_spark.dedup.blocking import sorted_neighborhood_pairs
from pyspark_graph_spark.dedup.setjoin import PrefixFilterSetJoin
from pyspark_graph_spark.dedup.winnow import winnow_matches, winnow_select

__all__ = [
    "winnow_select",
    "winnow_matches",
    "PrefixFilterSetJoin",
    "sorted_neighborhood_pairs",
    "EmbeddingDedup",
    "ExactDedup",
    "IncrementalDedup",
    "MinHashLSH",
    "NgramJaccardDedup",
    "SimHashDedup",
    "duplicate_spans",
]
