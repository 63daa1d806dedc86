from pyspark_graph_spark.ann.brute import BruteForceKNN
from pyspark_graph_spark.ann.ivf import IVFFlat
from pyspark_graph_spark.ann.lsh import RandomHyperplaneLSH

__all__ = ["BruteForceKNN", "IVFFlat", "RandomHyperplaneLSH"]
