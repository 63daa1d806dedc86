from pyspark_graph_spark.ann.brute import BruteForceKNN
from pyspark_graph_spark.ann.ivf import IVFFlat
from pyspark_graph_spark.ann.kmeans import KMeans
from pyspark_graph_spark.ann.lsh import RandomHyperplaneLSH
from pyspark_graph_spark.ann.pq import ProductQuantizer

from pyspark_graph_spark.ann.kcenter import KCenterSelection
__all__ = [
    "KCenterSelection",
    "BruteForceKNN",
    "IVFFlat",
    "KMeans",
    "ProductQuantizer",
    "RandomHyperplaneLSH",
]
