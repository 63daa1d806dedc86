from pyspark_graph_spark.operators.similarity import (
    JaccardSimilarity,
    OverlapCoefficient,
)
from pyspark_graph_spark.operators.triangle_count import TriangleCount

__all__ = [
    "JaccardSimilarity",
    "OverlapCoefficient",
    "TriangleCount",
]
