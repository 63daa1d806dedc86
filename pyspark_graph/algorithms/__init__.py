"""Reference-compatible ``pyspark_graph.algorithms`` package.

The reference exposes one class per module plus an empty ``Algorithm``
marker base (algorithms/__init__.py:1-2). Same layout here; implementations
delegate to ``pyspark_graph_spark.operators``.
"""


class Algorithm:
    pass


from pyspark_graph.algorithms.aggregate_messages import AggregateMessages  # noqa: E402,F401
from pyspark_graph.algorithms.bfs import BreadthFirstSearch  # noqa: E402,F401
from pyspark_graph.algorithms.connected_components import (  # noqa: E402,F401
    AlternatingConnectedComponents,
    ConnectedComponents,
)
from pyspark_graph.algorithms.jaccard_similarity import JaccardSimilarity  # noqa: E402,F401
from pyspark_graph.algorithms.katz_index import KatzIndex  # noqa: E402,F401
from pyspark_graph.algorithms.label_propagation import LabelPropagation  # noqa: E402,F401
from pyspark_graph.algorithms.overlap_coefficient import OverlapCoefficient  # noqa: E402,F401
from pyspark_graph.algorithms.pregel import Pregel  # noqa: E402,F401
from pyspark_graph.algorithms.shortest_paths import ShortestPaths  # noqa: E402,F401
from pyspark_graph.algorithms.triangle_count import TriangleCount  # noqa: E402,F401
from pyspark_graph.algorithms.wl_kernel import WLKernel  # noqa: E402,F401
