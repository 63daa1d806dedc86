from pyspark_graph_spark.operators.aggregate_messages import AggregateMessages
from pyspark_graph_spark.operators.ktruss import KTruss
from pyspark_graph_spark.operators.spectral import HITS, EigenvectorCentrality
from pyspark_graph_spark.operators.betweenness import BetweennessCentrality
from pyspark_graph_spark.operators.bfs import BreadthFirstSearch
from pyspark_graph_spark.operators.clustering import LocalClusteringCoefficient
from pyspark_graph_spark.operators.connected_components import (
    AlternatingConnectedComponents,
    ConnectedComponents,
)
from pyspark_graph_spark.operators.communities import (
    attribute_assortativity,
    conductance,
)
from pyspark_graph_spark.operators.katz import KatzIndex
from pyspark_graph_spark.operators.link_prediction import LinkPrediction
from pyspark_graph_spark.operators.kcore import KCore, core_numbers
from pyspark_graph_spark.operators.mis import MaximalIndependentSet, greedy_coloring
from pyspark_graph_spark.operators.matching import MaximalMatching
from pyspark_graph_spark.operators.bipartite import BipartiteCheck
from pyspark_graph_spark.operators.dag import TopologicalLayers
from pyspark_graph_spark.operators.mst import BoruvkaMST
from pyspark_graph_spark.operators.neighborhood import NeighborhoodFunction
from pyspark_graph_spark.operators.svd import power_iteration_svd
from pyspark_graph_spark.operators.pagerank import (
    PageRank,
    parallel_personalized_pagerank,
)
from pyspark_graph_spark.operators.projection import bipartite_project, graph_summary
from pyspark_graph_spark.operators.scc import StronglyConnectedComponents
from pyspark_graph_spark.operators.simrank import SimRank
from pyspark_graph_spark.operators.label_propagation import LabelPropagation
from pyspark_graph_spark.operators.shortest_paths import ShortestPaths
from pyspark_graph_spark.operators.pregel import Pregel
from pyspark_graph_spark.operators.similarity import (
    JaccardSimilarity,
    NeighborhoodContainment,
    OverlapCoefficient,
)
from pyspark_graph_spark.operators.triangle_count import TriangleCount
from pyspark_graph_spark.operators.walks import Node2VecWalks, RandomWalks
from pyspark_graph_spark.operators.weighted_paths import WeightedShortestPaths
from pyspark_graph_spark.operators.wl_kernel import WLKernel
from pyspark_graph_spark.operators.louvain import Louvain, modularity
from pyspark_graph_spark.operators.neighbor_sampling import NeighborSampler
from pyspark_graph_spark.operators.temporal import (
    as_of_join,
    graph_at,
    range_join_points_intervals,
    windowed_graph_metrics,
)

from pyspark_graph_spark.operators.dag import CriticalPath
from pyspark_graph_spark.operators.temporal import interval_overlap_join
__all__ = [
    "interval_overlap_join",
    "CriticalPath",
    "AggregateMessages",
    "AlternatingConnectedComponents",
    "BetweennessCentrality",
    "BipartiteCheck",
    "BoruvkaMST",
    "BreadthFirstSearch",
    "TopologicalLayers",
    "ConnectedComponents",
    "JaccardSimilarity",
    "KCore",
    "KTruss",
    "KatzIndex",
    "LabelPropagation",
    "LinkPrediction",
    "LocalClusteringCoefficient",
    "MaximalMatching",
    "attribute_assortativity",
    "conductance",
    "MaximalIndependentSet",
    "NeighborhoodContainment",
    "ShortestPaths",
    "OverlapCoefficient",
    "EigenvectorCentrality",
    "HITS",
    "PageRank",
    "parallel_personalized_pagerank",
    "power_iteration_svd",
    "Pregel",
    "SimRank",
    "RandomWalks",
    "Node2VecWalks",
    "NeighborhoodFunction",
    "Louvain",
    "modularity",
    "NeighborSampler",
    "as_of_join",
    "range_join_points_intervals",
    "graph_at",
    "windowed_graph_metrics",
    "StronglyConnectedComponents",
    "TriangleCount",
    "WeightedShortestPaths",
    "bipartite_project",
    "core_numbers",
    "greedy_coloring",
    "graph_summary",
    "WLKernel",
]
