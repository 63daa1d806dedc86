"""Reference-compatible ShortestPaths (shortest_paths.py:7-26 intent: the
published module is pseudocode — this is the real map-state implementation)."""

from pyspark_graph_spark.operators.shortest_paths import ShortestPaths  # noqa: F401
