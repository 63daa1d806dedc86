"""Reference-compatible BreadthFirstSearch (bfs.py:14-69 parity)."""

from pyspark_graph_spark.operators.bfs import BreadthFirstSearch  # noqa: F401
