"""Reference-compatible TriangleCount (triangle_count.py:6-9 parity)."""

from pyspark_graph_spark.operators.triangle_count import TriangleCount  # noqa: F401
