"""Reference-compatible ``pyspark_graph.datalog`` (datalog.py:10-66 parity;
negation anti-joins on shared variables — the documented intent)."""

from pyspark_graph_spark.datalog import (  # noqa: F401
    DatalogQuery,
    Edge,
    Premise,
    Vertex,
)
