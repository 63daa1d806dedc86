"""Reference-compatible ``pyspark_graph.util`` (util.py:9-39 parity)."""

from pyspark_graph_spark.util import (  # noqa: F401
    match_structure,
    multiple_join,
    multiple_union,
    ne_null_safe,
    order_edges,
)
