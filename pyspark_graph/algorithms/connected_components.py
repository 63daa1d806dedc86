"""Reference-compatible connected components (connected_components.py:18-92).

Note: the reference docstring claims SCC on directed graphs; min-label
propagation computes weakly connected components (SURVEY.md §2.12) — both
classes here compute WCC for any graph, documented honestly."""

from pyspark_graph_spark.operators.connected_components import (  # noqa: F401
    COMPONENT,
    AlternatingConnectedComponents,
    ConnectedComponents,
)
