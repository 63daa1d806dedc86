"""Reference-compatible LabelPropagation (label_propagation.py:11-35 parity;
ties break deterministically on the smallest label instead of mode()'s
partition-order nondeterminism)."""

from pyspark_graph_spark.operators.label_propagation import (  # noqa: F401
    LABEL,
    LabelPropagation,
)
