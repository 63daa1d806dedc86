"""Reference-compatible OverlapCoefficient (overlap_coefficient.py:9-25 semantics;
ratio column correctly DOUBLE — the reference declared LongType)."""

from pyspark_graph_spark.operators.similarity import OverlapCoefficient  # noqa: F401
