"""Reference-compatible KatzIndex (katz_index.py:10-36 intent: the published
module imports a nonexistent matrix package and squares instead of
accumulating the series — this one computes sum of beta^k A^k for real)."""

from pyspark_graph_spark.operators.katz import KatzIndex  # noqa: F401
