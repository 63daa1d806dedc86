"""Reference-compatible JaccardSimilarity (jaccard_similarity.py:8-18 semantics;
similarity column is DOUBLE and pairs are canonical nonzero — SURVEY.md §2)."""

from pyspark_graph_spark.operators.similarity import JaccardSimilarity  # noqa: F401
