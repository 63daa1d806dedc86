"""Reference-compatible AggregateMessages (intent of aggregate_messages.py:14-45,
which is unimportable as published — see SURVEY.md §2.9)."""

from pyspark_graph_spark.operators.aggregate_messages import (  # noqa: F401
    AggregateMessages,
)
