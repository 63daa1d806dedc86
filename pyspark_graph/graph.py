"""Reference-compatible ``pyspark_graph.graph`` module (graph.py:7-133 parity)."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from pyspark_graph_spark.constants import (  # noqa: F401  (re-exported names)
    ADJ,
    DEGREE,
    DST,
    EDGE_ID,
    ID,
    IN_DEGREE,
    OLD_DST,
    OLD_ID,
    OLD_SRC,
    OUT_DEGREE,
    SRC,
)
from pyspark_graph_spark.graph import Graph as _Graph


class Graph(_Graph):
    """Accepts the reference's ``spark_session`` argument (unused: the
    engine derives everything from the DataFrames themselves)."""

    def __init__(
        self,
        vertices: DataFrame,
        edges: DataFrame,
        directed: bool = True,
        indexed: bool = False,
        spark_session: Optional[SparkSession] = None,
    ):
        self.spark = spark_session or SparkSession.getActiveSession()
        super().__init__(vertices, edges, directed=directed, indexed=indexed)
