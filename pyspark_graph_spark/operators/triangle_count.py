"""Triangle counting via canonicalized motif join (reference triangle_count.py:6-9).

Edges are canonicalized (self-loops dropped, endpoints ordered ascending,
deduped) so each undirected triangle ``a<b<c`` is matched exactly once by the
pattern ``(a,b),(b,c),(a,c)``.

Physical plan: two shuffled equi-joins over the canonical edge list — the
standard distributed triangle enumeration. At 100 TB scale the dominant cost
is the join on high-degree vertices; AQE skew-join splitting handles moderate
skew, and a degree-ordered orientation (each edge stored from the
lower-degree endpoint) is the classic further optimization if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.util import match_structure, order_edges


class TriangleCount:
    """Count (or enumerate) triangles in the undirected view of a graph."""

    def triangles(self, g: Graph) -> DataFrame:
        """DataFrame of one row per triangle, columns (a, b, c) with a<b<c."""
        return match_structure(
            order_edges(g.edges), [("a", "b"), ("b", "c"), ("a", "c")]
        )

    def run(self, g: Graph) -> int:
        return self.triangles(g).count()
