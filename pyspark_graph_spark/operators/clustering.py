"""Local clustering coefficient — per-vertex triangle density.

cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) where T(v) is the number of triangles
through v over the undirected distinct-neighbor view; vertices of degree < 2
get 0. Plans as one motif join (canonical triangles counted once per corner
via three per-corner aggregations) + the degree aggregation — no iteration.

Scale: same wedge-bound cost as triangle counting; hub corners dominate —
AQE skew-splittable, and at extreme scale approximate per-vertex triangle
counts (edge sampling / DOULION-style) slot into the same frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DEGREE, DST, ID, SRC
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.operators.triangle_count import TriangleCount

CLUSTERING = "clustering"


class LocalClusteringCoefficient:
    def run(self, g: Graph) -> DataFrame:
        """(id, clustering double) for every vertex."""
        tris = TriangleCount().triangles(g).localCheckpoint()
        per_corner = (
            tris.select(F.col("a").alias(ID))
            .unionByName(tris.select(F.col("b").alias(ID)))
            .unionByName(tris.select(F.col("c").alias(ID)))
            .groupBy(ID)
            .agg(F.count(F.lit(1)).alias("__t"))
        )
        # undirected distinct-neighbor degrees regardless of graph flag
        und = Graph(
            g.vertices.select(ID), g.edges.select(SRC, DST),
            directed=False, indexed=True,
        )
        deg = und.degrees
        return deg.join(per_corner, on=ID, how="left").select(
            ID,
            F.when(
                F.col(DEGREE) >= 2,
                2.0
                * F.coalesce(F.col("__t"), F.lit(0))
                / (F.col(DEGREE) * (F.col(DEGREE) - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias(CLUSTERING),
        )
