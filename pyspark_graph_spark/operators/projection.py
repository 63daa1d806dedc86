"""Graph summary statistics and bipartite projection.

Small first-class operators a graph workbench needs around the core
algorithms; both are single-aggregation / single-join plans that Catalyst
optimizes fully (no iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DEGREE, DST, ID, SRC
from pyspark_graph_spark.graph import Graph


def graph_summary(g: Graph) -> DataFrame:
    """One-row summary: vertex/edge counts and degree statistics (degrees
    per the graph's own semantics — distinct neighbors when undirected,
    isolated vertices counted with 0 there)."""
    counts = g.vertices.select(
        F.count(F.lit(1)).alias("n_vertices")
    ).crossJoin(g.edges.select(F.count(F.lit(1)).alias("n_edges")))
    degs = g.degrees.agg(
        F.max(DEGREE).cast("long").alias("max_degree"),
        F.avg(DEGREE).alias("avg_degree"),
    )
    return counts.crossJoin(degs)


def bipartite_project(g: Graph, onto: str = "src") -> DataFrame:
    """Project a bipartite graph onto one side: vertices of that side,
    connected when they share a neighbor on the other side. Canonical
    (src < dst) deduped pairs with the shared-neighbor count as weight.

    ``onto="src"`` connects source-side vertices sharing a destination;
    ``onto="dst"`` the mirror image.

    One self-equi-join on the shared-neighbor key (candidate volume
    Σ deg² over the *other* side — cap hub vertices upstream for power-law
    data) plus one pair aggregation.
    """
    if onto not in (SRC, DST):
        raise ValueError("onto must be 'src' or 'dst'")
    other = DST if onto == SRC else SRC
    pairs = g.edges.select(
        F.col(onto).alias("__v"), F.col(other).alias("__nb")
    ).distinct()
    a = pairs.alias("a")
    b = pairs.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.__nb") == F.col("b.__nb"),
                F.col("a.__v") < F.col("b.__v"),
            ],
        )
        .groupBy(
            F.col("a.__v").alias(SRC), F.col("b.__v").alias(DST)
        )
        .agg(F.count(F.lit(1)).alias("weight"))
    )
