"""k-core decomposition — iterative peeling of low-degree vertices.

The k-core is the maximal subgraph where every vertex has degree ≥ k (over
the undirected distinct-neighbor view). Computed by repeatedly deleting
vertices of degree < k until a fixpoint; each round is one degree
aggregation + two semi-joins, checkpointed. Rounds are bounded by the
peeling depth (typically small; worst case O(V)).

``core_numbers`` runs the peeling for increasing k to label every vertex
with the largest k whose k-core contains it — the standard coreness
measure for influence/robustness analysis.

Scale: per round one shuffle on the vertex id over a shrinking edge set;
the degeneracy loop in ``core_numbers`` multiplies by the graph's
degeneracy (small for real-world sparse graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.util import checkpoint_observed

CORE = "core"


def _sym(edges: DataFrame) -> DataFrame:
    return (
        edges.select(SRC, DST)
        .unionByName(
            edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        )
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
    )


class KCore:
    def __init__(self, k: int, max_iterations: int = 100):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.max_iterations = max_iterations

    def run(self, g: Graph) -> DataFrame:
        """Vertex ids belonging to the k-core (single ``id`` column)."""
        # the stability probe rides each checkpoint job (round 12,
        # checkpoint_observed): comparing this round's observed row count
        # to last round's replaces the two count actions per round
        edges, m = checkpoint_observed(_sym(g.edges), __n=F.count(F.lit(1)))
        n_edges = m["__n"] or 0
        for _ in range(self.max_iterations):
            deg = edges.groupBy(SRC).agg(F.count(F.lit(1)).alias("__d"))
            keep = deg.filter(F.col("__d") >= self.k).select(
                F.col(SRC).alias(ID)
            )
            pruned, mp = checkpoint_observed(
                edges.join(keep.withColumnRenamed(ID, SRC), SRC, "semi")
                .join(keep.withColumnRenamed(ID, DST), DST, "semi")
                .select(SRC, DST),
                __n=F.count(F.lit(1)),
            )
            n_pruned = mp["__n"] or 0
            edges = pruned
            if n_pruned == n_edges:
                break
            n_edges = n_pruned
        return edges.select(F.col(SRC).alias(ID)).distinct()


def core_numbers(g: Graph, max_k: int | None = None) -> DataFrame:
    """(id, core) — the coreness of every vertex (0 for isolated).

    Peels incrementally: the k-core is computed from the (k-1)-core's
    (already-shrunken, checkpointed) edge set, not from scratch.
    """
    verts = g.vertices.select(ID).localCheckpoint()
    result = verts.withColumn(CORE, F.lit(0))
    # same checkpoint_observed fold as KCore.run: one job per peel round
    # instead of three, and the member-emptiness probe follows from the
    # observed edge count (a nonempty symmetric edge list always has
    # members)
    edges, m0 = checkpoint_observed(_sym(g.edges), __n=F.count(F.lit(1)))
    n_edges = m0["__n"] or 0
    k = 1
    while n_edges > 0 and (max_k is None or k <= max_k):
        # peel to the k-core within the current subgraph
        while True:
            deg = edges.groupBy(SRC).agg(F.count(F.lit(1)).alias("__d"))
            keep = deg.filter(F.col("__d") >= k).select(F.col(SRC).alias(ID))
            pruned, mp = checkpoint_observed(
                edges.join(keep.withColumnRenamed(ID, SRC), SRC, "semi")
                .join(keep.withColumnRenamed(ID, DST), DST, "semi")
                .select(SRC, DST),
                __n=F.count(F.lit(1)),
            )
            stable = (mp["__n"] or 0) == n_edges
            n_edges = mp["__n"] or 0
            edges = pruned
            if stable:
                break
        members = edges.select(F.col(SRC).alias(ID)).distinct()
        if n_edges == 0:
            break
        result = (
            result.join(members.withColumn("__in", F.lit(1)), ID, "left")
            .select(
                ID,
                F.when(F.col("__in").isNotNull(), F.lit(k))
                .otherwise(F.col(CORE))
                .alias(CORE),
            )
            .localCheckpoint()
        )
        k += 1
    return result
