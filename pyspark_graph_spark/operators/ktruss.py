"""k-truss decomposition: the maximal subgraph in which every edge closes
at least ``k-2`` triangles (edge-level cohesion — stricter than k-core,
looser than a clique).

Engine extension (no analogue in the reference; complements KCore).
Standard peel: compute per-edge triangle support on the surviving edge
set, drop edges below ``k-2``, repeat to fixpoint. Support enumeration
uses the canonical-order wedge join (a<b<c), the same shape as
TriangleCount's enumeration path — each triangle feeds support to its
three edges.

Scale notes: per round, one self-join on the canonical edge list keyed by
the shared endpoint (wedges), one equi-join closing the wedge, one
support aggregate — all shuffle on edge endpoints, AQE-skew-splittable.
Peeling is monotone (edge set only shrinks), each round localCheckpoints,
and rounds are few in practice (support collapses fast). DENSE graphs are
the k-core trade-off inverted: wedge volume is Σ deg², so on
near-complete graphs enumerate on a restricted edge set first (the same
selectivity-predicate story as two_hop_counts — no plan shape fixes
Θ(V³) triangles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, SRC
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.util import order_edges


class KTruss:
    """Edges of the k-truss. ``max_iterations`` bounds the peel; like
    StronglyConnectedComponents, the operator RAISES if the bound truncates
    the fixpoint rather than returning a silently-wrong superset."""

    def __init__(self, k: int, max_iterations: int = 20):
        if k < 3:
            raise ValueError("k-truss requires k >= 3")
        self.k = k
        self.max_iterations = max_iterations
        self.converged = False
        self.rounds = 0

    @staticmethod
    def _support(edges: DataFrame) -> DataFrame:
        """(src, dst, support) triangle counts per canonical edge."""
        e1 = edges.alias("e1")
        e2 = edges.alias("e2")
        e3 = edges.alias("e3")
        tri = (
            e1.join(e2, on=F.col("e1.dst") == F.col("e2.src"))
            .join(
                e3,
                on=[
                    F.col("e3.src") == F.col("e1.src"),
                    F.col("e3.dst") == F.col("e2.dst"),
                ],
            )
            .select(
                F.col("e1.src").alias("a"),
                F.col("e1.dst").alias("b"),
                F.col("e2.dst").alias("c"),
            )
        )
        per_edge = (
            tri.select(F.col("a").alias(SRC), F.col("b").alias(DST))
            .unionByName(
                tri.select(F.col("b").alias(SRC), F.col("c").alias(DST))
            )
            .unionByName(
                tri.select(F.col("a").alias(SRC), F.col("c").alias(DST))
            )
        )
        return per_edge.groupBy(SRC, DST).agg(
            F.count(F.lit(1)).alias("support")
        )

    def run(self, g: Graph) -> DataFrame:
        """Returns the surviving canonical edges ``(src, dst)``."""
        edges = order_edges(
            g.symmetric_edges.select(SRC, DST)
        ).localCheckpoint()
        self.converged = False
        self.rounds = 0
        for _ in range(self.max_iterations):
            self.rounds += 1
            sup = self._support(edges)
            kept = (
                edges.join(sup, on=[SRC, DST], how="inner")
                .filter(F.col("support") >= self.k - 2)
                .select(SRC, DST)
                .localCheckpoint()
            )
            n_kept, n_before = kept.count(), edges.count()
            edges = kept
            if n_kept == n_before:
                self.converged = True
                break
            if n_kept == 0:
                self.converged = True
                break
        if not self.converged:
            raise RuntimeError(
                f"k-truss peel did not converge within "
                f"{self.max_iterations} rounds — raise max_iterations"
            )
        return edges
