"""SimRank structural similarity (Jeh & Widom, KDD 2002).

"Two objects are similar if they are referenced by similar objects":

    s(a,a) = 1
    s(a,b) = C / (|I(a)||I(b)|) · Σ_{i∈I(a), j∈I(b)} s(i,j)

computed by fixpoint iteration from the diagonal. The pair-scores frame
*is* the iteration state: starting from the diagonal and joining through
in-edges twice per round grows the support to exactly the pairs backward-
co-reachable within k hops — no all-pairs universe is ever materialized
up front.

Exact SimRank is inherently quadratic in the worst case (dense graphs
converge toward O(V²) nonzero pairs); the scale controls are

- ``eps`` — threshold pruning: pairs whose score falls below ``eps`` are
  dropped each round (the standard practical variant; keeps the state
  proportional to the *meaningfully similar* pairs), and
- running on a candidate subgraph (e.g. one community / one LSH block),
  the same way the Jaccard/containment operators here are deployed.

Each round is two hash joins through the edge list plus one aggregation —
all key-partitioned, map-side-combinable, checkpointed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph


class SimRank:
    """Iterated exact SimRank over (a, b, score) pair state.

    Returns pairs ``(a, b, simrank)`` with ``a < b`` and score > 0 (the
    measure is symmetric; the diagonal is fixed at 1 and omitted).
    """

    def __init__(
        self,
        c: float = 0.8,
        max_iterations: int = 3,
        eps: float | None = None,
    ):
        self.c = c
        self.max_iterations = max_iterations
        self.eps = eps

    def run(self, g: Graph) -> DataFrame:
        edges = (
            g.edges.select(SRC, DST)
            if g.directed
            else g.symmetric_edges.select(SRC, DST)
        ).distinct()
        din = edges.groupBy(DST).agg(F.count(F.lit(1)).alias("d"))

        s = g.vertices.select(
            F.col(ID).alias("a"), F.col(ID).alias("b"), F.lit(1.0).alias("s")
        ).localCheckpoint()

        e1 = edges.select(F.col(SRC).alias("a"), F.col(DST).alias("na"))
        e2 = edges.select(F.col(SRC).alias("b"), F.col(DST).alias("nb"))
        for _ in range(self.max_iterations):
            contrib = (
                s.join(e1, on="a")
                .join(e2, on="b")
                .filter(F.col("na") != F.col("nb"))
                .groupBy("na", "nb")
                .agg(F.sum("s").alias("acc"))
            )
            offdiag = (
                contrib.join(
                    din.select(F.col(DST).alias("na"), F.col("d").alias("da")),
                    on="na",
                )
                .join(
                    din.select(F.col(DST).alias("nb"), F.col("d").alias("db")),
                    on="nb",
                )
                .select(
                    F.col("na").alias("a"),
                    F.col("nb").alias("b"),
                    (
                        F.lit(self.c)
                        * F.col("acc")
                        / (F.col("da") * F.col("db"))
                    ).alias("s"),
                )
            )
            if self.eps is not None:
                offdiag = offdiag.filter(F.col("s") >= self.eps)
            s = (
                g.vertices.select(
                    F.col(ID).alias("a"),
                    F.col(ID).alias("b"),
                    F.lit(1.0).alias("s"),
                )
                .unionByName(offdiag)
                .localCheckpoint()
            )

        return (
            s.filter(F.col("a") < F.col("b"))
            .filter(F.col("s") > 0)
            .select("a", "b", F.round("s", 6).alias("simrank"))
        )
