"""Katz index via COO sparse matrix-power accumulation.

The reference's katz_index.py is aspirational — it imports a nonexistent
``pyspark_graph.matrix`` module and *squares* the matrix each round
(``a *= a``, reference katz_index.py:26) instead of accumulating the series,
with ``beta`` never applied. This implements the documented intent:

    Katz(i,j) = Σ_{k=1..K} β^k · (A^k)_{ij}

The adjacency matrix lives as a COO DataFrame ``(row, col, val)``; one
matrix-multiply per round is an equi-join on the inner dimension plus a
``groupBy(row, col).sum`` — the canonical distributed SpGEMM. Each power is
checkpointed (constant per-round lineage); an optional ``tolerance`` stops
early when ``β^k · max(A^k)`` falls below it.

Scale notes: A^k densifies toward O(V²) nonzeros on connected graphs — Katz
is a pairwise-similarity measure and is meant for bounded K / bounded
neighborhoods at scale. The multiply shuffles on the inner dimension; skewed
hub rows are AQE-splittable. Use β < 1/λ_max for a convergent series.

Numeric note: with ``beta`` a negative power of two (default 0.125) and
integer walk counts, every term and partial sum is an exact dyadic double —
results are bit-identical regardless of aggregation order (and to a SQL
oracle computing the same truncated series).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, SRC
from pyspark_graph_spark.graph import Graph

KATZ = "katz_index"


class KatzIndex:
    def __init__(
        self,
        beta: float = 0.125,
        tolerance: float | None = None,
        max_iterations: int = 3,
    ):
        self.beta = beta
        self.tolerance = tolerance
        self.max_iterations = max_iterations

    def run(self, g: Graph) -> DataFrame:
        """Returns ``(src, dst, katz_index)`` for pairs with ≥1 walk of
        length ≤ max_iterations (diagonal included — closed walks exist in
        undirected graphs)."""
        # walk counts are over the graph's directed view; undirected graphs
        # contribute walks in both directions
        a = (
            g.symmetric_edges.select(SRC, DST)
            .distinct()
            .withColumn("val", F.lit(1).cast("long"))
            .localCheckpoint()
        )
        power = a
        total = power.select(
            SRC, DST, (F.col("val") * self.beta).alias(KATZ)
        )

        for k in range(2, self.max_iterations + 1):
            nxt = (
                power.alias("p")
                .join(a.alias("a"), on=F.col(f"p.{DST}") == F.col(f"a.{SRC}"))
                .groupBy(
                    F.col(f"p.{SRC}").alias(SRC),
                    F.col(f"a.{DST}").alias(DST),
                )
                .agg(F.sum(F.col("p.val") * F.col("a.val")).alias("val"))
                .localCheckpoint()
            )
            power = nxt
            coeff = self.beta**k
            total = total.unionByName(
                power.select(SRC, DST, (F.col("val") * coeff).alias(KATZ))
            )
            if self.tolerance is not None:
                peak = power.agg(F.max("val")).first()[0]
                if peak is None or peak * coeff < self.tolerance:
                    break

        return (
            total.groupBy(SRC, DST)
            .agg(F.sum(KATZ).alias(KATZ))
        )
