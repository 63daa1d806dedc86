"""Spectral centralities: eigenvector centrality and HITS (hubs/authorities).

Engine extensions (the reference ships no centralities at all; its README
lists even PageRank as unsupported — `/root/reference/README.md:24-38`).
Both are classic power iterations, so they reuse the engine's iterative
shape: pre-partitioned static edge side, per-round localCheckpoint to cut
lineage, global normalization as a broadcast 1-row crossJoin.

    eigenvector:  x ← A·x / ‖A·x‖₂          (symmetrized adjacency)
    HITS:         a ← Aᵀ·h / ‖Aᵀ·h‖₂,  h ← A·a / ‖A·a‖₂

Scale per round: one shuffle keyed on the vertex id for the neighbor-sum
aggregate (map-side partial sums), plus a broadcast of a single scalar for
the norm — the norm is a full reduce but moves 8 bytes. Hub-skew behaves
like PageRank's: AQE skew-split on the contribution join, or pre-salt via
Pregel's knob if a hot vertex dominates. Fixed iteration counts keep the
result exactly reproducible by an unrolled-CTE SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph


def _l2_normalize(scores: DataFrame, col: str) -> DataFrame:
    """Divide ``col`` by its global L2 norm (broadcast 1-row join)."""
    norm = scores.agg(
        F.sqrt(F.sum(F.col(col) * F.col(col))).alias("__norm")
    )
    return scores.crossJoin(F.broadcast(norm)).select(
        ID,
        # edgeless graph -> zero vector: keep zeros instead of NaN
        F.when(F.col("__norm") > 0, F.col(col) / F.col("__norm"))
        .otherwise(F.lit(0.0))
        .alias(col),
    )


class EigenvectorCentrality:
    """Power iteration for the principal eigenvector of the (symmetrized)
    adjacency matrix. Fixed ``iterations`` (no tolerance) so external
    oracles can replay the exact computation."""

    def __init__(self, iterations: int = 5):
        self.iterations = iterations

    def run(self, g: Graph) -> DataFrame:
        """Returns ``(id, eigenvector)`` for every vertex."""
        edges = (
            g.symmetric_edges.select(SRC, DST)
            .repartition(F.col(SRC))
            .localCheckpoint()
        )
        verts = g.vertices.select(ID).localCheckpoint()
        x = verts.select(ID, F.lit(1.0).alias("eigenvector"))
        for _ in range(self.iterations):
            summed = (
                edges.join(x, on=F.col(SRC) == F.col(ID))
                .select(F.col(DST).alias(ID), F.col("eigenvector"))
                .groupBy(ID)
                .agg(F.sum("eigenvector").alias("__s"))
            )
            # isolated vertices fall to 0 (no incident edges feed them)
            x = (
                verts.join(summed, on=ID, how="left")
                .select(
                    ID, F.coalesce("__s", F.lit(0.0)).alias("eigenvector")
                )
            )
            x = _l2_normalize(x, "eigenvector").localCheckpoint()
        return x


class HITS:
    """Hyperlink-Induced Topic Search on a DIRECTED graph: hub scores flow
    forward along edges into authority scores, authorities flow backward
    into hubs; both L2-normalized every round (the convergent Kleinberg
    formulation). Fixed ``iterations`` for oracle replay."""

    def __init__(self, iterations: int = 4):
        self.iterations = iterations

    def run(self, g: Graph) -> DataFrame:
        """Returns ``(id, hub, authority)`` for every vertex."""
        edges = (
            g.edges.select(SRC, DST).repartition(F.col(SRC)).localCheckpoint()
        )
        verts = g.vertices.select(ID).localCheckpoint()
        hub = verts.select(ID, F.lit(1.0).alias("hub"))
        auth = None
        for _ in range(self.iterations):
            auth = (
                edges.join(hub, on=F.col(SRC) == F.col(ID))
                .select(F.col(DST).alias(ID), F.col("hub"))
                .groupBy(ID)
                .agg(F.sum("hub").alias("__s"))
            )
            auth = _l2_normalize(
                verts.join(auth, on=ID, how="left").select(
                    ID, F.coalesce("__s", F.lit(0.0)).alias("authority")
                ),
                "authority",
            ).localCheckpoint()
            hub = (
                edges.join(auth, on=F.col(DST) == F.col(ID))
                .select(F.col(SRC).alias(ID), F.col("authority"))
                .groupBy(ID)
                .agg(F.sum("authority").alias("__s"))
            )
            hub = _l2_normalize(
                verts.join(hub, on=ID, how="left").select(
                    ID, F.coalesce("__s", F.lit(0.0)).alias("hub")
                ),
                "hub",
            ).localCheckpoint()
        return hub.join(auth, on=ID).select(ID, "hub", "authority")
