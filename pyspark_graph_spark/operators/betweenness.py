"""Betweenness centrality — landmark-sampled Brandes on DataFrames.

For each source s: a level-synchronous forward sweep computes distance
``d`` and shortest-path counts ``σ`` per vertex; a backward sweep by
descending depth accumulates dependencies

    δ(v) = Σ_{w : d(w)=d(v)+1, (v,w)∈E} (σ(v)/σ(w)) · (1 + δ(w))

and betweenness(v) = Σ_s δ_s(v) over the source set. With all vertices as
sources this is exact Brandes; with a landmark sample it is the standard
unbiased approximation (Brandes–Pich) — pick the sample size, not the
graph size.

All sources run **simultaneously**: state rows are (source, vertex, depth,
sigma), so each BFS level is one join + one aggregation for the whole
source batch. Both sweeps checkpoint per level; rounds = 2 × (levels
actually reached).

Scale: per level one shuffle of the frontier (≤ |S|·V rows total across
the run) against the pre-partitioned edge list. Sources batch in one pass —
the classic k-sources-at-once Brandes batching.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.util import checkpoint_observed

BETWEENNESS = "betweenness"


class BetweennessCentrality:
    def __init__(
        self,
        sources: Sequence[int] | DataFrame,
        max_depth: int = 20,
    ):
        self.sources = sources
        self.max_depth = max_depth

    def _source_df(self, g: Graph) -> DataFrame:
        if isinstance(self.sources, DataFrame):
            return self.sources.select(
                F.col(self.sources.columns[0]).cast("long").alias("s")
            )
        return g.vertices.sparkSession.createDataFrame(
            [(int(x),) for x in self.sources], "s long"
        )

    def run(self, g: Graph) -> DataFrame:
        """Returns ``(id, betweenness double)`` for every vertex (0 where
        no sampled shortest path passes through)."""
        edges = (
            g.symmetric_edges.select(SRC, DST)
            .filter(F.col(SRC) != F.col(DST))
            .distinct()
            .repartition(F.col(SRC))
            .localCheckpoint()
        )
        sources = self._source_df(g).localCheckpoint()

        # ---- forward sweep: (s, v, depth, sigma) ----
        paths = sources.select(
            "s",
            F.col("s").alias("v"),
            F.lit(0).alias("depth"),
            F.lit(1.0).alias("sigma"),
        ).localCheckpoint()
        frontier = paths
        levels = [paths]  # per-depth frames
        depth = 0
        while depth < self.max_depth:
            depth += 1
            # level-emptiness probe folded into the checkpoint job
            # (round 12, checkpoint_observed)
            expanded, m = checkpoint_observed(
                frontier.join(edges, on=frontier["v"] == edges[SRC])
                .select("s", edges[DST].alias("v"), "sigma")
                .groupBy("s", "v")
                .agg(F.sum("sigma").alias("sigma"))
                .join(paths.select("s", "v"), on=["s", "v"], how="anti")
                .withColumn("depth", F.lit(depth))
                .select("s", "v", "depth", "sigma"),
                __n=F.count(F.lit(1)),
            )
            if not m["__n"]:
                break
            levels.append(expanded)
            # union of already-checkpointed level frames: no re-checkpoint
            # (r11, guide §2.4 — the per-level union+localCheckpoint was a
            # full extra shuffle-and-materialize of the whole paths table
            # every level; the anti-join consumer scans the checkpointed
            # parts directly)
            paths = paths.unionByName(expanded)
            frontier = expanded

        # ---- backward sweep: dependencies per level ----
        # delta rows: (s, v, delta); start with deepest level at 0
        deltas_by_level: dict[int, DataFrame] = {}
        deepest = len(levels) - 1
        deltas_by_level[deepest] = levels[deepest].select(
            "s", "v", F.lit(0.0).alias("delta")
        )
        for d in range(deepest - 1, -1, -1):
            upper = (
                levels[d + 1]
                .join(deltas_by_level[d + 1], on=["s", "v"])
                .select(
                    "s",
                    F.col("v").alias("w"),
                    F.col("sigma").alias("sigma_w"),
                    "delta",
                )
            )
            contrib = (
                levels[d]
                .join(edges, on=levels[d]["v"] == edges[SRC])
                .select("s", "v", "sigma", edges[DST].alias("w"))
                .join(upper, on=["s", "w"])
                .select(
                    "s",
                    "v",
                    (
                        (F.col("sigma") / F.col("sigma_w"))
                        * (F.lit(1.0) + F.col("delta"))
                    ).alias("__c"),
                )
                .groupBy("s", "v")
                .agg(F.sum("__c").alias("delta"))
            )
            deltas_by_level[d] = (
                levels[d]
                .select("s", "v")
                .join(contrib, on=["s", "v"], how="left")
                .select("s", "v", F.coalesce("delta", F.lit(0.0)).alias("delta"))
                .localCheckpoint()
            )

        all_deltas = deltas_by_level[0]
        for d in range(1, deepest + 1):
            all_deltas = all_deltas.unionByName(deltas_by_level[d])
        scores = (
            all_deltas.filter(F.col("s") != F.col("v"))
            .groupBy("v")
            .agg(F.sum("delta").alias(BETWEENNESS))
        )
        return (
            g.vertices.select(ID)
            .join(scores.withColumnRenamed("v", ID), on=ID, how="left")
            .select(
                ID, F.coalesce(BETWEENNESS, F.lit(0.0)).alias(BETWEENNESS)
            )
        )
