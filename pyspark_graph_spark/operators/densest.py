"""Densest subgraph — Bahmani/Kumar/Vassilvitskii (2012) parallel peeling.

Charikar's greedy 2-approximation peels the minimum-degree vertex one at
a time — inherently sequential. The MapReduce variant peels EVERY vertex
whose degree is below 2(1+ε)·ρ (ρ = current edge/vertex density) in one
round, which provably removes a constant fraction of vertices per round:
O(log_{1+ε} n) rounds for a 2(1+ε)-approximation — the canonical
"sequential greedy → parallel batch-peel" transformation.

Each round is one degree aggregation, one broadcast of the 1-row density
aggregate, and two semi-joins on a strictly shrinking edge list,
checkpointed — the same per-round shape as k-core peeling (kcore.py),
with a density threshold instead of a fixed k. The best-density round is
tracked IN THE PLAN (union of per-round 1-row summaries + argmax), no
driver-side comparisons on data.

Determinism: thresholds and densities are exact rational comparisons
(edge and vertex counts), so every round's survivor set — and therefore
the reported densest prefix — is a pure function of the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph
from pyspark_graph_spark.util import checkpoint_observed


class DensestSubgraph:
    """2(1+ε)-approximate densest subgraph by parallel peeling.

    ``run(g)`` returns one row per peeling round: (round, n_vertices,
    n_edges, density) of the surviving subgraph BEFORE that round's peel,
    density = edges/vertices over the undirected distinct edge set. The
    densest round is the approximation's answer (max density row).
    """

    def __init__(self, epsilon: float = 0.5, max_iterations: int = 30):
        if epsilon <= 0:
            raise ValueError("epsilon must be > 0")
        self.epsilon = epsilon
        self.max_iterations = max_iterations

    def run(self, g: Graph) -> DataFrame:
        edges = (
            g.symmetric_edges.select(SRC, DST)
            .filter(F.col(SRC) < F.col(DST))
            .distinct()
            .localCheckpoint()
        )
        rounds: list[DataFrame] = []
        emptied = False
        for r in range(self.max_iterations):
            sym = edges.unionByName(
                edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
            )
            # vertex-emptiness probe rides the checkpoint job
            # (round 12, checkpoint_observed)
            deg, md = checkpoint_observed(
                sym.groupBy(F.col(SRC).alias(ID)).agg(
                    F.count(F.lit(1)).alias("__d")
                ),
                __n=F.count(F.lit(1)),
            )
            summary = deg.agg(
                F.lit(r).alias("round"),
                F.count(F.lit(1)).alias("n_vertices"),
                # shiftright: Σdeg is even, so the halving is exact at
                # any scale (the double `/ 2` lost integers past 2^53)
                F.shiftright(F.sum("__d"), 1).alias("n_edges"),
                F.round(
                    F.sum("__d") / 2 / F.count(F.lit(1)), 6
                ).alias("density"),
            )
            rounds.append(summary)
            if not md["__n"]:
                emptied = True
                break
            # peel: keep vertices with deg >= 2(1+eps) * density
            thr = deg.agg(
                (
                    F.lit(2.0 * (1.0 + self.epsilon))
                    * (F.sum("__d") / 2)
                    / F.count(F.lit(1))
                ).alias("__thr")
            )
            keep = (
                deg.crossJoin(F.broadcast(thr))
                .filter(F.col("__d") >= F.col("__thr"))
                .select(ID)
            )
            edges, me = checkpoint_observed(
                edges.join(
                    keep.withColumnRenamed(ID, SRC), on=SRC, how="semi"
                )
                .join(keep.withColumnRenamed(ID, DST), on=DST, how="semi")
                .select(SRC, DST),
                __n=F.count(F.lit(1)),
            )
            n_edges_left = me["__n"] or 0
        if not emptied:
            # the emptiness probe runs at the TOP of each iteration, so a
            # peel that empties the graph exactly on the final allowed
            # iteration is only observable here (from the last observed
            # edge count — no extra action)
            emptied = n_edges_left == 0
        if not emptied:
            # matching CriticalPath: a truncated trace silently loses the
            # 2(1+eps) approximation guarantee (log_{1+eps} n rounds are
            # needed — ~50 for 1e9 vertices at the default epsilon)
            raise ValueError(
                "DensestSubgraph peel did not empty the graph within "
                f"max_iterations={self.max_iterations}; raise it to "
                "ceil(log_{1+eps}(n_vertices)) to keep the approximation "
                "guarantee"
            )
        out = rounds[0]
        for s in rounds[1:]:
            out = out.unionByName(s)
        # drop empty-graph rounds (count 0 -> density NULL)
        return out.filter(F.col("n_vertices") > 0)
