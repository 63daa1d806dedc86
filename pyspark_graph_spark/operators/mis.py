"""Maximal independent set — Luby's algorithm with deterministic priorities.

Each round every undecided vertex draws a priority (``xxhash64(id, round)``
— deterministic, so runs are reproducible); a vertex joins the set if its
priority beats every undecided neighbor's, then it and its neighbors leave
the game. Expected O(log n) rounds (Luby 1986).

Per round: one priority projection (no shuffle), one neighbor-max
aggregation (one shuffle), two anti-joins on checkpointed frames. The
result is an *independent* set (no two members adjacent) that is *maximal*
(every non-member has a member neighbor) — both invariants are
property-tested.

MIS is the standard building block for distributed coloring/scheduling and
a good stress of the peel-and-repeat pattern at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.constants import DST, ID, SRC
from pyspark_graph_spark.graph import Graph


class MaximalIndependentSet:
    def __init__(self, max_iterations: int = 50, seed: int = 0):
        self.max_iterations = max_iterations
        self.seed = seed

    def run(self, g: Graph) -> DataFrame:
        """Vertex ids of the set (single ``id`` column)."""
        # independence is an undirected property: symmetrize regardless of
        # the graph's directed flag (symmetric_edges is a no-op for directed
        # graphs by design)
        base = g.edges.select(SRC, DST)
        sym = (
            base.unionByName(
                base.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
            )
            .filter(F.col(SRC) != F.col(DST))
            .distinct()
            .localCheckpoint()
        )
        undecided = g.vertices.select(ID).localCheckpoint()
        edges = sym
        spark = undecided.sparkSession
        chosen = spark.createDataFrame([], f"{ID} long")

        for rnd in range(self.max_iterations):
            if undecided.isEmpty():
                break
            pri = undecided.withColumn(
                "__p", F.xxhash64(F.col(ID), F.lit(self.seed), F.lit(rnd))
            )
            nbr_max = (
                edges.join(
                    pri.withColumnsRenamed({ID: DST, "__p": "__np"}), on=DST
                )
                .groupBy(SRC)
                .agg(F.max("__np").alias("__maxn"))
                .withColumnRenamed(SRC, ID)
            )
            winners = (
                pri.join(nbr_max, on=ID, how="left")
                .filter(
                    F.col("__maxn").isNull() | (F.col("__p") > F.col("__maxn"))
                )
                .select(ID)
                .localCheckpoint()
            )
            chosen = chosen.unionByName(winners).localCheckpoint()
            # winners and their neighbors leave the game
            removed = winners.unionByName(
                edges.join(winners.withColumnRenamed(ID, SRC), on=SRC, how="semi")
                .select(F.col(DST).alias(ID))
            ).distinct()
            undecided = undecided.join(removed, on=ID, how="anti").localCheckpoint()
            edges = (
                edges.join(
                    undecided.withColumnRenamed(ID, SRC), on=SRC, how="semi"
                )
                .join(undecided.withColumnRenamed(ID, DST), on=DST, how="semi")
                .select(SRC, DST)
                .localCheckpoint()
            )
        return chosen


def greedy_coloring(g: Graph, max_colors: int = 64) -> DataFrame:
    """(id, color) proper coloring: repeatedly take an MIS of the remaining
    subgraph and give it the next color (Luby-MIS coloring — expected
    O(log n) rounds per color, colors ≤ degeneracy-ish in practice).

    Proper by construction: each color class is an independent set.
    """
    remaining_v = g.vertices.select(ID).localCheckpoint()
    base = g.edges.select(SRC, DST)
    remaining_e = (
        base.unionByName(
            base.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        )
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
        .localCheckpoint()
    )
    spark = remaining_v.sparkSession
    result = spark.createDataFrame([], f"{ID} long, color int")
    for color in range(max_colors):
        if remaining_v.isEmpty():
            return result
        sub = Graph(remaining_v, remaining_e, directed=True, indexed=True)
        mis = MaximalIndependentSet(seed=color).run(sub).localCheckpoint()
        result = result.unionByName(
            mis.withColumn("color", F.lit(color))
        ).localCheckpoint()
        remaining_v = remaining_v.join(mis, on=ID, how="anti").localCheckpoint()
        remaining_e = (
            remaining_e.join(
                remaining_v.withColumnRenamed(ID, SRC), on=SRC, how="semi"
            )
            .join(remaining_v.withColumnRenamed(ID, DST), on=DST, how="semi")
            .localCheckpoint()
        )
    raise RuntimeError(f"graph not colored within {max_colors} colors")
