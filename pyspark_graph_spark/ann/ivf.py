"""IVF-flat approximate neighbor search: coarse quantize, probe, re-rank.

The corpus is partitioned into cells by nearest centroid (the inverted
file); a query only scans the ``nprobe`` cells whose centroids are closest
to it. Centroids here are taken deterministically (the ``num_cells``
lowest-id vectors) rather than k-means-trained — the *pipeline shape*
(assign → probe → exact re-rank within probed cells) is the point, and a
trained quantizer slots into the same two joins.

Scale: assignment is a broadcast join against the (small) centroid table +
row-local argmax — no corpus shuffle; the probe join touches only
``nprobe / num_cells`` of the corpus per query. At 100 TB you'd persist the
assigned corpus bucketed by ``cell`` so repeated queries skip assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.vectors import cosine_similarity_arrow

SIM = "cosine_sim"
RANK = "rank"


class IVFFlat:
    def __init__(
        self,
        num_cells: int = 16,
        nprobe: int = 4,
        k: int = 5,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.num_cells = num_cells
        self.nprobe = nprobe
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def centroids(self, corpus: DataFrame) -> DataFrame:
        """(cell, centroid) — deterministic: lowest-id vectors. The
        orderBy+limit plans as TakeOrdered (no global sort); the window
        then numbers only num_cells rows."""
        w = Window.orderBy(F.col(self.id_col))
        return (
            corpus.select(self.id_col, self.vec_col)
            .orderBy(self.id_col)
            .limit(self.num_cells)
            .withColumn("cell", F.row_number().over(w) - 1)
            .select("cell", F.col(self.vec_col).alias("__centroid"))
        )

    def _nearest_cells(self, df: DataFrame, cents: DataFrame, n: int, id_name: str) -> DataFrame:
        """(id_name, __v, cell) — the n nearest centroids per vector."""
        scored = df.join(F.broadcast(cents)).select(
            df["*"],
            "cell",
            cosine_similarity_arrow(F.col(self.vec_col), F.col("__centroid")).alias(
                "__csim"
            ),
        )
        w = Window.partitionBy(id_name).orderBy(
            F.desc("__csim"), F.asc("cell")
        )
        return (
            scored.withColumn("__crank", F.row_number().over(w))
            .filter(F.col("__crank") <= n)
            .drop("__csim", "__crank")
        )

    def assign(self, corpus: DataFrame) -> DataFrame:
        """Corpus with its (single) nearest-centroid cell."""
        cents = self.centroids(corpus).localCheckpoint()
        return self._nearest_cells(
            corpus.select(self.id_col, self.vec_col), cents, 1, self.id_col
        )

    def topk(self, corpus: DataFrame, queries: DataFrame) -> DataFrame:
        """(query_id, neighbor_id, cosine_sim, rank) — approximate top-k,
        searching only the nprobe nearest cells per query."""
        cents = self.centroids(corpus).localCheckpoint()
        indexed = self._nearest_cells(
            corpus.select(
                F.col(self.id_col).alias("neighbor_id"),
                F.col(self.vec_col),
            ),
            cents,
            1,
            "neighbor_id",
        ).withColumnRenamed(self.vec_col, "__cv")
        probes = self._nearest_cells(
            queries.select(
                F.col(self.id_col).alias("query_id"), F.col(self.vec_col)
            ),
            cents,
            self.nprobe,
            "query_id",
        ).withColumnRenamed(self.vec_col, "__qv")
        scored = (
            indexed.join(F.broadcast(probes), on="cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    cosine_similarity_arrow(F.col("__qv"), F.col("__cv")), 6
                ).alias(SIM),
            )
            .distinct()
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc(SIM), F.asc("neighbor_id")
        )
        return scored.withColumn(RANK, F.row_number().over(w)).filter(
            F.col(RANK) <= self.k
        )
