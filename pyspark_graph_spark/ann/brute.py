"""Brute-force exact top-k cosine neighbors — the ANN correctness baseline.

Query set × corpus via a **broadcast** nested-loop join (the query side is
small by construction; never broadcast the corpus), cosine with built-in
HOFs, rounded to 6 decimals before ranking so Spark-vs-oracle float
summation noise (~1e-15) cannot flip ranks; remaining ties break on
neighbor id. Window top-k per query.

Scale: O(|queries| × N) similarity evaluations, embarrassingly parallel
over corpus partitions, no corpus shuffle — only the final per-query top-k
aggregation moves data (k rows per query per partition after the window's
partial rank pushdown). For large query sets switch to the LSH/IVF
variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_graph_spark.functions.vectors import cosine_similarity_arrow

SIM = "cosine_sim"
RANK = "rank"


class BruteForceKNN:
    def __init__(
        self, k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding"
    ):
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def topk(self, corpus: DataFrame, queries: DataFrame) -> DataFrame:
        """(query_id, neighbor_id, cosine_sim, rank) — exact top-k per query,
        self-matches excluded."""
        q = queries.select(
            F.col(self.id_col).alias("query_id"),
            F.col(self.vec_col).alias("__qv"),
        )
        c = corpus.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col(self.vec_col).alias("__cv"),
        )
        scored = (
            c.join(F.broadcast(q), on=F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    cosine_similarity_arrow(F.col("__qv"), F.col("__cv")), 6
                ).alias(SIM),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc(SIM), F.asc("neighbor_id")
        )
        return (
            scored.withColumn(RANK, F.row_number().over(w))
            .filter(F.col(RANK) <= self.k)
        )
