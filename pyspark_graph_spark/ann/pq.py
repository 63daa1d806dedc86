"""Product quantization (PQ) — compressed vector codes for billion-scale ANN.

Splits each d-dim embedding into ``m`` contiguous subvectors and k-means-
quantizes each subspace independently (Jegou et al. 2011, "Product
Quantization for Nearest Neighbor Search"): a vector compresses to ``m``
small codes (m bytes at k<=256) while asymmetric distances remain
computable from per-subspace lookup tables — the standard memory layout
under IVF-PQ indexes.

Spark-first: each subspace runs the existing deterministic
:class:`~pyspark_graph_spark.ann.kmeans.KMeans` (broadcast centroids,
corpus never shuffles for assignment, update shuffle O(partitions*k*d_sub));
the ``m`` assignments join back on the vector id — m-1 id-key joins of
id+code projections, AQE-broadcast when slim. Deterministic end to end
(lowest-id init), so the full encoding is SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_graph_spark.ann.kmeans import KMeans


class ProductQuantizer:
    def __init__(
        self,
        m: int = 4,
        k: int = 16,
        n_iter: int = 2,
        dim: int = 64,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        if dim % m != 0:
            raise ValueError("dim must be divisible by m")
        self.m = m
        self.k = k
        self.n_iter = n_iter
        self.dim = dim
        self.d_sub = dim // m
        self.id_col = id_col
        self.vec_col = vec_col

    def encode(self, corpus: DataFrame) -> DataFrame:
        """(id, code_0..code_{m-1}, distortion): per-subspace nearest
        trained centroid and the summed squared reconstruction error."""
        out = None
        for s in range(self.m):
            sub = corpus.select(
                self.id_col,
                F.slice(
                    F.col(self.vec_col).cast("array<double>"),
                    s * self.d_sub + 1,
                    self.d_sub,
                ).alias("embedding"),
            )
            km = KMeans(
                k=self.k,
                n_iter=self.n_iter,
                id_col=self.id_col,
                vec_col="embedding",
            )
            assigned = km.fit(sub).select(
                self.id_col,
                F.col("cluster").cast("int").alias(f"code_{s}"),
                F.col("sq_dist").alias(f"__sq_{s}"),
            )
            out = assigned if out is None else out.join(assigned, on=self.id_col)
        total = sum(F.col(f"__sq_{s}") for s in range(self.m))
        return out.select(
            self.id_col,
            *[f"code_{s}" for s in range(self.m)],
            F.round(total, 6).alias("distortion"),
        )
